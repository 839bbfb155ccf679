"""Radiation-field model: J/nuJ estimators -> dilute-blackbody (T_R, W) fits.

TPU-native rebuild of the reference radiation-field module (reference:
radfield.cc:369-417 set_params_fullspec, 731-759 update_estimators,
774-793 radfield(), 915-969 normalise; kpkt.cc:246-257
sample_planck_montecarlo). The multibin model (radfield.cc:42-52, 834-911)
layers on top via the same batched primitives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import H, HOVERKB, KB, PI, STEBO, TWOHOVERCLIGHTSQUARED


# nu**3 at optical frequencies (1e45) overflows float32; scaling nu by an
# exact power of two keeps every intermediate in range and is bit-identical
# in float64.
_NU_SCALE = 2.0**-50
_DBB_COEFF = TWOHOVERCLIGHTSQUARED * 2.0**150


def dbb(nu, t, w):
    """Dilute blackbody intensity J_nu = W * 2 h nu^3/c^2 / (exp(hnu/kT)-1)."""
    return w * _DBB_COEFF * (nu * _NU_SCALE) ** 3 / jnp.expm1(HOVERKB * nu / t)


def fit_params_fullspec(j, nuj, mintemp, maxtemp):
    """Full-spectrum fit of T_J, T_R, W from normalised J and nuJ estimators,
    batched over cells (reference: radfield.cc:369-417).

    Returns (T_J, T_R, W); where nubar is invalid the caller should keep the
    previous values (mask on jnp.isfinite(nubar) & (nubar != 0)).
    """
    nubar = nuj / j
    t_j = jnp.clip((j * PI / STEBO) ** 0.25, mintemp, maxtemp)
    t_r = jnp.clip(H * nubar / KB / 3.832229494, mintemp, maxtemp)
    w = j * PI / STEBO / t_r**4
    valid = jnp.isfinite(nubar) & (nubar != 0)
    return t_j, t_r, w, valid


def get_t_j_from_j(j, mintemp, maxtemp):
    """T_J = (pi J / sigma)^(1/4), clamped (reference: radfield.cc:971-991)."""
    return jnp.clip((j * PI / STEBO) ** 0.25, mintemp, maxtemp)


# ---------------------------------------------------------------------------
# Multibin radiation-field model (reference: radfield.cc:42-52 bin layout,
# 96-130 bin boundaries, 258-366 find_T_R via nu_bar root, 834-911
# fit_parameters, artisoptions_nltenebular.h:73-77 bin range)
# ---------------------------------------------------------------------------

NU_LOWER_FIRST = 2.99792458e10 / (40000e-8)  # lambda 40000 A
NU_UPPER_LAST = 2.99792458e10 / (1085e-8)  # lambda 1085 A
NU_UPPER_SUPERBIN = 2.99792458e10 / (10e-8)  # top "super bin" upper edge


def bin_nu_lower(nbins: int):
    """(nbins,) lower edges; the last bin is the superbin."""
    delta = (NU_UPPER_LAST - NU_LOWER_FIRST) / (nbins - 1)
    edges = NU_LOWER_FIRST + jnp.arange(nbins) * delta
    return edges


def bin_nu_upper(nbins: int):
    delta = (NU_UPPER_LAST - NU_LOWER_FIRST) / (nbins - 1)
    uppers = NU_LOWER_FIRST + (jnp.arange(nbins) + 1) * delta
    return uppers.at[nbins - 1].set(NU_UPPER_SUPERBIN)


def select_bin(nu, nbins: int):
    """(npkts,) bin index, -1 outside [NU_LOWER_FIRST, NU_UPPER_SUPERBIN)
    (reference: radfield.cc:113-130)."""
    delta = (NU_UPPER_LAST - NU_LOWER_FIRST) / (nbins - 1)
    idx = jnp.floor((nu - NU_LOWER_FIRST) / delta).astype(jnp.int32)
    idx = jnp.where(nu >= NU_UPPER_LAST, nbins - 1, idx)
    inside = (nu >= NU_LOWER_FIRST) & (nu < NU_UPPER_SUPERBIN)
    return jnp.where(inside, jnp.clip(idx, 0, nbins - 1), -1)


def planck_integral(t_r, nu_lower, nu_upper, times_nu: bool, npts: int = 64):
    """Fixed-grid integral of B_nu (optionally nu B_nu) over a bin, batched
    over leading axes of t_r/nu_lower/nu_upper (reference: radfield.cc:235-256
    does GSL quadrature; a trapezoid on npts points suffices at bin widths)."""
    frac = jnp.linspace(0.0, 1.0, npts)
    shape = jnp.broadcast_shapes(jnp.shape(t_r), jnp.shape(nu_lower))
    nu_l = jnp.broadcast_to(nu_lower, shape)[..., None]
    nu_u = jnp.broadcast_to(nu_upper, shape)[..., None]
    t = jnp.broadcast_to(t_r, shape)[..., None]
    nu = nu_l + (nu_u - nu_l) * frac
    f = dbb(nu, jnp.maximum(t, 1.0), 1.0)
    if times_nu:
        f = f * nu
    return jnp.trapezoid(f, nu, axis=-1)


def fit_bin_params(j_bin, nuj_bin, contribcount, t_e, nbins: int,
                   mintemp: float, maxtemp: float, iters: int = 40):
    """Per-(cell, bin) dilute-blackbody fits (reference: radfield.cc:834-911).

    T_R solves nu_bar_planck(T) = nuJ/J by bisection (the reference's Brent
    solve, radfield.cc:302-366); the last bin (superbin) takes T_R = T_e;
    W = J / planck_integral. Bins without contributions get W = 0.
    """
    nu_l = bin_nu_lower(nbins)[None, :]
    nu_u = bin_nu_upper(nbins)[None, :]
    nubar = nuj_bin / jnp.maximum(j_bin, 1e-300)

    def nubar_planck(t):
        num = planck_integral(t, nu_l, nu_u, True)
        den = jnp.maximum(planck_integral(t, nu_l, nu_u, False), 1e-300)
        return num / den

    lo = jnp.full_like(nubar, mintemp)
    hi = jnp.full_like(nubar, maxtemp)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        too_cold = nubar_planck(mid) < nubar  # Planck nu_bar rises with T
        return jnp.where(too_cold, mid, lo), jnp.where(too_cold, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    t_r_bin = 0.5 * (lo + hi)
    # superbin pinned to the electron temperature (radfield.cc:870-875)
    t_r_bin = t_r_bin.at[:, nbins - 1].set(t_e)
    pint = jnp.maximum(planck_integral(t_r_bin, nu_l, nu_u, False), 1e-300)
    w_bin = jnp.where(contribcount > 0, j_bin / pint, 0.0)
    # clamp runaway dilution factors (radfield.cc:883-895)
    too_high = w_bin > 1e4
    pint_max = jnp.maximum(planck_integral(jnp.full_like(t_r_bin, maxtemp), nu_l, nu_u, False), 1e-300)
    w_bin = jnp.where(too_high, j_bin / pint_max, w_bin)
    t_r_bin = jnp.where(too_high, maxtemp, t_r_bin)
    return t_r_bin, w_bin


def radfield_dbb_binned(nu, cellidx, t_r_bins, w_bins, t_r_full, w_full, nbins: int):
    """J_nu lookup from the binned model with full-spectrum fallback
    (reference: radfield.cc:774-793)."""
    b = select_bin(nu, nbins)
    safe_b = jnp.maximum(b, 0)
    t = t_r_bins[cellidx, safe_b]
    w = w_bins[cellidx, safe_b]
    use_bin = (b >= 0) & (w > 0)
    t_eff = jnp.where(use_bin, t, t_r_full[cellidx])
    w_eff = jnp.where(use_bin, w, w_full[cellidx])
    return dbb(nu, jnp.maximum(t_eff, 1.0), w_eff)


def sample_planck_montecarlo(key, t, nu_min, nu_max, maxiter: int = 512):
    """Batched rejection sampling of the Planck distribution on [nu_min, nu_max]
    (reference: kpkt.cc:246-257)."""
    nu_peak = 5.879e10 * t
    b_peak = dbb(jnp.clip(nu_peak, nu_min, nu_max), t, 1.0)

    def cond(carry):
        _, _, accepted, it = carry
        return jnp.logical_and(~jnp.all(accepted), it < maxiter)

    def body(carry):
        k, nu, accepted, it = carry
        k, k1, k2 = jax.random.split(k, 3)
        nu_try = nu_min + jax.random.uniform(k1, t.shape, t.dtype) * (nu_max - nu_min)
        ok = jax.random.uniform(k2, t.shape, t.dtype) * b_peak <= dbb(nu_try, t, 1.0)
        newly = ok & ~accepted
        return k, jnp.where(newly, nu_try, nu), accepted | ok, it + 1

    _, nu, accepted, _ = jax.lax.while_loop(
        cond, body, (key, jnp.zeros_like(t) + nu_min, (t < 0) & False, 0)
    )
    return nu
