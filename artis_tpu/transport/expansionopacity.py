"""Binned expansion opacities (EXPANSIONOPACITIES_ON mode).

TPU-native rebuild of the reference's binned line-opacity treatment
(reference: rpkt.cc:30-75 bin layout, 199-290 get_event_expansion_opacity,
calculate_expansion_opacities, 905-935 Planck-weighted bin sampling).

Per timestep, each cell's Sobolev line opacities collapse into wavelength
bins: kappa_bin = sum_{lines in bin} (lambda_line/delta_lambda)
(1 - exp(-tau)) / (c t_mid rho). Transport then walks bins of constant
opacity instead of individual lines — one vectorised pass, no line gathers.
Bound-bound events thermalise with a fixed probability (frequency resampled
from Planck x kappa) and scatter coherently otherwise, exactly the
RPKT_BOUNDBOUND_THERMALISATION_PROBABILITY >= 0 mode of the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import CLIGHT, CLIGHT_PROP

LAMBDA_MIN = 534.5  # Angstrom (rpkt.cc:32)
LAMBDA_MAX = 35000.0
DELTA_LAMBDA = 35.5
NBINS = int((LAMBDA_MAX - LAMBDA_MIN) / DELTA_LAMBDA)


def bin_nu_upper(binindex):
    return 1e8 * CLIGHT / (LAMBDA_MIN + binindex * DELTA_LAMBDA)


def bin_nu_lower(binindex):
    return 1e8 * CLIGHT / (LAMBDA_MIN + (binindex + 1) * DELTA_LAMBDA)


def build_expansion_opacities(tau_sob_factor, dad, rho, t_r, t_mid):
    """(ncells, NBINS) kappa [cm^2/g] + Planck-weighted cumulative
    (reference: calculate_expansion_opacities)."""
    from ..plasma.radfield import dbb

    lam = 1e8 * CLIGHT / dad.line_nu  # (nlines,) Angstrom
    binidx = jnp.floor((lam - LAMBDA_MIN) / DELTA_LAMBDA).astype(jnp.int32)
    binidx = jnp.where((binidx >= 0) & (binidx < NBINS), binidx, NBINS)  # OOB drop
    tau = tau_sob_factor * t_mid  # (ncells, nlines)
    w = (lam / DELTA_LAMBDA)[None, :].astype(tau.dtype) * -jnp.expm1(-tau)
    binsum = jnp.zeros((tau.shape[0], NBINS), tau.dtype).at[:, binidx].add(
        w, mode="drop"
    )
    kappa = binsum / (CLIGHT * t_mid * jnp.maximum(rho, 1e-300)[:, None])
    # Planck-weighted cumulative for thermalised re-emission sampling
    b = jnp.arange(NBINS)
    nu_lo = bin_nu_lower(b).astype(tau.dtype)
    nu_hi = bin_nu_upper(b).astype(tau.dtype)
    nu_mid = 0.5 * (nu_lo + nu_hi)
    planck = dbb(nu_mid[None, :], jnp.maximum(t_r, 1.0)[:, None], 1.0)
    pc = jnp.cumsum(kappa * planck * (nu_hi - nu_lo)[None, :], axis=1)
    return kappa, pc


def get_event_expansion_batch(
    kappa_rho_dop,  # (npkts, NBINS): kappa[cell] * rho * doppler, precomputed
    nu_cmf0, prop_time0, chi_cont, tau_rnd, abort_dist, nu_cmf_abort,
    d_nu_on_d_l, active, relativistic: bool,
):
    """Vectorised bin walk (reference: rpkt.cc:199-290, thermalisation-mode).

    Returns (edist, is_boundbound): the distance to the next event and whether
    the random split chi_bb/(chi_cont+chi_bb) must be drawn by the caller via
    the returned chi ratio at the event bin.
    """
    dtype = nu_cmf0.dtype
    b = jnp.arange(NBINS)
    nu_lo_edges = bin_nu_lower(b).astype(dtype)[None, :]  # (1, NBINS) descending per bin

    # distance from the packet origin to each bin's LOWER-nu edge (global
    # closed form, same as the line walk)
    if relativistic:
        d_edge = (nu_lo_edges - nu_cmf0[:, None]) / d_nu_on_d_l[:, None]
    else:
        d_edge = CLIGHT_PROP * prop_time0[:, None] * (nu_cmf0[:, None] / nu_lo_edges - 1.0)
    d_edge = jnp.maximum(d_edge, 0.0)  # edges already passed contribute zero
    d_prev = jnp.concatenate([jnp.zeros_like(d_edge[:, :1]), d_edge[:, :-1]], axis=1)
    seg = jnp.maximum(d_edge - d_prev, 0.0)  # path length inside each bin

    chi_tot = chi_cont[:, None] + kappa_rho_dop  # (npkts, NBINS)
    dtau = chi_tot * seg
    cum = jnp.cumsum(dtau, axis=1) - dtau  # exclusive prefix
    hit = (cum + dtau >= tau_rnd[:, None]) & (seg > 0)
    anyhit = jnp.any(hit, axis=1)
    j = jnp.clip(jnp.argmax(hit, axis=1), 0, NBINS - 1)
    row = jnp.arange(nu_cmf0.shape[0])
    # solve within the bin
    edist = d_prev[row, j] + (tau_rnd - cum[row, j]) / jnp.maximum(chi_tot[row, j], 1e-30)
    edist = jnp.where(anyhit & active, jnp.maximum(edist, 0.0), jnp.inf)
    bb_frac = jnp.where(
        anyhit, kappa_rho_dop[row, j] / jnp.maximum(chi_tot[row, j], 1e-30), 0.0
    )
    return edist, bb_frac


def sample_planck_times_expansion_opacity(key, planck_cum, cellidx, mask):
    """Thermalised re-emission frequency (reference: rpkt.cc:918-935)."""
    rows = planck_cum[cellidx]  # (npkts, NBINS)
    total = jnp.maximum(rows[:, -1], 1e-300)
    u = jax.random.uniform(key, cellidx.shape, rows.dtype) * total
    binindex = jnp.minimum(
        jnp.sum((rows <= u[:, None]).astype(jnp.int32), axis=1), NBINS - 1
    )
    nu_lo = bin_nu_lower(binindex).astype(rows.dtype)
    nu_hi = bin_nu_upper(binindex).astype(rows.dtype)
    u2 = jax.random.uniform(jax.random.fold_in(key, 1), cellidx.shape, rows.dtype)
    nu = nu_lo + u2 * (nu_hi - nu_lo)
    return jnp.where(mask, nu, 0.0)
