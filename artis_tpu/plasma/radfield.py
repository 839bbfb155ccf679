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
