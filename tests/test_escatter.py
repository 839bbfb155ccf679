"""Electron-scattering (dipole + Stokes transport) tests
(reference: rpkt.cc:292-409 electron_scatter_rpkt)."""

import numpy as np
import jax
import jax.numpy as jnp

from artis_tpu import packets
from artis_tpu.options import kilonova_lte
from artis_tpu.transport.engine import electron_scatter_batch
from artis_tpu.constants import CLIGHT


def _state(n, seed=0, polarised=False):
    rng = np.random.default_rng(seed)
    st = packets.empty_state(n)
    t = 2.0 * 86400.0
    pos = rng.normal(size=(n, 3))
    pos = pos / np.linalg.norm(pos, axis=1, keepdims=True) * (0.05 * CLIGHT * t)
    d = rng.normal(size=(n, 3))
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    stokes = np.zeros((n, 3))
    stokes[:, 0] = 1.0
    if polarised:
        stokes[:, 1] = 0.6
        stokes[:, 2] = 0.2
    return st.replace(
        ptype=jnp.full(n, packets.TYPE_RPKT, jnp.int32),
        prop_time=jnp.full(n, t),
        pos=jnp.asarray(pos),
        dir=jnp.asarray(d),
        nu_cmf=jnp.full(n, 1e15),
        nu_rf=jnp.full(n, 1e15),
        e_cmf=jnp.full(n, 1.0),
        e_rf=jnp.full(n, 1.0),
        stokes=jnp.asarray(stokes),
    )


def test_unit_direction_and_coherence():
    """Scattering is coherent in the cmf: nu_cmf unchanged, nu_rf consistent
    with the new-direction Doppler factor; dir stays a unit vector."""
    n = 4096
    st = _state(n, polarised=True)
    opts = kilonova_lte(dipole=True)
    out = electron_scatter_batch(
        jax.random.PRNGKey(7), 1, st, jnp.ones(n, bool), opts
    )
    d = np.asarray(out.dir)
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(out.nu_cmf), 1e15)
    from artis_tpu import geometry
    dop = np.asarray(
        geometry.doppler_nucmf_on_nurf(
            out.pos, out.dir, out.prop_time, opts.use_relativistic_doppler_shift
        )
    )
    np.testing.assert_allclose(np.asarray(out.nu_rf) * dop, 1e15, rtol=1e-12)
    s = np.asarray(out.stokes)
    assert np.all(np.isfinite(s))
    np.testing.assert_allclose(s[:, 0], 1.0)
    assert np.all(s[:, 1] ** 2 + s[:, 2] ** 2 <= 1.0 + 1e-9)


def test_dipole_phase_function_moments():
    """For unpolarised input the sampled scattering cosine follows the
    Rayleigh phase function p(mu) ~ 1 + mu^2: E[mu^2] = 2/5."""
    n = 200_000
    st = _state(n)
    opts = kilonova_lte(dipole=True)
    out = electron_scatter_batch(
        jax.random.PRNGKey(3), 1, st, jnp.ones(n, bool), opts
    )
    from artis_tpu import geometry
    vel = st.pos / st.prop_time[:, None]
    old_cmf = np.asarray(geometry.angle_ab(st.dir, vel))
    new_cmf = np.asarray(
        geometry.angle_ab(out.dir, vel)
    )  # aberration back into cmf
    mu = np.sum(old_cmf * new_cmf, axis=1)
    assert abs(np.mean(mu)) < 0.01
    assert abs(np.mean(mu**2) - 0.4) < 0.01


def test_isotropic_mode_moments():
    """With dipole off the scattering cosine is uniform: E[mu^2] = 1/3."""
    n = 200_000
    st = _state(n)
    opts = kilonova_lte(dipole=False)
    out = electron_scatter_batch(
        jax.random.PRNGKey(3), 1, st, jnp.ones(n, bool), opts
    )
    from artis_tpu import geometry
    vel = st.pos / st.prop_time[:, None]
    old_cmf = np.asarray(geometry.angle_ab(st.dir, vel))
    new_cmf = np.asarray(geometry.angle_ab(out.dir, vel))
    mu = np.sum(old_cmf * new_cmf, axis=1)
    assert abs(np.mean(mu)) < 0.01
    assert abs(np.mean(mu**2) - 1.0 / 3.0) < 0.01


def test_ninety_degree_scatter_fully_polarised():
    """A 90-degree Thomson scatter of unpolarised light gives |Q| -> 1 in the
    scattering frame: P = (1-mu^2)/(1+mu^2)."""
    n = 50_000
    st = _state(n)
    opts = kilonova_lte(dipole=True)
    out = electron_scatter_batch(
        jax.random.PRNGKey(11), 2, st, jnp.ones(n, bool), opts
    )
    from artis_tpu import geometry
    vel = st.pos / st.prop_time[:, None]
    old_cmf = np.asarray(geometry.angle_ab(st.dir, vel))
    new_cmf = np.asarray(geometry.angle_ab(out.dir, vel))
    mu = np.sum(old_cmf * new_cmf, axis=1)
    s = np.asarray(out.stokes)
    p = np.sqrt(s[:, 1] ** 2 + s[:, 2] ** 2)
    expect = (1.0 - mu**2) / (1.0 + mu**2)
    sel = np.isfinite(p)
    np.testing.assert_allclose(p[sel], expect[sel], atol=1e-6)


def test_mask_leaves_unscattered_lanes():
    n = 64
    st = _state(n, polarised=True)
    opts = kilonova_lte(dipole=True)
    mask = jnp.arange(n) % 2 == 0
    out = electron_scatter_batch(jax.random.PRNGKey(1), 1, st, mask, opts)
    keep = ~np.asarray(mask)
    np.testing.assert_array_equal(np.asarray(out.dir)[keep], np.asarray(st.dir)[keep])
    np.testing.assert_array_equal(
        np.asarray(out.stokes)[keep], np.asarray(st.stokes)[keep]
    )
