"""Geometry/frame-math unit tests against independent NumPy reimplementations
of the reference formulas (reference: vectors.h:61-202)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from artis_tpu import geometry
from artis_tpu.constants import CLIGHT, CLIGHTSQUARED, DAY


rng = np.random.default_rng(42)


def random_unitvecs(n):
    v = rng.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def test_dot_cross_norm():
    a = rng.normal(size=(16, 3))
    b = rng.normal(size=(16, 3))
    np.testing.assert_allclose(geometry.dot(a, b), np.sum(a * b, axis=-1), rtol=1e-12)
    np.testing.assert_allclose(geometry.cross(a, b), np.cross(a, b), rtol=1e-12)
    np.testing.assert_allclose(
        geometry.vec_len(geometry.vec_norm(a)), np.ones(16), rtol=1e-12
    )


def test_angle_ab_inverse():
    """Aberration forward with v then backward with -v must round-trip."""
    n = 64
    dirs = random_unitvecs(n)
    t = 2.0 * DAY
    pos = rng.normal(size=(n, 3)) * 0.05 * CLIGHT * t
    vel = pos / t
    d2 = geometry.angle_ab(jnp.asarray(dirs), jnp.asarray(vel))
    d1 = geometry.angle_ab(d2, -jnp.asarray(vel))
    np.testing.assert_allclose(np.asarray(d1), dirs, atol=1e-10)


def test_doppler_first_order_vs_relativistic():
    n = 32
    dirs = random_unitvecs(n)
    t = 2.0 * DAY
    pos = rng.normal(size=(n, 3)) * 0.02 * CLIGHT * t
    vel = pos / t
    ndotv = np.sum(dirs * vel, axis=-1)
    # NB: the reference uses a rounded CLIGHTSQUARED constant (constants.h:35),
    # not CLIGHT**2 — we preserve that for bit-level parity of formulas.
    beta2 = np.sum(vel * vel, axis=-1) / CLIGHTSQUARED

    d_first = geometry.doppler_nucmf_on_nurf(pos, dirs, t, relativistic=False)
    np.testing.assert_allclose(np.asarray(d_first), 1.0 - ndotv / CLIGHT, rtol=1e-12)

    d_rel = geometry.doppler_nucmf_on_nurf(pos, dirs, t, relativistic=True)
    np.testing.assert_allclose(
        np.asarray(d_rel), (1.0 - ndotv / CLIGHT) / np.sqrt(1.0 - beta2), rtol=1e-12
    )
    # squared variant consistent
    d_sq = geometry.doppler_squared_nucmf_on_nurf(pos, dirs, t, relativistic=True)
    np.testing.assert_allclose(np.asarray(d_sq), np.asarray(d_rel) ** 2, rtol=1e-12)


def test_move_pkt_conserves_rf_updates_cmf():
    n = 8
    dirs = random_unitvecs(n)
    t0 = np.full(n, 1.0 * DAY)
    pos = random_unitvecs(n) * 0.01 * CLIGHT * DAY
    nu_rf = np.full(n, 1e15)
    dop0 = geometry.doppler_nucmf_on_nurf(pos, dirs, t0, relativistic=True)
    nu_cmf = np.asarray(nu_rf * dop0)
    e_rf = np.ones(n)
    dist = np.full(n, 0.1 * CLIGHT * DAY)
    new_pos, new_t, new_nucmf, new_ecmf, dop = geometry.move_pkt(
        jnp.asarray(pos), jnp.asarray(dirs), jnp.asarray(t0), jnp.asarray(nu_rf),
        jnp.asarray(nu_cmf), jnp.asarray(e_rf), jnp.asarray(dist), relativistic=True,
    )
    np.testing.assert_allclose(np.asarray(new_t), t0 + dist / CLIGHT, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(new_pos), pos + dirs * dist[:, None], rtol=1e-12)
    # homologous flow: cmf frequency must not increase along a ray
    assert np.all(np.asarray(new_nucmf) <= nu_cmf + 1e-30)


def test_escape_direction_bins_cover_range():
    n = 4096
    dirs = random_unitvecs(n)
    bins = geometry.get_escapedirectionbin(jnp.asarray(dirs), 10, 10)
    b = np.asarray(bins)
    assert b.min() >= 0 and b.max() < 100
    # all costheta rows populated for isotropic directions
    assert len(np.unique(b // 10)) == 10


def test_rand_isotropic_unitvec_stats():
    key = jax.random.PRNGKey(0)
    v = geometry.rand_isotropic_unitvec(key, (20000,))
    v = np.asarray(v)
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, rtol=1e-12)
    # mean ~ 0 in each component
    assert np.all(np.abs(v.mean(axis=0)) < 0.02)
    # <z^2> = 1/3 for isotropic
    np.testing.assert_allclose((v[:, 2] ** 2).mean(), 1.0 / 3.0, atol=0.01)


def test_frame_transform_preserves_polarisation_degree():
    n = 32
    dirs = random_unitvecs(n)
    t = 2.0 * DAY
    pos = rng.normal(size=(n, 3)) * 0.03 * CLIGHT * t
    vel = pos / t
    q = rng.uniform(-0.5, 0.5, n)
    u = rng.uniform(-0.5, 0.5, n)
    n_cmf, q2, u2 = geometry.frame_transform(
        jnp.asarray(dirs), jnp.asarray(q), jnp.asarray(u), jnp.asarray(vel)
    )
    p_in = np.sqrt(q**2 + u**2)
    p_out = np.sqrt(np.asarray(q2) ** 2 + np.asarray(u2) ** 2)
    np.testing.assert_allclose(p_out, p_in, rtol=1e-8)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(n_cmf), axis=-1), 1.0, rtol=1e-10)


def test_arrive_time():
    pos = np.array([[0.0, 0.0, 1e15]])
    d = np.array([[0.0, 0.0, 1.0]])
    at = geometry.get_arrive_time(pos, d, np.array([1e6]))
    np.testing.assert_allclose(np.asarray(at), 1e6 - 1e15 / CLIGHT, rtol=1e-12)
