"""Vector / relativistic-frame math, batched over packet arrays.

TPU-native rebuild of the reference header ``vectors.h`` (reference:
vectors.h:18-385). Every function here is a pure JAX function operating on
arrays whose last axis is the 3-vector component axis, so the whole packet
batch is transformed with VPU-wide element-wise ops — there is no per-packet
scalar code anywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .constants import CLIGHT, CLIGHTSQUARED, CLIGHT_PROP, PI, SYN_DIR


def dot(a: jax.Array, b: jax.Array) -> jax.Array:
    """Batched 3-vector dot product (reference: vectors.h:36-40)."""
    return jnp.sum(a * b, axis=-1)


def vec_len(v: jax.Array) -> jax.Array:
    return jnp.sqrt(dot(v, v))


def vec_norm(v: jax.Array) -> jax.Array:
    return v / vec_len(v)[..., None]


def cross(a: jax.Array, b: jax.Array) -> jax.Array:
    """Batched cross product (reference: vectors.h:47-51)."""
    return jnp.stack(
        [
            a[..., 1] * b[..., 2] - b[..., 1] * a[..., 2],
            a[..., 2] * b[..., 0] - b[..., 2] * a[..., 0],
            a[..., 0] * b[..., 1] - b[..., 0] * a[..., 1],
        ],
        axis=-1,
    )


def get_velocity(pos: jax.Array, t: jax.Array) -> jax.Array:
    """Homologous-flow velocity v = x/t (reference: vectors.h:43-45)."""
    return pos / jnp.asarray(t)[..., None]


def angle_ab(dir1: jax.Array, vel: jax.Array) -> jax.Array:
    """Relativistic aberration of a direction unit vector.

    dir1: direction in frame 1; vel: velocity of frame 2 relative to frame 1
    (reference: vectors.h:61-74).
    """
    vsqr = dot(vel, vel) / CLIGHTSQUARED
    gamma_rel = 1.0 / jnp.sqrt(1.0 - vsqr)
    ndotv = dot(dir1, vel)
    fact1 = gamma_rel * (1.0 - ndotv / CLIGHT)
    fact2 = (gamma_rel - (gamma_rel * gamma_rel * ndotv / (gamma_rel + 1.0) / CLIGHT)) / CLIGHT
    dir2 = (dir1 - vel * fact2[..., None]) / fact1[..., None]
    return vec_norm(dir2)


def doppler_nucmf_on_nurf(
    pos_rf: jax.Array, dir_rf: jax.Array, prop_time: jax.Array, relativistic: bool
) -> jax.Array:
    """Doppler factor nu_cmf/nu_rf, first-order or fully relativistic
    (reference: vectors.h:108-131)."""
    vel_rf = get_velocity(pos_rf, prop_time)
    ndotv = dot(dir_rf, vel_rf)
    dopplerfactor = 1.0 - ndotv / CLIGHT
    if relativistic:
        betasq = dot(vel_rf, vel_rf) / CLIGHTSQUARED
        dopplerfactor = dopplerfactor / jnp.sqrt(1.0 - betasq)
    from .devutil import assert_testmodeonly
    # reference: vectors.h:124-128 (positive, finite, sub-2 Doppler factor).
    # The reference asserts per live packet; in batched compute-then-mask
    # code dead/unselected lanes legitimately carry garbage, so exempt lanes
    # that are not live-packet-shaped: coordinate velocity >= c (outside the
    # homologous grid) or a non-unit direction vector (rpkt.cc:401 asserts
    # |dir| == 1 on live packets).
    live = (dot(vel_rf, vel_rf) < CLIGHTSQUARED) \
        & (jnp.abs(dot(dir_rf, dir_rf) - 1.0) < 1e-2)
    assert_testmodeonly(
        jnp.isfinite(dopplerfactor) & (dopplerfactor > 0.0)
        & (dopplerfactor < 2.0),
        "doppler_nucmf_on_nurf in (0, 2)", mask=live,
    )
    return dopplerfactor


def doppler_squared_nucmf_on_nurf(
    pos_rf: jax.Array, dir_rf: jax.Array, prop_time: jax.Array, relativistic: bool
) -> jax.Array:
    """(nu_cmf/nu_rf)^2 used for intensity transforms (reference: vectors.h:82-100)."""
    vel_rf = get_velocity(pos_rf, prop_time)
    ndotv_on_c = dot(dir_rf, vel_rf) / CLIGHT
    if relativistic:
        return (1.0 - ndotv_on_c) ** 2 / (1.0 - dot(vel_rf, vel_rf) / CLIGHTSQUARED)
    return 1.0 - 2.0 * ndotv_on_c


def move_pkt(
    pos: jax.Array,
    dir_rf: jax.Array,
    prop_time: jax.Array,
    nu_rf: jax.Array,
    nu_cmf: jax.Array,
    e_rf: jax.Array,
    distance: jax.Array,
    relativistic: bool,
):
    """Advance packets a rest-frame ``distance`` along ``dir_rf``.

    Rest-frame energy/frequency are conserved in flight; comoving values are
    recomputed from the new position/time. nu_cmf is clamped to be
    non-increasing to suppress numerical error, exactly as the reference does
    (reference: vectors.h:134-158).

    Returns (pos', prop_time', nu_cmf', e_cmf', dopplerfactor).
    """
    new_time = prop_time + distance / CLIGHT_PROP
    new_pos = pos + dir_rf * distance[..., None]
    dopplerfactor = doppler_nucmf_on_nurf(new_pos, dir_rf, new_time, relativistic)
    new_nu_cmf = jnp.minimum(nu_rf * dopplerfactor, nu_cmf)
    new_e_cmf = e_rf * dopplerfactor
    return new_pos, new_time, new_nu_cmf, new_e_cmf, dopplerfactor


def get_arrive_time(pos: jax.Array, dir_rf: jax.Array, escape_time: jax.Array) -> jax.Array:
    """Observer arrival time t_esc - (pos.dir)/c (reference: vectors.h:168-170)."""
    return escape_time - dot(pos, dir_rf) / CLIGHT_PROP


def get_escapedirectionbin(dir_in: jax.Array, ncosthetabins: int, nphibins: int) -> jax.Array:
    """Escape-direction bin index over a costheta x phi grid
    (reference: vectors.h:172-202)."""
    syn_dir = jnp.asarray(SYN_DIR, dtype=dir_in.dtype)
    xhat = jnp.asarray((1.0, 0.0, 0.0), dtype=dir_in.dtype)
    d = vec_norm(dir_in)
    costheta = dot(d, syn_dir)
    # NB: reference divides by NPHIBINS here (not NCOSTHETABINS) — preserved.
    costhetabin = jnp.minimum(
        ((costheta + 1.0) * nphibins / 2.0).astype(jnp.int32), ncosthetabins - 1
    )
    vec1 = cross(d, syn_dir)
    vec2 = cross(jnp.broadcast_to(xhat, d.shape), syn_dir)
    cosphi = dot(vec1, vec2) / vec_len(vec1) / vec_len(vec2)
    cosphi = jnp.clip(cosphi, -1.0, 1.0)
    vec3 = cross(vec2, syn_dir)
    testphi = dot(vec1, vec3)
    phi = jnp.where(testphi >= 0, jnp.arccos(cosphi), jnp.arccos(cosphi) + PI)
    phibin = jnp.minimum((phi / 2.0 / PI * nphibins).astype(jnp.int32), nphibins - 1)
    return costhetabin * nphibins + phibin


def rand_isotropic_unitvec(key: jax.Array, shape=(), dtype=jnp.float64) -> jax.Array:
    """Isotropic random unit vectors (reference: vectors.h:205-213)."""
    k1, k2 = jax.random.split(key)
    costheta = -1.0 + 2.0 * jax.random.uniform(k1, shape, dtype=dtype)
    phi = jax.random.uniform(k2, shape, dtype=dtype) * 2.0 * PI
    sintheta = jnp.sqrt(1.0 - costheta**2)
    return jnp.stack([sintheta * jnp.cos(phi), sintheta * jnp.sin(phi), costheta], axis=-1)


# --- Stokes-vector frame machinery (polarisation) -------------------------


def meridian(n: jax.Array):
    """Meridian-frame axes ref1, ref2 for direction n (reference: vectors.h:252-262)."""
    n_xylen = jnp.sqrt(n[..., 0] ** 2 + n[..., 1] ** 2)
    ref1 = jnp.stack(
        [
            -n[..., 0] * n[..., 2] / n_xylen,
            -n[..., 1] * n[..., 2] / n_xylen,
            (1.0 - n[..., 2] ** 2) / n_xylen,
        ],
        axis=-1,
    )
    ref2 = cross(ref1, n)
    return ref1, ref2


def get_rot_angle(n1: jax.Array, n2: jax.Array, ref1: jax.Array, ref2: jax.Array) -> jax.Array:
    """Rotation angle from the scattering plane (reference: vectors.h:216-249)."""
    n1_dot_n2 = dot(n1, n2)
    ref1_sc = vec_norm(n1 * n1_dot_n2[..., None] - n2)
    c1 = jnp.clip(dot(ref1_sc, ref1), -1.0, 1.0)
    c2 = dot(ref1_sc, ref2)
    base = jnp.arccos(jnp.abs(c1))
    i = jnp.where(
        (c1 > 0) & (c2 > 0),
        base,
        jnp.where(
            (c1 < 0) & (c2 > 0),
            PI - base,
            jnp.where((c1 > 0) & (c2 < 0), 2.0 * PI - base, PI + base),
        ),
    )
    i = jnp.where(c1 == 0, PI / 2.0, i)
    i = jnp.where(c2 == 0, 0.0, i)
    return i


def lorentz(e_rf: jax.Array, n_rf: jax.Array, v: jax.Array) -> jax.Array:
    """Lorentz transform of the electric-field unit vector
    (reference: vectors.h:264-294)."""
    beta = v / CLIGHT
    vsqr = dot(beta, beta)
    gamma_rel = 1.0 / jnp.sqrt(1.0 - vsqr)
    e_dot_beta = dot(e_rf, beta)
    e_par = beta * (e_dot_beta / vsqr)[..., None]
    e_perp = e_rf - e_par
    b_rf = cross(n_rf, e_rf)
    v_cr_b = cross(beta, b_rf)
    e_cmf = e_par + gamma_rel[..., None] * (e_perp + v_cr_b)
    return vec_norm(e_cmf)


def frame_transform(n_rf: jax.Array, q: jax.Array, u: jax.Array, v: jax.Array):
    """Transform Stokes Q,U from rest frame to comoving frame; returns
    (n_cmf, Q', U') (reference: vectors.h:297-385)."""
    ref1_rf, ref2_rf = meridian(n_rf)
    p = jnp.sqrt(q * q + u * u)
    safe_p = jnp.where(p > 0, p, 1.0)
    cos2 = q / safe_p
    sin2 = u / safe_p
    half = jnp.arccos(jnp.clip(jnp.abs(cos2), 0.0, 1.0))
    rot2 = jnp.where(
        (cos2 > 0) & (sin2 > 0),
        half,
        jnp.where(
            (cos2 < 0) & (sin2 > 0),
            PI - half,
            jnp.where((cos2 < 0) & (sin2 < 0), PI + half, 2.0 * PI - half),
        ),
    )
    rot2 = jnp.where(cos2 == 0, jnp.where(u < 0, 1.5 * PI, 0.5 * PI), rot2)
    rot2 = jnp.where(sin2 == 0, jnp.where(q < 0, PI, 0.0), rot2)
    rot_angle = jnp.where(p > 0, rot2 / 2.0, 0.0)

    ca, sa = jnp.cos(rot_angle)[..., None], jnp.sin(rot_angle)[..., None]
    elec_rf = ca * ref1_rf - sa * ref2_rf
    n_cmf = angle_ab(n_rf, v)
    elec_cmf = lorentz(elec_rf, n_rf, v)
    ref1_cmf, ref2_cmf = meridian(n_cmf)
    c1 = dot(elec_cmf, ref1_cmf)
    c2 = dot(elec_cmf, ref2_cmf)
    base = jnp.arccos(jnp.clip(jnp.abs(c1), 0.0, 1.0))
    theta = jnp.where(
        (c1 > 0) & (c2 < 0),
        base,
        jnp.where(
            (c1 < 0) & (c2 > 0),
            PI + base,
            jnp.where((c1 < 0) & (c2 < 0), PI - base, 2.0 * PI - base),
        ),
    )
    theta = jnp.where(c1 == 0, PI / 2.0, theta)
    theta = jnp.where(c2 == 0, 0.0, theta)
    theta = jnp.where(c1 > 1, 0.0, theta)
    theta = jnp.where(c1 < -1, PI, theta)
    q_out = jnp.cos(2.0 * theta) * p
    u_out = jnp.sin(2.0 * theta) * p
    return n_cmf, q_out, u_out
