"""Tile-sorted dispatch parity: the fused Pallas kernel with per-tile table
slices + revisited per-tile accumulators must reproduce the XLA path on 3D
Cartesian models (the reference's O(100^3) production regime, the per-cell
recursion over the 3D grid in grid.cc:1048-1096).  Runs in Pallas interpret
mode on CPU."""

import numpy as np
import pytest
import jax.numpy as jnp

import artis_tpu.transport.engine as engine_mod
from artis_tpu.options import GridType, kilonova_lte
from artis_tpu.packets import TYPE_RPKT

from test_pallas_rpkt import (
    _assert_3d_parity,
    _force_rpkt_state_3d,
    _make_capture_scene,
    _run_pallas,
    _run_xla,
)


@pytest.fixture(scope="module")
def scene_12cube(tmp_path_factory):
    """12^3 3D Cartesian model on its own grid (prop cell == model cell)."""
    return _make_capture_scene(
        tmp_path_factory, "tiled_12cube",
        dict(ncells=12, model_dim=3),
        dict(grid_type=GridType.CARTESIAN3D),
    )


def test_tiled_single_tile_matches_xla(scene_12cube):
    """pallas_tile >= nprop puts every lane in tile 0: exercises the tiled
    machinery (prop_tab BlockSpec slice, ne0-offset slab DMAs, revisited
    accumulators, lane sort) with no tile-boundary pausing, so the standard
    single-dispatch lane-parity assertion applies unchanged."""
    sc = dict(scene_12cube)
    sc["opts"] = sc["opts"].replace(
        pallas_force_tiled=True, pallas_tile=2048)
    from artis_tpu.transport import pallas_rpkt as pk

    assert pk.use_tiled(
        sc["opts"].replace(use_pallas_rpkt=True), sc["dad"], sc["grid"],
        int(sc["cells"].Te.shape[0]))
    _assert_3d_parity(sc, seed=53)


_MERGE_FIELDS = (
    "pos", "dir", "where", "ptype", "prop_time", "nu_rf", "nu_cmf",
    "e_rf", "e_cmf", "next_trans", "escape_type", "escape_time",
    "em_pos", "em_time", "nscatterings", "stokes",
)


def _merge(dst, src, mask):
    upd = {}
    for f in _MERGE_FIELDS:
        a, b = getattr(dst, f), getattr(src, f)
        m = jnp.reshape(mask, mask.shape + (1,) * (a.ndim - 1))
        upd[f] = jnp.where(m, b, a)
    return dst.replace(**upd)


def _converge_tiled(sc, st0, tau_u, max_rounds=12):
    """Dispatch the tiled kernel until every lane has taken its first
    crossing.  A lane in a block whose first lane belongs to a different
    tile is a straggler: it pauses that dispatch and is re-sorted into a
    block of its own tile next time — so one logical crossing of the whole
    wavefront takes several dispatches when tile runs are shorter than a
    block (only the production regime has long runs).  Lanes are frozen
    after their first advancement so each contributes exactly one crossing,
    making the converged state comparable to one XLA crossing."""
    n = st0.npkts
    est0 = sc["est"]
    j0 = np.asarray(est0.j)
    cur = st0
    done = np.zeros(n, bool)
    j_tot = np.zeros_like(j0)
    rounds = 0
    for _ in range(max_rounds):
        rounds += 1
        stf = cur.replace(
            ptype=jnp.where(jnp.asarray(done), -1, cur.ptype))
        st_p, est_p, *_ = _run_pallas(sc, stf, tau_u, 1)
        adv = (np.asarray(st_p.prop_time)
               > np.asarray(stf.prop_time)) & ~done
        j_tot += np.asarray(est_p.j) - j0
        cur = _merge(cur, st_p, jnp.asarray(adv))
        done |= adv
        if done.all():
            break
    return cur, j_tot, done, rounds


def test_tiled_multitile_matches_xla(scene_12cube):
    """7 tiles of 256 prop cells across 2 kernel blocks: lane sorting,
    straggler pausing, per-tile ne0 offsets and the revisited-accumulator
    zero-on-first-visit must together reproduce one XLA crossing."""
    sc = dict(scene_12cube)
    sc["opts"] = sc["opts"].replace(
        pallas_force_tiled=True, pallas_tile=256)

    st0 = _force_rpkt_state_3d(sc, seed=57)
    n = st0.npkts
    rng = np.random.default_rng(57)
    tau_u = rng.uniform(0.05, 0.95, n)

    st_x, est_x, *_ = _run_xla(sc, st0, tau_u, 1)
    st_p, j_tot, done, rounds = _converge_tiled(sc, st0, tau_u)

    assert done.mean() > 0.999, f"only {done.mean():.3f} lanes advanced"
    assert rounds > 1, "multi-tile scene should need straggler re-dispatch"
    cell_agree = np.mean(np.asarray(st_x.where) == np.asarray(st_p.where))
    assert cell_agree > 0.95, f"cell agreement {cell_agree}"
    assert np.mean(
        np.asarray(st_x.ptype) == np.asarray(st_p.ptype)) > 0.95
    a = (np.asarray(est_x.j) - np.asarray(sc["est"].j)).sum()
    assert a > 0
    assert j_tot.sum() == pytest.approx(a, rel=5e-2)


@pytest.mark.slow
def test_tiled_50cube_auto_engage_and_parity(tmp_path_factory):
    """A 50^3-cell 3D model (the reference's production scale): the VMEM
    gate must auto-engage tile-sorted dispatch (no force flag), and a
    dispatch over packets spanning several tiles must match the XLA path."""
    sc = _make_capture_scene(
        tmp_path_factory, "tiled_50cube",
        dict(ncells=50, model_dim=3),
        dict(grid_type=GridType.CARTESIAN3D),
    )
    from artis_tpu.transport import pallas_rpkt as pk

    grid = sc["grid"]
    ncells = int(sc["cells"].Te.shape[0])
    opts_p = sc["opts"].replace(use_pallas_rpkt=True)
    assert int(grid.npts_model) == 125000
    assert pk.supported(opts_p, sc["dad"], grid, ncells)
    assert pk.use_tiled(opts_p, sc["dad"], grid, ncells), \
        "50^3 must exceed the untiled VMEM budget and auto-tile"

    # place packets in a band of ~3 tiles around the grid midplane so the
    # straggler convergence loop stays short (production wavefronts have
    # millions of lanes and tile runs far longer than a block)
    st = sc["st"]
    n = st.npkts
    rng = np.random.default_rng(61)
    t0 = float(sc["ctx"].ts)
    nx = int(grid.ncoordgrid[0])
    tile = pk.pick_tile(sc["opts"])
    c0 = (nx // 2) * nx * nx  # first cell of the midplane z-layer
    cell = rng.integers(c0, min(c0 + 3 * tile, nx ** 3), n)
    ix = cell % nx
    iy = (cell // nx) % nx
    iz = cell // (nx * nx)
    rmax_t = float(grid.rmax) * t0 / float(grid.tmin)
    wid = 2.0 * rmax_t / nx
    off = rng.uniform(0.05, 0.95, (n, 3))
    pos = np.stack([
        -rmax_t + (ix + off[:, 0]) * wid,
        -rmax_t + (iy + off[:, 1]) * wid,
        -rmax_t + (iz + off[:, 2]) * wid,
    ], axis=1)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    nu = 10 ** rng.uniform(14.2, 15.4, n)
    st0 = st.replace(
        ptype=jnp.full(n, TYPE_RPKT, jnp.int32),
        pos=jnp.asarray(pos, np.float64),
        dir=jnp.asarray(d, np.float64),
        where=jnp.asarray(cell, jnp.int32),
        prop_time=jnp.full(n, t0, np.float64),
        nu_rf=jnp.asarray(nu, np.float64),
        nu_cmf=jnp.asarray(nu * 0.98, np.float64),
        e_rf=jnp.ones(n, np.float64),
        e_cmf=jnp.full(n, 0.98, np.float64),
        next_trans=jnp.zeros(n, jnp.int32),
    )
    tau_u = rng.uniform(0.05, 0.95, n)

    st_x, est_x, *_ = _run_xla(sc, st0, tau_u, 1)
    st_p, j_tot, done, _ = _converge_tiled(sc, st0, tau_u, max_rounds=16)

    assert done.mean() > 0.999, f"only {done.mean():.3f} lanes advanced"
    cell_agree = np.mean(np.asarray(st_x.where) == np.asarray(st_p.where))
    assert cell_agree > 0.95, f"cell agreement {cell_agree}"
    a = (np.asarray(est_x.j) - np.asarray(sc["est"].j)).sum()
    assert a > 0
    assert j_tot.sum() == pytest.approx(a, rel=5e-2)
