"""Parity tests: the fused Pallas crossing kernel vs the XLA propagation path
(reference physics: rpkt.cc:604-737). Runs in Pallas interpret mode on CPU."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import artis_tpu.transport.engine as engine_mod
from artis_tpu.options import GridType, kilonova_lte
from artis_tpu.packets import TYPE_RPKT, TYPE_ESCAPE
from make_run import make_run


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pallas"))
    make_run(d, ncells=8, ntimesteps=4, tmin_days=2.0, tmax_days=4.0, ngreyts=0,
             logrho0=-8.0)
    from artis_tpu.driver import Simulation

    opts = kilonova_lte(
        npkts=512, grid_type=GridType.SPHERICAL1D, mintemp=1000.0,
        maxtemp=20000.0, tablesize=20, linewalk_chunk=128,
        pallas_block=256,
        rpkt_crossings_per_dispatch=4,
    )
    sim = Simulation(d, opts, datadir="/root/reference/data")

    captured = {}
    orig = sim._transport_jit

    def capture(*a, **kw):
        captured["a"] = a
        captured["kw"] = kw
        return orig(*a, **kw)

    sim._transport_jit = capture
    sim.do_timestep(0)
    (key, st, est, grid, dad, aux, rc, rates, cells, ctx) = captured["a"][:10]
    kw = captured["kw"]
    return dict(key=key, st=st, est=est, grid=grid, dad=dad, cells=cells,
                ctx=ctx, opts=opts, kw=kw)


def _force_rpkt_state(sc, seed=0):
    """A packet state of in-flight r-packets spread over the grid."""
    rng = np.random.default_rng(seed)
    st = sc["st"]
    n = st.npkts
    ctx = sc["ctx"]
    grid = sc["grid"]
    t0 = float(ctx.ts)
    ncell = int(grid.ncoordgrid[0])
    cell = rng.integers(0, ncell, n)
    rmin = np.asarray(grid.cell_pos_min[:ncell, 0]) * t0 / float(grid.tmin)
    rmax = np.asarray(grid.cell_pos_max[:ncell, 0]) * t0 / float(grid.tmin)
    r = rmin[cell] + (rmax[cell] - rmin[cell]) * rng.uniform(0.02, 0.98, n)
    u = rng.normal(size=(n, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    pos = u * r[:, None]
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    nu = 10 ** rng.uniform(14.2, 15.4, n)
    f32 = np.float64
    st = st.replace(
        ptype=jnp.full(n, TYPE_RPKT, jnp.int32),
        pos=jnp.asarray(pos, f32),
        dir=jnp.asarray(d, f32),
        where=jnp.asarray(cell, jnp.int32),
        prop_time=jnp.full(n, t0, f32),
        nu_rf=jnp.asarray(nu, f32),
        nu_cmf=jnp.asarray(nu * 0.98, f32),
        e_rf=jnp.ones(n, f32),
        e_cmf=jnp.full(n, 0.98, f32),
        next_trans=jnp.zeros(n, jnp.int32),
    )
    return st


def _run_xla(sc, st, tau_u, max_inner, sel_u=None):
    """The XLA propagation with injected tau draws (tag 51) and optionally
    the expansion-mode bound-bound split draw (tag 59)."""
    opts = sc["opts"].replace(rpkt_crossings_per_dispatch=max_inner)
    orig_uniform = engine_mod._uniform

    def patched(key, tag, n, dtype):
        if tag == 51:
            return jnp.asarray(tau_u, dtype)
        if tag == 59 and sel_u is not None:
            return jnp.full((n,), sel_u, dtype)
        return orig_uniform(key, tag, n, dtype)

    engine_mod._uniform = patched
    try:
        out = engine_mod.rpkt_step(
            jax.random.PRNGKey(1), st, sc["est"], sc["ctx"], sc["grid"],
            sc["dad"], sc["cells"], opts, sc["kw"]["opacity_case"],
        )
    finally:
        engine_mod._uniform = orig_uniform
    return out


def _run_pallas(sc, st, tau_u, max_inner):
    opts = sc["opts"].replace(
        rpkt_crossings_per_dispatch=max_inner, use_pallas_rpkt=True
    )
    tau = -np.log(np.maximum(np.asarray(tau_u, np.float32), 1e-30))
    sel = np.full(st.npkts, 0.5, np.float32)
    engine_mod._PALLAS_TEST_INJECT = (jnp.asarray(tau), jnp.asarray(sel))
    try:
        out = engine_mod.rpkt_step_pallas(
            jax.random.PRNGKey(1), st, sc["est"], sc["ctx"], sc["grid"],
            sc["dad"], sc["cells"], opts, sc["kw"]["opacity_case"],
        )
    finally:
        engine_mod._PALLAS_TEST_INJECT = None
    return out


@pytest.mark.parametrize("max_inner", [1, 4])
def test_kernel_matches_xla_path(scene, max_inner):
    st0 = _force_rpkt_state(scene)
    n = st0.npkts
    rng = np.random.default_rng(42)
    tau_u = rng.uniform(0.05, 0.95, n)

    st_x, est_x, mam_x, mal_x, maa_x, nadv_x = _run_xla(scene, st0, tau_u, max_inner)
    st_p, est_p, mam_p, mal_p, maa_p, nadv_p = _run_pallas(scene, st0, tau_u, max_inner)

    # integer outcomes: cell, ptype (escape), next_trans, macro-atom masks
    cell_agree = np.mean(np.asarray(st_x.where) == np.asarray(st_p.where))
    assert cell_agree > 0.97, f"cell agreement {cell_agree}"
    ptype_agree = np.mean(np.asarray(st_x.ptype) == np.asarray(st_p.ptype))
    assert ptype_agree > 0.97

    both_same_cell = (np.asarray(st_x.where) == np.asarray(st_p.where)) & (
        np.asarray(st_x.ptype) == np.asarray(st_p.ptype)
    )
    # float state on agreeing lanes (f32 vs f64 path tolerances)
    for name in ("prop_time", "nu_cmf", "e_cmf"):
        a = np.asarray(getattr(st_x, name))[both_same_cell]
        b = np.asarray(getattr(st_p, name))[both_same_cell]
        np.testing.assert_allclose(b, a, rtol=2e-3, atol=1e-30, err_msg=name)
    px = np.asarray(st_x.pos)[both_same_cell]
    pp = np.asarray(st_p.pos)[both_same_cell]
    scale = np.maximum(np.linalg.norm(px, axis=1, keepdims=True), 1e-30)
    assert np.max(np.abs(px - pp) / scale) < 2e-3

    # macro-atom activations agree on agreeing lanes
    mm_x = np.asarray(mam_x)
    mm_p = np.asarray(mam_p)
    agree_ma = np.mean(mm_x[both_same_cell] == mm_p[both_same_cell])
    assert agree_ma > 0.97

    # estimator totals within a small tolerance
    for name in ("j", "nuj", "ffheating"):
        a = np.asarray(getattr(est_x, name)).sum()
        b = np.asarray(getattr(est_p, name)).sum()
        assert b == pytest.approx(a, rel=5e-3), name
    # crossing-step counts match closely
    assert abs(int(nadv_x) - int(nadv_p)) <= max(3, 0.02 * int(nadv_x) + 3)


def test_lut_estimators_match(scene):
    st0 = _force_rpkt_state(scene, seed=3)
    n = st0.npkts
    tau_u = np.full(n, 0.5)
    _, est_x, *_ = _run_xla(scene, st0, tau_u, 2)
    _, est_p, *_ = _run_pallas(scene, st0, tau_u, 2)
    gx = np.asarray(est_x.gammaestimator).sum()
    gp = np.asarray(est_p.gammaestimator).sum()
    if gx > 0:
        assert gp == pytest.approx(gx, rel=1e-2)
    bx = np.asarray(est_x.bfheatingestimator).sum()
    bp = np.asarray(est_p.bfheatingestimator).sum()
    if bx > 0:
        assert bp == pytest.approx(bx, rel=1e-2)


@pytest.fixture(scope="module")
def scene_expo(tmp_path_factory):
    """Same scene with binned expansion opacities on (reference:
    rpkt.cc:199-290; the kilonova CI configs use this mode)."""
    d = str(tmp_path_factory.mktemp("pallas_expo"))
    make_run(d, ncells=8, ntimesteps=4, tmin_days=2.0, tmax_days=4.0, ngreyts=0,
             logrho0=-8.0)
    from artis_tpu.driver import Simulation

    opts = kilonova_lte(
        npkts=512, grid_type=GridType.SPHERICAL1D, mintemp=1000.0,
        maxtemp=20000.0, tablesize=20, linewalk_chunk=128,
        pallas_block=256, rpkt_crossings_per_dispatch=4,
        expansionopacities_on=True,
        rpkt_boundbound_thermalisation_probability=0.9,
    )
    sim = Simulation(d, opts, datadir="/root/reference/data")
    captured = {}
    orig = sim._transport_jit

    def capture(*a, **kw):
        captured["a"] = a
        captured["kw"] = kw
        return orig(*a, **kw)

    sim._transport_jit = capture
    sim.do_timestep(0)
    (key, st, est, grid, dad, aux, rc, rates, cells, ctx) = captured["a"][:10]
    kw = captured["kw"]
    return dict(key=key, st=st, est=est, grid=grid, dad=dad, cells=cells,
                ctx=ctx, opts=opts, kw=kw)


@pytest.mark.parametrize("max_inner", [1, 4])
def test_kernel_expansion_mode_matches_xla(scene_expo, max_inner):
    """The in-kernel binned expansion-opacity walk must reproduce the XLA
    bin walk lane-for-lane with injected draws."""
    from artis_tpu.transport import pallas_rpkt as pk

    sc = scene_expo
    assert pk.supported(
        sc["opts"].replace(use_pallas_rpkt=True), sc["dad"], sc["grid"],
        int(sc["cells"].Te.shape[0]),
    )
    st0 = _force_rpkt_state(sc)
    n = st0.npkts
    rng = np.random.default_rng(7)
    tau_u = rng.uniform(0.05, 0.95, n)

    st_x, est_x, mam_x, *_rest_x, nadv_x = _run_xla(sc, st0, tau_u, max_inner, sel_u=0.5)
    st_p, est_p, mam_p, *_rest_p, nadv_p = _run_pallas(sc, st0, tau_u, max_inner)

    # per-crossing bin-edge ties flip for ~3% of lanes (f32 kernel vs f64 XLA
    # reference path); divergence compounds with the crossing count
    thresh = 0.95 if max_inner <= 1 else 0.85
    cell_agree = np.mean(np.asarray(st_x.where) == np.asarray(st_p.where))
    assert cell_agree > thresh, f"cell agreement {cell_agree}"
    ptype_agree = np.mean(np.asarray(st_x.ptype) == np.asarray(st_p.ptype))
    assert ptype_agree > thresh

    both = (np.asarray(st_x.where) == np.asarray(st_p.where)) & (
        np.asarray(st_x.ptype) == np.asarray(st_p.ptype)
    )
    # the 971 bin-edge comparisons amplify f32-vs-f64 rounding: a handful of
    # lanes pick the neighbouring bin and diverge; require 95% lane-exactness
    # and closeness elsewhere
    for name in ("prop_time", "nu_cmf", "e_cmf"):
        a = np.asarray(getattr(st_x, name))[both]
        b = np.asarray(getattr(st_p, name))[both]
        rel = np.abs(b - a) / np.maximum(np.abs(a), 1e-30)
        assert np.mean(rel < 3e-3) > (0.95 if max_inner <= 1 else 0.85), (
            name, np.mean(rel < 3e-3))
    for name in ("j", "nuj"):
        a = np.asarray(getattr(est_x, name)).sum()
        b = np.asarray(getattr(est_p, name)).sum()
        assert b == pytest.approx(a, rel=5e-2 if max_inner <= 1 else 2e-1), name
