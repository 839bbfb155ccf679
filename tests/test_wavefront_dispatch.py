"""Wavefront dispatch mechanics: the moving-lane compaction sort in front of
the fused Pallas kernel and the exit_below device-side chunk early-exit
(the TPU counterparts of the reference's sort-escaped-packets pass,
update_packets.cc:281-332).  Runs in Pallas interpret mode on CPU."""

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
    d = str(tmp_path_factory.mktemp("wfdisp"))
    make_run(d, ncells=8, ntimesteps=4, tmin_days=2.0, tmax_days=4.0,
             ngreyts=0, logrho0=-8.0)
    from artis_tpu.driver import Simulation

    opts = kilonova_lte(
        npkts=512, grid_type=GridType.SPHERICAL1D, mintemp=1000.0,
        maxtemp=20000.0, tablesize=20, linewalk_chunk=128,
        pallas_block=128,  # 4 blocks at 512 lanes: the sort has work to do
        rpkt_crossings_per_dispatch=4,
    )
    sim = Simulation(d, opts, datadir="/root/reference/data")

    captured = {}
    orig = sim._transport_jit

    def capture(*a, **kw):
        captured.setdefault("a", a)
        captured.setdefault("kw", kw)
        return orig(*a, **kw)

    sim._transport_jit = capture
    sim.do_timestep(0)
    (key, st, est, grid, dad, aux, rc, rates, cells, ctx) = captured["a"][:10]
    return dict(key=key, st=st, est=est, grid=grid, dad=dad, aux=aux, rc=rc,
                rates=rates, cells=cells, ctx=ctx, opts=opts,
                kw=captured["kw"])


def _rpkt_state(sc, seed=0):
    """All-rpkt in-flight state spread over the grid (f64 path)."""
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
    dv = rng.normal(size=(n, 3))
    dv /= np.linalg.norm(dv, axis=1, keepdims=True)
    nu = 10 ** rng.uniform(14.2, 15.4, n)
    f = np.float64
    return st.replace(
        ptype=jnp.full(n, TYPE_RPKT, jnp.int32),
        pos=jnp.asarray(u * r[:, None], f), dir=jnp.asarray(dv, f),
        where=jnp.asarray(cell, jnp.int32),
        prop_time=jnp.full(n, t0, f),
        nu_rf=jnp.asarray(nu, f), nu_cmf=jnp.asarray(nu * 0.98, f),
        e_rf=jnp.ones(n, f), e_cmf=jnp.full(n, 0.98, f),
        next_trans=jnp.zeros(n, jnp.int32),
    )


def _run_pallas(sc, st, tau_u, opts):
    tau = -np.log(np.maximum(np.asarray(tau_u, np.float32), 1e-30))
    sel = np.full(st.npkts, 0.5, np.float32)
    engine_mod._PALLAS_TEST_INJECT = (jnp.asarray(tau), jnp.asarray(sel))
    try:
        return engine_mod.rpkt_step_pallas(
            jax.random.PRNGKey(1), st, sc["est"], sc["ctx"], sc["grid"],
            sc["dad"], sc["cells"], opts, sc["kw"]["opacity_case"],
        )
    finally:
        engine_mod._PALLAS_TEST_INJECT = None


def test_compaction_sort_is_invisible(scene):
    """pallas_compact_moving must not change any lane's outcome: moving lanes
    are sorted to the front for dispatch and un-permuted on return, and
    non-moving lanes come back untouched."""
    st0 = _rpkt_state(scene, seed=9)
    n = st0.npkts
    rng = np.random.default_rng(5)
    # half the lanes inactive, split between escaped and past-t2
    off = rng.uniform(size=n) < 0.5
    past = off & (rng.uniform(size=n) < 0.5)
    t2 = float(scene["ctx"].t2)
    st0 = st0.replace(
        ptype=jnp.where(jnp.asarray(off & ~past), TYPE_ESCAPE, st0.ptype),
        prop_time=jnp.where(jnp.asarray(past),
                            jnp.asarray(t2 * 1.01, st0.prop_time.dtype),
                            st0.prop_time),
    )
    tau_u = rng.uniform(0.05, 0.95, n)
    opts = scene["opts"].replace(rpkt_crossings_per_dispatch=4,
                                 use_pallas_rpkt=True)
    out_on = _run_pallas(scene, st0, tau_u,
                         opts.replace(pallas_compact_moving=True))
    out_off = _run_pallas(scene, st0, tau_u,
                          opts.replace(pallas_compact_moving=False))
    st_a, est_a = out_on[0], out_on[1]
    st_b, est_b = out_off[0], out_off[1]
    assert int(out_on[-1]) == int(out_off[-1])  # advance count
    for name in ("where", "ptype", "next_trans"):
        np.testing.assert_array_equal(
            np.asarray(getattr(st_a, name)), np.asarray(getattr(st_b, name)),
            err_msg=name)
    # per-lane compute is position-independent under injected draws: the
    # permuted dispatch must reproduce the unsorted one exactly
    for name in ("prop_time", "nu_cmf", "nu_rf", "e_cmf", "e_rf", "pos", "dir"):
        np.testing.assert_array_equal(
            np.asarray(getattr(st_a, name)), np.asarray(getattr(st_b, name)),
            err_msg=name)
    offm = np.asarray(off)
    np.testing.assert_array_equal(np.asarray(st_a.where)[offm],
                                  np.asarray(st0.where)[offm])
    np.testing.assert_array_equal(np.asarray(st_a.nu_cmf)[offm],
                                  np.asarray(st0.nu_cmf)[offm])
    # cell estimators are permutation-invariant up to summation order
    for name in ("j", "nuj", "ffheating"):
        np.testing.assert_allclose(
            np.asarray(getattr(est_a, name)), np.asarray(getattr(est_b, name)),
            rtol=1e-5, err_msg=name)


def test_exit_below_hands_off_early(scene):
    """With exit_below >= the wavefront size the chunk's device loop must
    exit after exactly one iteration while packets are still active, and the
    iteration must have advanced the same state as exit_below=0's first."""
    sc = scene
    st0 = _rpkt_state(sc, seed=2)
    kw = sc["kw"]

    def run(opts, max_iters):
        return engine_mod.transport_timestep(
            jax.random.PRNGKey(3), st0, sc["est"], sc["grid"], sc["dad"],
            sc["aux"], sc["rc"], sc["rates"], sc["cells"], sc["ctx"], opts,
            kw["gamma_kappagrey"], kw["opacity_case"],
            kw["kpktdiffusion_timescale"], kw["apply_kpkt_diffusion"],
            max_iters=max_iters,
        )

    opts = sc["opts"].replace(rpkt_crossings_per_dispatch=2)
    st_e, est_e, iters_e, nsteps_e = run(opts.replace(exit_below=10**8), 50)
    assert int(iters_e) == 1
    n_act = int(jnp.sum(((st_e.ptype != TYPE_ESCAPE)
                         & (st_e.prop_time < sc["ctx"].t2)).astype(jnp.int32)))
    assert n_act > 0, "early exit should leave stragglers for the driver"
    st_1, est_1, iters_1, nsteps_1 = run(opts, 1)
    assert int(iters_1) == 1
    assert int(nsteps_e) == int(nsteps_1)
    np.testing.assert_array_equal(np.asarray(st_e.where),
                                  np.asarray(st_1.where))
    np.testing.assert_array_equal(np.asarray(st_e.ptype),
                                  np.asarray(st_1.ptype))
