"""HBM-streamed bf-continuum tables: the fused kernel must handle
nebular-scale continuum counts (>> the former 512 VMEM cap) by DMA-streaming
nu-windowed chunks (reference windowed bf sum: rpkt.cc:805-893).

Parity is checked at > 4000 continua: streamed vs VMEM-resident kernel, and
streamed kernel vs the XLA propagation path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import artis_tpu.transport.engine as engine_mod
from artis_tpu.options import GridType, kilonova_lte
from artis_tpu.packets import TYPE_RPKT, TYPE_ESCAPE
from make_run import make_run


@pytest.fixture(scope="module")
def scene_bigbf(tmp_path_factory):
    """A scene with >4k bf continua: 3 elements x 8 ions x 200 levels with
    phixs tables for every level of every ion pair; transitions capped at
    lower level <= 3 to keep the linelist small."""
    d = str(tmp_path_factory.mktemp("bfstream"))
    make_run(d, ncells=4, ntimesteps=4, tmin_days=2.0, tmax_days=4.0,
             ngreyts=0, logrho0=-10.0)
    from artis_tpu.synthdata import write_synthetic_atomicdata
    write_synthetic_atomicdata(
        d, elements=((26, 8), (27, 8), (28, 8)), nlevels_per_ion=200,
        nphixs_levels=200, trans_lo_max=3,
    )
    from artis_tpu.driver import Simulation

    opts = kilonova_lte(
        npkts=256, grid_type=GridType.SPHERICAL1D, mintemp=1000.0,
        maxtemp=20000.0, tablesize=10, linewalk_chunk=128,
        pallas_block=256, rpkt_crossings_per_dispatch=2,
        detailed_bf_estimators_on=True,
        detailed_bf_estimators_usefromtimestep=0,
    )
    sim = Simulation(d, opts, datadir="/root/reference/data")
    assert sim.dad.nbfcontinua > 4000, sim.dad.nbfcontinua

    captured = {}

    def capture(*a, **kw):
        captured["a"] = a
        captured["kw"] = kw
        st = a[1]
        done = st.replace(ptype=jnp.full_like(st.ptype, TYPE_ESCAPE))
        return done, a[2], jnp.int32(0), jnp.zeros((), jnp.int32)

    sim._transport_jit = capture
    sim.do_timestep(0)
    (key, st, est, grid, dad, aux, rc, rates, cells, ctx) = captured["a"][:10]
    return dict(key=key, st=st, est=est, grid=grid, dad=dad, cells=cells,
                ctx=ctx, opts=opts, kw=captured["kw"])


def _force_rpkt_state(sc, seed=0):
    rng = np.random.default_rng(seed)
    st = sc["st"]
    n = st.npkts
    ctx, grid = sc["ctx"], sc["grid"]
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
    # frequencies straddling many bf edges so the windows vary across lanes
    nu = 10 ** rng.uniform(14.6, 16.2, n)
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


def _run_pallas(sc, st, tau_u, max_inner, bf_threshold, defer_events=False):
    opts = sc["opts"].replace(
        rpkt_crossings_per_dispatch=max_inner, use_pallas_rpkt=True,
        pallas_bf_stream_threshold=bf_threshold,
        # defer_events (dipole mode) makes the kernel surface every event to
        # the XLA apply pass, aligning the escat/ff/bf split draws with the
        # pure-XLA path for lane-level comparison
        dipole=defer_events, pol_on=defer_events or sc["opts"].pol_on,
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


def _run_xla(sc, st, tau_u, max_inner):
    opts = sc["opts"].replace(rpkt_crossings_per_dispatch=max_inner)
    orig_uniform = engine_mod._uniform

    def patched(key, tag, n, dtype):
        if tag == 51:
            return jnp.asarray(tau_u, dtype)
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


@pytest.mark.slow
def test_supported_lifts_512_cap(scene_bigbf):
    """>4k continua no longer exclude the fused kernel (the VMEM budget
    governs instead)."""
    from artis_tpu.transport import pallas_rpkt as pk
    sc = scene_bigbf
    ncells = sc["cells"].Te.shape[0]
    assert sc["dad"].nbfcontinua > 4000
    opts = sc["opts"].replace(use_pallas_rpkt=True)
    assert pk.supported(opts, sc["dad"], sc["grid"], ncells)


@pytest.mark.slow
@pytest.mark.parametrize("max_inner", [1, 2])
def test_kernel_streamed_bf_matches_resident(scene_bigbf, max_inner):
    """Streamed bf tables must reproduce the VMEM-resident evaluation: same
    cells, same event outcomes, same opacities up to summation order."""
    sc = scene_bigbf
    st0 = _force_rpkt_state(sc)
    n = st0.npkts
    rng = np.random.default_rng(17)
    tau_u = rng.uniform(0.05, 0.95, n)

    outs_res = _run_pallas(sc, st0, tau_u, max_inner, bf_threshold=10**9)
    outs_str = _run_pallas(sc, st0, tau_u, max_inner, bf_threshold=0)

    st_r, est_r = outs_res[0], outs_res[1]
    st_s, est_s = outs_str[0], outs_str[1]
    for name in ("where", "ptype"):
        agree = np.mean(np.asarray(getattr(st_r, name))
                        == np.asarray(getattr(st_s, name)))
        assert agree > 0.995, (name, agree)
    same = (np.asarray(st_r.where) == np.asarray(st_s.where)) & (
        np.asarray(st_r.ptype) == np.asarray(st_s.ptype))
    for name in ("prop_time", "nu_cmf", "e_cmf"):
        a = np.asarray(getattr(st_r, name))[same]
        b = np.asarray(getattr(st_s, name))[same]
        np.testing.assert_allclose(b, a, rtol=1e-4, err_msg=name)
    # absorbed bf continua must match (the streamed two-pass selection)
    at_r = np.asarray(st_r.absorptiontype)
    at_s = np.asarray(st_s.absorptiontype)
    assert np.mean(at_r[same] == at_s[same]) > 0.995
    for name in ("j", "nuj", "ffheating"):
        a = np.asarray(getattr(est_r, name)).sum()
        b = np.asarray(getattr(est_s, name)).sum()
        assert b == pytest.approx(a, rel=1e-3), name
    # detailed bf-rate estimators: streamed ref-accumulation vs resident
    a = np.asarray(est_r.bfrate)
    b = np.asarray(est_s.bfrate)
    np.testing.assert_allclose(b.sum(), a.sum(), rtol=1e-3)
    nz = a.sum(axis=0) > 0
    assert nz.any()
    np.testing.assert_allclose(
        b.sum(axis=0)[nz], a.sum(axis=0)[nz], rtol=5e-3)


@pytest.mark.slow
def test_kernel_streamed_bf_matches_xla(scene_bigbf):
    """Streamed kernel vs the XLA propagation path at >4k continua."""
    sc = scene_bigbf
    st0 = _force_rpkt_state(sc)
    n = st0.npkts
    rng = np.random.default_rng(42)
    tau_u = rng.uniform(0.05, 0.95, n)

    opts_x = dict(sc)
    opts_x["opts"] = sc["opts"].replace(dipole=True, pol_on=True)
    st_x, est_x, *_ = _run_xla(opts_x, st0, tau_u, 1)
    st_p, est_p, *_ = _run_pallas(sc, st0, tau_u, 1, bf_threshold=0,
                                  defer_events=True)

    cell_agree = np.mean(np.asarray(st_x.where) == np.asarray(st_p.where))
    assert cell_agree > 0.97, cell_agree
    ptype_agree = np.mean(np.asarray(st_x.ptype) == np.asarray(st_p.ptype))
    assert ptype_agree > 0.95, ptype_agree
    for name in ("j", "nuj"):
        a = np.asarray(getattr(est_x, name)).sum()
        b = np.asarray(getattr(est_p, name)).sum()
        assert b == pytest.approx(a, rel=1e-3), name
