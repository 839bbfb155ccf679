"""Virtual-packet tests (reference: vpkt.cc:162-420, 899-962)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from artis_tpu import atomic
from artis_tpu.io import atomicdata
from artis_tpu.options import GridType, kilonova_lte
from artis_tpu.transport import vpkt
from artis_tpu.constants import PI


def test_config_parsing(tmp_path):
    p = tmp_path / "vpkt.txt"
    p.write_text("2\n0.5 -0.5\n0.0 90.0\n1\n2\n0 -1\n1 1.0 3.0\n0\n8.0\n")
    cfg = vpkt.read_vpkt_config(str(p), 1e5, 1e6)
    assert cfg.nobs == 2 and cfg.nspectra == 2
    assert cfg.exclude == (0, -1)
    assert cfg.tmin == pytest.approx(86400.0)
    assert cfg.tmax == pytest.approx(3 * 86400.0)
    assert cfg.tau_max == 8.0
    dirs = np.asarray(cfg.obsdirs)
    np.testing.assert_allclose(dirs[0], [np.sqrt(0.75), 0, 0.5], atol=1e-12)
    np.testing.assert_allclose(np.linalg.norm(dirs, axis=1), 1.0, atol=1e-12)


def test_segment_bb_tau_closed_form(tmp_path):
    """The cumulative-table segment tau must equal the explicit per-line sum
    tau_l * (t + D_l / c) over lines crossed (vpkt.cc:293-346)."""
    from artis_tpu.synthdata import write_synthetic_atomicdata

    write_synthetic_atomicdata(tmp_path, elements=((26, 2),), nlevels_per_ion=6)
    ad = atomicdata.read_atomicdata(str(tmp_path))
    dad = atomic.to_device(ad)
    rng = np.random.default_rng(1)
    ncells = 2
    tau_factor = jnp.asarray(10.0 ** rng.uniform(-22, -18, (ncells, ad.nlines)))
    cum_tau, cum_taunu = vpkt.build_vpkt_tables(tau_factor, dad)

    line_nu = np.asarray(dad.line_nu)
    nu_start = np.array([line_nu[2] * 1.0001, line_nu[0] * 1.1])
    nu_end = np.array([line_nu[-2] * 1.0001, line_nu[5] * 0.9999])
    t0 = np.array([2e5, 3e5])
    dndl = np.array([-1e-3, -2e-3])
    cellidx = jnp.asarray([0, 1])
    got = np.asarray(vpkt._segment_bb_tau(
        dad, cum_tau[0], cum_taunu[0], cellidx, jnp.asarray(nu_start),
        jnp.asarray(nu_end), jnp.asarray(t0), jnp.asarray(dndl),
    ))
    tf = np.asarray(tau_factor)
    c = 2.99792458e10
    for i in range(2):
        sel = (line_nu <= nu_start[i]) & (line_nu > nu_end[i])
        d_l = (line_nu[sel] - nu_start[i]) / dndl[i]
        expected = np.sum(tf[i, sel] * (t0[i] + d_l / c))
        assert got[i] == pytest.approx(expected, rel=1e-10)


def test_vpkt_isotropic_contribution_thin(tmp_path):
    """An isotropic emission in a transparent medium contributes e/(4 pi) per
    observer with zero Q/U."""
    from artis_tpu.driver import Simulation
    from artis_tpu.synthdata import make_run

    make_run(str(tmp_path), ncells=4, ntimesteps=4, tmax_days=2.0, ngreyts=1)
    opts = kilonova_lte(
        npkts=128, grid_type=GridType.SPHERICAL1D, mintemp=1000.0,
        maxtemp=20000.0, tablesize=12, vpkt_on=True, vpkt_nobs=1,
        vpkt_vmnubins=100, vpkt_vmtbins=8,
    )
    sim = Simulation(str(tmp_path), opts, datadir="/root/reference/data")
    ctx = sim.update_grid(0)
    cfg = sim.vpkt_cfg
    vspec = vpkt.zero_vspectra(cfg, jnp.float64)
    n = 4
    pos = jnp.tile(jnp.asarray([[1e13, 0.0, 0.0]]), (n, 1))
    dirv = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    t = jnp.full(n, float(sim.ts.mid[1]))
    where = jnp.zeros(n, jnp.int32)
    nu = jnp.full(n, 5e14)
    e = jnp.ones(n)
    qu = jnp.zeros((n, 2))
    # zero out all opacity so exp(-tau) = 1
    import dataclasses as _dc
    ctx0 = _dc.replace(
        ctx,
        chi_ff_nnionpart=jnp.zeros_like(ctx.chi_ff_nnionpart),
        bf_a=jnp.zeros_like(ctx.bf_a),
        vpkt_cum_tau=jnp.zeros_like(ctx.vpkt_cum_tau),
        vpkt_cum_taunu=jnp.zeros_like(ctx.vpkt_cum_taunu),
    )
    vspec, _ = vpkt.trace_vpkts(
        cfg, vspec, sim.dad, sim.grid, sim.cells.replace(
            nne=jnp.zeros_like(sim.cells.nne),
            thick=jnp.zeros_like(sim.cells.thick),
        ),
        ctx0,
        jnp.zeros_like(ctx.vpkt_cum_tau), jnp.zeros_like(ctx.vpkt_cum_taunu),
        pos, dirv, t, where, nu, e, qu,
        jnp.zeros(n, bool), jnp.ones(n, bool), opacity_case=4,
    )
    v = np.asarray(vspec)
    total_i = v[..., 0].sum()
    # 4 packets x e=1 x 1/(4 pi), up to the O(v/c ~ 0.005) Doppler factor
    assert total_i == pytest.approx(n / (4 * PI), rel=1e-2)
    assert abs(v[..., 1].sum()) < 1e-12
    assert abs(v[..., 2].sum()) < 1e-12


def test_vgrid_config_parsing(tmp_path):
    """Full reference vpkt.txt format incl. the velocity-grid section
    (reference: vpkt.cc:741-790)."""
    p = tmp_path / "vpkt.txt"
    p.write_text(
        "1\n0.0\n0.0\n1\n2\n0 26\n1 1.0 3.0\n0\n"
        "0 100\n"       # override_thickcell cell_thick_tau
        "8.0\n"          # tau_max
        "1\n"            # vgrid_on
        "1.2 2.8\n"      # tmin_grid tmax_grid [days]
        "2\n3000 6000\n6000 10000\n"
    )
    cfg = vpkt.read_vpkt_config(str(p), 1e5, 1e6)
    assert cfg.tau_max == 8.0
    assert cfg.vgrid_on
    assert cfg.exclude == (0, 26)
    assert cfg.vgrid_tmin == pytest.approx(1.2 * 86400.0)
    assert cfg.vgrid_numin.shape == (2,)
    # wavelength 3000-6000 A -> nu from c/6000A to c/3000A
    np.testing.assert_allclose(
        float(cfg.vgrid_numin[0]), 2.99792458e18 / 6000, rtol=1e-12
    )


def test_per_element_exclusion_tables(tmp_path):
    """Excluding an element's lines must lower the bb optical depth; with a
    single-element atom the excluded channel sees zero line opacity."""
    from artis_tpu.synthdata import write_synthetic_atomicdata

    write_synthetic_atomicdata(tmp_path, elements=((26, 2),), nlevels_per_ion=6)
    ad = atomicdata.read_atomicdata(str(tmp_path))
    dad = atomic.to_device(ad)
    rng = np.random.default_rng(2)
    tau_factor = jnp.asarray(10.0 ** rng.uniform(-22, -18, (2, ad.nlines)))
    cum_tau, cum_taunu = vpkt.build_vpkt_tables(tau_factor, dad, exclude=(0, 26))
    assert cum_tau.shape[0] == 2  # full + Fe-excluded
    # the only element is Fe, so its exclusion table must be all zero
    np.testing.assert_allclose(np.asarray(cum_tau[1]), 0.0)
    assert np.asarray(cum_tau[0]).max() > 0


@pytest.mark.slow
def test_vgrid_maps_accumulate(tmp_path):
    """End-to-end: classic-style vpkt run with vgrid_on produces finite,
    populated velocity-grid polarisation maps and the map output file."""
    import os
    from artis_tpu.driver import Simulation
    from artis_tpu.synthdata import make_run

    d = str(tmp_path)
    make_run(d, ncells=4, ntimesteps=4, tmax_days=2.0, ngreyts=0)
    with open(os.path.join(d, "vpkt.txt"), "w") as f:
        f.write(
            "1\n0.0\n0.0\n1\n2\n0 26\n"
            "0 0 0\n"            # override_tminmax tmin tmax (use defaults)
            "1\n1\n500 20000\n"  # custom freq: 1 range, 500-20000 A
            # override the vpkt thick-cell threshold: the synthetic input.txt
            # carries cell_is_optically_thick=0.0, and inheriting it (flag 0,
            # vpkt.cc:746) marks EVERY cell thick=2 so all vpkts die — the
            # reference behaves identically (update_grid.cc:1031); its
            # classic configs use nonzero thresholds (8.0 / 3.0)
            "1 100\n30.0\n1\n0.001 2.0\n1\n500 20000\n"
        )
    opts = kilonova_lte(
        npkts=512, grid_type=GridType.SPHERICAL1D, mintemp=1000.0,
        maxtemp=20000.0, tablesize=12, vpkt_on=True,
        vpkt_vmnubins=100, vpkt_vmtbins=8, linewalk_chunk=64,
    )
    sim = Simulation(d, opts, datadir="/root/reference/data")
    assert sim.vpkt_cfg.vgrid_on
    for ts in range(3):
        sim.do_timestep(ts)
    vg = sim._vgrid_total
    assert vg.shape[0] == 1 and vg.shape[4] == 3
    assert np.all(np.isfinite(vg))
    assert vg[..., 0].sum() > 0, "no vgrid contributions accumulated"
    # scattered vpkts carry nonzero Q/U (Rayleigh phase matrix); the map's
    # polarisation channels must record them (vpkt.cc:404-413)
    assert np.abs(vg[..., 1]).sum() > 0, "Q channel empty"
    assert np.abs(vg[..., 2]).sum() > 0, "U channel empty"
    # the Stokes observer spectra accumulate through the same ray trace
    vs = sim._vspec_total
    assert vs[..., 0].sum() > 0, "no vspec contributions accumulated"
    sim.finish()
    assert os.path.exists(os.path.join(d, "vpkt_grid.out"))


def test_thick2_blocks_vpkts_but_not_rpkts(tmp_path):
    """Cells whose grey depth exceeds the vpkt-only threshold get thick=2
    (update_grid.cc:1027-1035): virtual packets die there (vpkt.cc:362-365)
    while real r-packets transport with full detailed physics."""
    import dataclasses as _dc
    from artis_tpu.driver import Simulation
    from artis_tpu.synthdata import make_run
    from artis_tpu.transport import engine as engine_mod

    make_run(str(tmp_path), ncells=4, ntimesteps=4, tmax_days=2.0, ngreyts=0)
    # override_thickcell=1 with a tiny threshold: every cell with any grey
    # depth becomes vpkt-thick while never grey (ngreyts=0)
    (tmp_path / "vpkt.txt").write_text(
        "1\n0.0\n0.0\n0\n1 0.01 3.0\n0\n1 1e-6\n8.0\n0\n")
    opts = kilonova_lte(
        npkts=128, grid_type=GridType.SPHERICAL1D, mintemp=1000.0,
        maxtemp=20000.0, tablesize=12, vpkt_on=True, vpkt_nobs=1,
        vpkt_vmnubins=100, vpkt_vmtbins=8,
    )
    sim = Simulation(str(tmp_path), opts, datadir="/root/reference/data")
    assert sim.vpkt_cfg.thick_vpkt == pytest.approx(1e-6)
    ctx = sim.update_grid(0)
    thick = np.asarray(sim.cells.thick)
    assert (thick == 2).any()
    assert not (thick == 1).any()

    # a vpkt emitted inside a thick=2 cell is killed before contributing;
    # all other opacity is zeroed so the kill is attributable to the flag
    cfg = sim.vpkt_cfg
    ctx0 = _dc.replace(
        ctx,
        chi_ff_nnionpart=jnp.zeros_like(ctx.chi_ff_nnionpart),
        bf_a=jnp.zeros_like(ctx.bf_a),
        vpkt_cum_tau=jnp.zeros_like(ctx.vpkt_cum_tau),
        vpkt_cum_taunu=jnp.zeros_like(ctx.vpkt_cum_taunu),
    )
    n = 4
    pos = jnp.tile(jnp.asarray([[1e13, 0.0, 0.0]]), (n, 1))
    dirv = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    t = jnp.full(n, float(sim.ts.mid[1]))
    args = (pos, dirv, t, jnp.zeros(n, jnp.int32), jnp.full(n, 5e14),
            jnp.ones(n), jnp.zeros((n, 2)), jnp.zeros(n, bool),
            jnp.ones(n, bool))
    nne0 = jnp.zeros_like(sim.cells.nne)
    vspec2, _ = vpkt.trace_vpkts(
        cfg, vpkt.zero_vspectra(cfg, jnp.float64), sim.dad, sim.grid,
        sim.cells.replace(nne=nne0), ctx0,
        ctx0.vpkt_cum_tau, ctx0.vpkt_cum_taunu, *args, opacity_case=4)
    assert np.asarray(vspec2)[..., 0].sum() == 0.0
    cells0 = sim.cells.replace(
        thick=jnp.zeros_like(sim.cells.thick), nne=nne0)
    vspec0, _ = vpkt.trace_vpkts(
        cfg, vpkt.zero_vspectra(cfg, jnp.float64), sim.dad, sim.grid,
        cells0, ctx0, ctx0.vpkt_cum_tau, ctx0.vpkt_cum_taunu, *args,
        opacity_case=4)
    assert np.asarray(vspec0)[..., 0].sum() > 0.0

    # r-packet transport in thick=2 cells is bitwise identical to thick=0:
    # the flag must not engage the grey path
    p = sim.params
    key = jax.random.PRNGKey(7)

    def run(cells):
        st, est, _, _ = engine_mod.transport_timestep(
            key, sim.state, sim.est, sim.grid, sim.dad, sim.aux, sim.rc,
            sim.rates, cells, ctx, opts,
            gamma_kappagrey=float(p.gamma_kappagrey),
            opacity_case=int(p.opacity_case),
            kpktdiffusion_timescale=float(p.kpktdiffusion_timescale),
            apply_kpkt_diffusion=True, max_iters=24,
        )
        return st, est

    st2, est2 = run(sim.cells)
    st0, est0 = run(sim.cells.replace(thick=jnp.zeros_like(sim.cells.thick)))
    np.testing.assert_array_equal(np.asarray(st2.pos), np.asarray(st0.pos))
    np.testing.assert_array_equal(np.asarray(st2.nu_rf), np.asarray(st0.nu_rf))
    np.testing.assert_array_equal(np.asarray(est2.j), np.asarray(est0.j))
