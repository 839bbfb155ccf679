"""End-to-end simulation test on a miniature Ni56-powered 1D model.

The correctness bar (SURVEY.md section 4): physically sane outputs rather than
golden checksums — energy accounting, monotone behaviours, file formats.
"""

import os

import numpy as np
import pytest

from make_run import make_run


@pytest.fixture(scope="module")
def simrun(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("e2e"))
    make_run(d, ncells=6, ntimesteps=4, tmax_days=2.0, ngreyts=2)
    from artis_tpu.driver import Simulation
    from artis_tpu.options import GridType, kilonova_lte

    opts = kilonova_lte(
        npkts=800, grid_type=GridType.SPHERICAL1D, mintemp=1000.0,
        maxtemp=20000.0, tablesize=20, linewalk_chunk=64,
    )
    sim = Simulation(d, opts, datadir="/root/reference/data")
    sim.run()
    return d, sim, opts


def test_packets_conserved_and_typed(simrun):
    d, sim, opts = simrun
    import artis_tpu.packets as pk

    types = np.asarray(sim.state.ptype)
    assert len(types) == opts.npkts
    allowed = {pk.TYPE_ESCAPE, pk.TYPE_RADIOACTIVE_PELLET, pk.TYPE_GAMMA, pk.TYPE_RPKT,
               pk.TYPE_KPKT}
    assert set(np.unique(types)).issubset(allowed)
    # remaining pellets must decay after the last SIMULATED timestep
    # (timestep_finish is exclusive, reference: sn3d.cc:879)
    pellets = types == pk.TYPE_RADIOACTIVE_PELLET
    t_end = float(sim.ts.start[sim.params.timestep_finish])
    assert np.all(np.asarray(sim.state.tdecay)[pellets] > t_end)


def test_energy_conservation(simrun):
    """e_cmf is conserved or degraded by expansion; total energy budget sane."""
    d, sim, opts = simrun
    e_cmf = np.asarray(sim.state.e_cmf)
    assert np.all(np.isfinite(e_cmf))
    assert np.all(e_cmf >= 0)
    # total packet energy should be within the initial budget (expansion losses
    # only reduce cmf energy; rf energy can differ)
    assert e_cmf.sum() * sim.pellet_tables.e0 <= sim.pellet_tables.norm * 1.05


def test_lightcurve_positive_and_outputs_written(simrun):
    d, sim, opts = simrun
    assert sim.lc_lum.max() > 0
    assert os.path.exists(os.path.join(d, "light_curve.out"))
    assert os.path.exists(os.path.join(d, "spec.out"))
    assert os.path.exists(os.path.join(d, "packets00_0000.out"))
    lc = np.loadtxt(os.path.join(d, "light_curve.out"))
    assert lc.shape[1] == 3
    spec = np.loadtxt(os.path.join(d, "spec.out"))
    assert spec.shape == (1001, sim.params.ntimesteps + 1)


def test_gamma_deposition_declines(simrun):
    """Gamma deposition should decline as the ejecta thins (fixed Ni56 decay)."""
    d, sim, opts = simrun
    dep = sim.gamma_dep_ts[: sim.params.timestep_finish]
    assert dep[0] > 0
    assert dep[-1] < dep[0]


def test_exspec_runs(simrun):
    d, sim, opts = simrun
    from artis_tpu.exspec import run_exspec

    run_exspec(d, opts.replace(pol_on=True))
    assert os.path.exists(os.path.join(d, "gamma_spec.out"))
    assert os.path.exists(os.path.join(d, "gamma_light_curve.out"))
    glc = np.loadtxt(os.path.join(d, "gamma_light_curve.out"))
    assert glc[:, 1].max() > 0  # gamma packets escaped


def test_exspec_emission_absorption_breakdown(simrun):
    """The per-process emission columns must sum to the total spectrum
    (every escaped r-packet carries an emission type); absorption is
    non-negative; Stokes-I specpol equals spec
    (reference: spectrum_lightcurve.cc:186-303, 345-478)."""
    d, sim, opts = simrun
    from artis_tpu.exspec import run_exspec

    run_exspec(d, opts.replace(pol_on=True))
    spec = np.loadtxt(os.path.join(d, "spec.out"))
    nts = spec.shape[1] - 1
    flux = spec[1:, 1:]
    em = np.loadtxt(os.path.join(d, "emission.out")).reshape(1000, nts, -1)
    assert em.shape[2] % 2 == 1  # 2*nelements*max_nions + 1
    # packets with an unset emission type are skipped in the breakdown, so
    # the column sum is bounded by (and nearly equal to) the total flux
    # (reference: spectrum_lightcurve.cc:228-231 'if (nproc >= 0)')
    for arr_name in ("emission.out", "emissiontrue.out"):
        arr = np.loadtxt(os.path.join(d, arr_name)).reshape(1000, nts, -1)
        s_ = arr.sum(axis=2)
        assert np.all(s_ <= flux * (1 + 1e-5) + 1e-30), arr_name
        assert s_.sum() >= 0.95 * flux.sum(), arr_name
    ab = np.loadtxt(os.path.join(d, "absorption.out"))
    assert ab.min() >= 0.0
    sp = np.loadtxt(os.path.join(d, "specpol.out"))
    assert sp.shape[1] == 1 + 3 * nts
    np.testing.assert_allclose(sp[1:, 1:1 + nts], flux, rtol=1e-5, atol=1e-30)


def test_estimators_sane(simrun):
    d, sim, opts = simrun
    j = np.asarray(sim.prev_est.j)
    assert np.all(np.isfinite(j))
    assert j.sum() > 0  # radiation field was sampled
    te = np.asarray(sim.cells.Te)
    assert np.all((te >= opts.mintemp) & (te <= opts.maxtemp))
    nne = np.asarray(sim.cells.nne)
    assert np.all(nne > 0)


@pytest.mark.slow
def test_ion_stats_tracking(tmp_path):
    """TRACK_ION_STATS equivalent: per-ion-per-cell energy statistics
    (reference: stats.h:12-44) accumulate during transport, balance the
    macro-atom energy flows, and appear in the estimator files."""
    import numpy as np
    from make_run import make_run
    from artis_tpu.driver import Simulation
    from artis_tpu.options import GridType, kilonova_lte
    from artis_tpu import stats

    d = str(tmp_path)
    make_run(d, ncells=6, ntimesteps=4, tmax_days=2.0, ngreyts=0)
    opts = kilonova_lte(
        npkts=512, grid_type=GridType.SPHERICAL1D, mintemp=1000.0,
        maxtemp=20000.0, tablesize=20, linewalk_chunk=64,
        track_ion_stats=True,
    )
    sim = Simulation(d, opts, datadir="/root/reference/data")
    for ts in range(3):
        sim.do_timestep(ts)
    ist = np.asarray(sim.prev_est.ion_stats)
    assert ist.shape == (sim.grid.nonempty_npts, sim.ad.nions_total,
                         stats.N_ION_STATS)
    assert np.all(np.isfinite(ist)) and np.all(ist >= 0)
    # macro-atom activations happened and energy-in is accounted per ion
    e_in = ist[:, :, stats.ION_MACROATOM_ENERGYIN_TOTAL].sum()
    e_out = ist[:, :, stats.ION_MACROATOM_ENERGYOUT_TOTAL].sum()
    if e_in > 0:
        # every resolved macro atom deactivates radiatively or collisionally;
        # only jump-capped stragglers can carry energy across the boundary
        assert e_out <= e_in * 1.0000001
        assert e_out >= 0.5 * e_in
    # the per-ion lines appear in the estimator file
    txt = open(f"{d}/estimators_0002.out").read()
    if e_in > 0:
        assert "ionstats Z" in txt
