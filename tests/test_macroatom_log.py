"""Opt-in per-interaction macro-atom log (reference: LOG_MACROATOM,
macroatom.cc:35, 413-421, 630-641 -> macroatom_%.4d.out)."""

import os

import numpy as np

from make_run import make_run
from artis_tpu.driver import Simulation
from artis_tpu.options import GridType, kilonova_lte


def test_macroatom_log_rows(tmp_path):
    d = str(tmp_path)
    make_run(d, ncells=6, ntimesteps=4, tmax_days=2.0, ngreyts=0)
    opts = kilonova_lte(
        npkts=384, grid_type=GridType.SPHERICAL1D, mintemp=1000.0,
        maxtemp=20000.0, tablesize=12, linewalk_chunk=64,
        log_macroatom=True, log_macroatom_capacity=4096,
    )
    sim = Simulation(d, opts, datadir="/root/reference/data")
    for nts in range(3):
        sim.do_timestep(nts)

    path = os.path.join(d, "macroatom_0-0.out")
    assert os.path.exists(path)
    with open(path) as f:
        header = f.readline().split()
        rows = [line.split() for line in f if line.strip()]
    assert header[:3] == ["timestep", "modelgridindex", "Z"]
    assert len(rows) > 0, "no bb deactivations logged in 3 timesteps"

    nlines = sim.ad.nlines
    line_nu = np.asarray(sim.dad.line_nu)
    ncells = sim.grid.nonempty_npts
    zs = set(int(z) for z in np.asarray(sim.dad.elem_z))
    for r in rows:
        nts, mgi, z = int(r[0]), int(r[1]), int(r[2])
        ion_in, ion_out = int(r[3]), int(r[4])
        lvl_in, lvl_out, actline = int(r[5]), int(r[6]), int(r[7])
        nu_cmf_out = float(r[9])
        assert 0 <= nts < 3
        assert 0 <= mgi < ncells
        assert z in zs
        assert ion_in >= 1 and ion_out >= 1
        assert lvl_in >= 0 and lvl_out >= 0
        assert 0 <= actline < nlines
        # the emitted comoving frequency is the emitting line's frequency
        np.testing.assert_allclose(nu_cmf_out, line_nu[actline], rtol=2e-5)
        # bb deactivation emits downward within the ion: the photon energy
        # must not exceed the activating level's excitation reach
        assert lvl_out < lvl_in or ion_out <= ion_in

    # the counted total matches the MA_STAT_DEACTIVATION_BB counter summed
    # over timesteps is not retained per-timestep here; at minimum the last
    # timestep's buffer count equals its written row count
    n_last = sum(1 for r in rows if int(r[0]) == 2)
    assert n_last == min(int(sim.est.malog_n), 4096)
