"""Recombination-rate calibration from recombrates.txt
(reference: ratecoeff.cc:513-653 read_recombrate_file)."""

import numpy as np
import pytest

from make_run import make_run


def _write_recombrates(d, z, upperionstage, rrc_low_n, rrc_total):
    with open(f"{d}/recombrates.txt", "w") as f:
        f.write(f"{z} {upperionstage} 2\n")
        f.write(f"3.5 {rrc_low_n:g} {rrc_total:g}\n")
        f.write(f"4.0 {rrc_low_n:g} {rrc_total:g}\n")


def test_total_rrc_scaling(tmp_path):
    from artis_tpu.io import atomicdata
    from artis_tpu.plasma import recombcalibration as rcal

    d = str(tmp_path)
    make_run(d, ncells=4, ntimesteps=2, tmax_days=1.0, ngreyts=0)
    ad = atomicdata.read_atomicdata(d)

    element = ad.get_elementindex(26)
    rrc0 = rcal._ion_rrc(ad, element, 0, 6000.0)
    assert rrc0 > 0

    # low_n disabled (-1); total asks for 1.5x the current coefficient
    _write_recombrates(d, 26, 2, -1.0, 1.5 * rrc0)
    applied = rcal.apply_recombrate_calibration(ad, d, t_elec=6000.0,
                                                log=lambda *_: None)
    assert applied
    rrc1 = rcal._ion_rrc(ad, element, 0, 6000.0)
    # alpha_sp is linear in the cross sections, so the match is exact
    assert rrc1 == pytest.approx(1.5 * rrc0, rel=1e-10)


def test_low_n_clamp_skips_extreme_multipliers(tmp_path):
    from artis_tpu.io import atomicdata
    from artis_tpu.plasma import recombcalibration as rcal

    d = str(tmp_path)
    make_run(d, ncells=4, ntimesteps=2, tmax_days=1.0, ngreyts=0)
    ad = atomicdata.read_atomicdata(d)
    element = ad.get_elementindex(26)
    rrc0 = rcal._ion_rrc(ad, element, 0, 6000.0)

    # low_n demands a 100x scale -> outside [0.05, 2): must be skipped;
    # the total step then scales to 1.2x
    _write_recombrates(d, 26, 2, 100.0 * rrc0, 1.2 * rrc0)
    rcal.apply_recombrate_calibration(ad, d, t_elec=6000.0,
                                      log=lambda *_: None)
    rrc1 = rcal._ion_rrc(ad, element, 0, 6000.0)
    assert rrc1 == pytest.approx(1.2 * rrc0, rel=1e-10)


def test_simulation_applies_calibration(tmp_path):
    from artis_tpu.io import atomicdata
    from artis_tpu.plasma import recombcalibration as rcal
    from artis_tpu.driver import Simulation
    from artis_tpu.options import GridType, kilonova_lte

    d = str(tmp_path)
    make_run(d, ncells=4, ntimesteps=2, tmax_days=1.0, ngreyts=0)
    ad0 = atomicdata.read_atomicdata(d)
    element = ad0.get_elementindex(26)
    rrc0 = rcal._ion_rrc(ad0, element, 0, 6000.0)
    _write_recombrates(d, 26, 2, -1.0, 1.5 * rrc0)

    opts = kilonova_lte(npkts=64, grid_type=GridType.SPHERICAL1D,
                        mintemp=1000.0, maxtemp=20000.0, tablesize=8)
    sim = Simulation(d, opts, datadir="/root/reference/data")
    rrc1 = rcal._ion_rrc(sim.ad, element, 0, 6000.0)
    assert rrc1 == pytest.approx(1.5 * rrc0, rel=1e-9)
    sim.do_timestep(0)
    assert np.all(np.isfinite(np.asarray(sim.cells.Te)))
