"""Checkpoint/resume: an interrupted + resumed run must match an
uninterrupted one bit-for-bit (the reference CI's restart test,
ci.yml:140-145, weakened there to md5 on a reproducible build; here the
deterministic RNG makes bit-exactness achievable and enforced)."""

import dataclasses

import numpy as np
import pytest

from make_run import make_run


def _opts():
    from artis_tpu.options import GridType, kilonova_lte

    return kilonova_lte(
        npkts=512, grid_type=GridType.SPHERICAL1D, mintemp=1000.0,
        maxtemp=20000.0, tablesize=20, linewalk_chunk=64,
    )


@pytest.fixture(scope="module")
def straight_and_resumed(tmp_path_factory):
    from artis_tpu.driver import Simulation

    d1 = str(tmp_path_factory.mktemp("ckpt_straight"))
    d2 = str(tmp_path_factory.mktemp("ckpt_resumed"))
    make_run(d1, ncells=6, ntimesteps=3, tmax_days=2.0, ngreyts=1)
    make_run(d2, ncells=6, ntimesteps=3, tmax_days=2.0, ngreyts=1)

    # uninterrupted run: all 3 timesteps in one process
    sim_a = Simulation(d1, _opts(), datadir="/root/reference/data")
    for ts in range(3):
        sim_a.do_timestep(ts)

    # interrupted run: 2 timesteps, checkpoint, then a NEW Simulation resumes
    sim_b1 = Simulation(d2, _opts(), datadir="/root/reference/data")
    for ts in range(2):
        sim_b1.do_timestep(ts)
    sim_b1.save_checkpoint(2)
    del sim_b1

    sim_b2 = Simulation(d2, _opts(), datadir="/root/reference/data")
    assert sim_b2.params.simulation_continued_from_saved
    assert sim_b2.params.timestep_start == 2
    sim_b2.do_timestep(2)
    return sim_a, sim_b2


def test_resumed_packets_bitwise_identical(straight_and_resumed):
    a, b = straight_and_resumed
    for f in dataclasses.fields(a.state):
        np.testing.assert_array_equal(
            np.asarray(getattr(a.state, f.name)),
            np.asarray(getattr(b.state, f.name)),
            err_msg=f"packet field {f.name}",
        )


def test_resumed_cells_bitwise_identical(straight_and_resumed):
    a, b = straight_and_resumed
    for f in dataclasses.fields(a.cells):
        np.testing.assert_array_equal(
            np.asarray(getattr(a.cells, f.name)),
            np.asarray(getattr(b.cells, f.name)),
            err_msg=f"cell field {f.name}",
        )


def test_resumed_estimators_bitwise_identical(straight_and_resumed):
    a, b = straight_and_resumed
    for f in dataclasses.fields(a.est):
        np.testing.assert_array_equal(
            np.asarray(getattr(a.est, f.name)),
            np.asarray(getattr(b.est, f.name)),
            err_msg=f"estimator {f.name}",
        )


def test_resumed_lightcurve_identical(straight_and_resumed):
    a, b = straight_and_resumed
    np.testing.assert_array_equal(a.lc_lum, b.lc_lum)
    np.testing.assert_array_equal(a.spec.flux, b.spec.flux)
    np.testing.assert_array_equal(a.gamma_dep_ts, b.gamma_dep_ts)
    for k in a.dep_ts:
        np.testing.assert_array_equal(a.dep_ts[k], b.dep_ts[k], err_msg=k)
