"""Bitwise reproducibility of a full simulation run.

The reference is only reproducible in single-threaded MPI builds with
REPRODUCIBLE=ON (Makefile:17-25); threading breaks it. Our counter-based
threefry RNG makes the whole run deterministic by construction — this test
enforces that contract: two Simulations with the same seed and inputs must
produce bit-identical packet state and estimators.
"""

import numpy as np
import pytest

from make_run import make_run


def _run(d):
    from artis_tpu.driver import Simulation
    from artis_tpu.options import GridType, kilonova_lte

    opts = kilonova_lte(
        npkts=512, grid_type=GridType.SPHERICAL1D, mintemp=1000.0,
        maxtemp=20000.0, tablesize=20, linewalk_chunk=64,
    )
    sim = Simulation(d, opts, datadir="/root/reference/data")
    for ts in range(sim.params.timestep_start, sim.params.timestep_finish):
        sim.do_timestep(ts)
    return sim


@pytest.fixture(scope="module")
def two_runs(tmp_path_factory):
    d1 = str(tmp_path_factory.mktemp("det1"))
    d2 = str(tmp_path_factory.mktemp("det2"))
    make_run(d1, ncells=6, ntimesteps=3, tmax_days=2.0, ngreyts=1)
    make_run(d2, ncells=6, ntimesteps=3, tmax_days=2.0, ngreyts=1)
    return _run(d1), _run(d2)


def test_packet_state_bitwise_identical(two_runs):
    a, b = two_runs
    import dataclasses

    for f in dataclasses.fields(a.state):
        va = np.asarray(getattr(a.state, f.name))
        vb = np.asarray(getattr(b.state, f.name))
        np.testing.assert_array_equal(va, vb, err_msg=f"packet field {f.name}")


def test_estimators_bitwise_identical(two_runs):
    a, b = two_runs
    import dataclasses

    for f in dataclasses.fields(a.est):
        va = np.asarray(getattr(a.est, f.name))
        vb = np.asarray(getattr(b.est, f.name))
        np.testing.assert_array_equal(va, vb, err_msg=f"estimator {f.name}")


def test_cell_state_bitwise_identical(two_runs):
    a, b = two_runs
    np.testing.assert_array_equal(np.asarray(a.cells.Te), np.asarray(b.cells.Te))
    np.testing.assert_array_equal(np.asarray(a.cells.TR), np.asarray(b.cells.TR))
    np.testing.assert_array_equal(np.asarray(a.cells.W), np.asarray(b.cells.W))
    np.testing.assert_array_equal(np.asarray(a.cells.nne), np.asarray(b.cells.nne))
