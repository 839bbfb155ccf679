"""Runtime substrate: pid lockfile + checkpoint write verification."""
import os
import numpy as np
import pytest

from make_run import make_run


def test_lockfile_blocks_second_driver(tmp_path):
    from artis_tpu.driver import Simulation
    from artis_tpu.options import GridType, kilonova_lte

    d = str(tmp_path)
    make_run(d, ncells=4, ntimesteps=2, tmax_days=1.0, ngreyts=0)
    opts = kilonova_lte(npkts=64, grid_type=GridType.SPHERICAL1D,
                        mintemp=1000.0, maxtemp=20000.0, tablesize=8)
    sim = Simulation(d, opts, datadir="/root/reference/data", lockfile=True)
    assert os.path.exists(os.path.join(d, "artis.pid"))
    with pytest.raises(RuntimeError, match="already"):
        Simulation(d, opts, datadir="/root/reference/data", lockfile=True)
    sim._release_lockfile()
    assert not os.path.exists(os.path.join(d, "artis.pid"))
    # a stale lockfile (dead pid) is taken over, not fatal
    with open(os.path.join(d, "artis.pid"), "w") as f:
        f.write("999999999\n")
    sim2 = Simulation(d, opts, datadir="/root/reference/data", lockfile=True)
    assert int(open(os.path.join(d, "artis.pid")).read()) == os.getpid()
    sim2._release_lockfile()
