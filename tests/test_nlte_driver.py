"""End-to-end NLTE mode: the driver's outer iteration couples the thermal
balance, statistical-equilibrium populations and nne per grid update
(reference: update_grid.cc:670-763 solve_Te_nltepops)."""

import numpy as np
import pytest

from artis_tpu.driver import Simulation
from artis_tpu.options import GridType, kilonova_lte
from artis_tpu.synthdata import make_run


@pytest.mark.slow
def test_nlte_mode_end_to_end(tmp_path):
    make_run(str(tmp_path), ncells=6, ntimesteps=5, tmax_days=2.5, ngreyts=1,
             num_lte_timesteps=1)
    opts = kilonova_lte(
        npkts=256, grid_type=GridType.SPHERICAL1D, mintemp=1000.0,
        maxtemp=20000.0, tablesize=16, nlte_enabled=True, nlte_outer_iters=2,
    )
    sim = Simulation(str(tmp_path), opts, datadir="/root/reference/data")
    assert sim.nlte_indices is not None and len(sim.nlte_indices) == 3
    for nts in range(4):
        sim.do_timestep(nts)
    te = np.asarray(sim.cells.Te)
    nne = np.asarray(sim.cells.nne)
    w = np.asarray(sim.cells.W)
    assert np.all(np.isfinite(te)) and np.all(te >= 1000.0) and np.all(te <= 20000.0)
    assert np.all(nne > 0)
    # dilution factor drops outward through the ejecta
    assert w[0] > w[-1]
    # NLTE ground-state populations stay positive and ionisation is partial
    gp = np.asarray(sim.cells.ion_groundlevelpops)
    assert np.all(gp >= 0)
    assert np.any(gp > 0)
