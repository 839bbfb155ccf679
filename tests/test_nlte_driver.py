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


@pytest.mark.slow
def test_nlte_outer_loop_converges(tmp_path):
    """The outer [SF -> T_e -> pops -> nne] iteration runs to the 4%
    convergence tolerance, not a fixed pass count (update_grid.cc:685-763):
    raising the NLTEITER cap must leave the converged nne/ion state
    (essentially) unchanged, and the driver must log the max fracdiff."""
    make_run(str(tmp_path), ncells=5, ntimesteps=4, tmax_days=2.5, ngreyts=0,
             num_lte_timesteps=1)

    def run(cap):
        opts = kilonova_lte(
            npkts=192, grid_type=GridType.SPHERICAL1D, mintemp=1000.0,
            maxtemp=20000.0, tablesize=16, nlte_enabled=True,
            nlte_outer_iters=cap,
        )
        sim = Simulation(str(tmp_path), opts, datadir="/root/reference/data")
        for nts in range(3):
            sim.do_timestep(nts)
        return sim

    sim30 = run(30)
    sim60 = run(60)
    nne30 = np.asarray(sim30.cells.nne)
    nne60 = np.asarray(sim60.cells.nne)
    gp30 = np.asarray(sim30.cells.ion_groundlevelpops)
    gp60 = np.asarray(sim60.cells.ion_groundlevelpops)
    # converged state is insensitive to the cap: any residual drift is far
    # below the 4% convergence tolerance
    np.testing.assert_allclose(nne60, nne30, rtol=1e-3)
    np.testing.assert_allclose(
        gp60, gp30, rtol=5e-3, atol=1e-12 * gp30.max())
    # the per-timestep max-fracdiff is logged
    log = (tmp_path / "output_0-0.txt").read_text() if \
        (tmp_path / "output_0-0.txt").exists() else ""
    import glob as _glob
    if "NLTE outer loop max fracdiff" not in log:
        logs = "".join(open(f).read()
                       for f in _glob.glob(str(tmp_path / "*.txt")))
        assert "NLTE outer loop max fracdiff" in logs
