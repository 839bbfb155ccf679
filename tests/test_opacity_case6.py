"""opacity_case 6: the Just+2022 grey kappa — an analytic function of the
lanthanide mass fraction and T_R, recomputed every timestep
(reference: grid.cc:1790-1820; per-timestep recompute update_grid.cc:885-887).
"""

import jax.numpy as jnp
import numpy as np

from artis_tpu.driver import Simulation, _kappagrey_just2022
from artis_tpu.options import GridType, kilonova_lte
from artis_tpu.synthdata import make_run


def test_just2022_kappa_values():
    """All four X_lan regimes and the T_R < 2000 K suppression
    (grid.cc:1802-1816)."""
    tr_hot = np.full(5, 5000.0)
    x = np.array([0.0, 5e-8, 1e-4, 1e-2, 0.5])
    k = _kappagrey_just2022(x, tr_hot)
    np.testing.assert_allclose(k[0], 0.2)
    np.testing.assert_allclose(k[1], 0.2)  # X_lan < 1e-7
    np.testing.assert_allclose(k[2], 3.0 * (1e-4 / 1e-3) ** 0.3)
    np.testing.assert_allclose(k[3], 3.0 * (1e-2 / 1e-3) ** 0.5)
    np.testing.assert_allclose(k[4], 30.0 * (0.5 / 1e-1) ** 0.1)
    # regime boundaries are continuous up to the fit's intent
    np.testing.assert_allclose(
        _kappagrey_just2022([1e-3], [3000.0]), [3.0])
    # temperature suppression below 2000 K: kappa *= (T_R/2000)^5
    k_cold = _kappagrey_just2022(x, np.full(5, 1500.0))
    np.testing.assert_allclose(k_cold, k * (1500.0 / 2000.0) ** 5)


def test_case6_recomputed_per_timestep(tmp_path):
    """update_grid must recompute kappagrey from the CURRENT abundances and
    the previous fit's T_R at every timestep (update_grid.cc:885-887) — not
    hold the t=tmin value."""
    d = str(tmp_path)
    make_run(d, ncells=6, ntimesteps=5, tmax_days=2.5, ngreyts=2,
             opacity_case=6)
    opts = kilonova_lte(
        npkts=256, grid_type=GridType.SPHERICAL1D, mintemp=1000.0,
        maxtemp=20000.0, tablesize=16,
    )
    sim = Simulation(d, opts, datadir="/root/reference/data")
    assert int(sim.params.opacity_case) == 6

    # synthetic scenes have no lanthanides: X_lan == 0 exactly
    for nts in range(2):
        tr_before = np.asarray(sim.cells.TR).copy()
        sim.do_timestep(nts)
        expect = _kappagrey_just2022(np.zeros_like(tr_before), tr_before)
        np.testing.assert_allclose(
            np.asarray(sim._kappagrey_np), expect, rtol=1e-6)

    # force the T_R < 2000 K branch and confirm the next grid update responds
    tr_cold = np.full(sim.grid.nonempty_npts, 1500.0)
    sim.cells = sim.cells.replace(
        TR=jnp.asarray(tr_cold, sim.cells.TR.dtype))
    sim.update_grid(2)
    expect_cold = _kappagrey_just2022(np.zeros_like(tr_cold), tr_cold)
    np.testing.assert_allclose(
        np.asarray(sim._kappagrey_np), expect_cold, rtol=1e-6)
    assert np.all(np.asarray(sim._kappagrey_np) < 0.2)
