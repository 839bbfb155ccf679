"""Detailed line J_b_lu estimators (reference: radfield.cc:57-68, 761-771;
rpkt.cc:151-167; macroatom.cc:713-720)."""

import numpy as np
import pytest
import jax.numpy as jnp

from make_run import make_run


def test_transport_accumulates_jblue(tmp_path):
    """Packets sweeping through selected lines must feed the J_b_lu raw
    estimators during transport."""
    d = str(tmp_path)
    make_run(d, ncells=6, ntimesteps=3, tmax_days=2.0, ngreyts=0)
    from artis_tpu.driver import Simulation
    from artis_tpu.options import GridType, kilonova_lte

    opts = kilonova_lte(
        npkts=512, grid_type=GridType.SPHERICAL1D, mintemp=1000.0,
        maxtemp=20000.0, tablesize=20, linewalk_chunk=64,
        detailed_line_estimators_on=True, jblue_elem_z=0,
        jblue_max_lowerlevel=15,
    )
    sim = Simulation(d, opts, datadir="/root/reference/data")
    assert sim._njblue > 1, "selection picked no lines"
    for ts in range(2):
        sim.do_timestep(ts)
    raw = np.asarray(sim.prev_est.jblue_raw)
    cnt = np.asarray(sim.prev_est.jblue_count)
    assert raw.shape == (sim.grid.nonempty_npts, sim._njblue)
    assert np.all(np.isfinite(raw)) and np.all(raw >= 0)
    assert cnt.sum() > 0, "no line sweeps recorded"
    assert raw.sum() > 0


def test_nlte_solver_consistent_when_jblue_equals_dbb():
    """Feeding J_b_lu == dilute-blackbody J_nu for every line must reproduce
    the default solution exactly — the detailed path only swaps the J source."""
    from artis_tpu import atomic
    from artis_tpu.io import atomicdata
    from artis_tpu.options import kilonova_lte
    from artis_tpu.plasma import cellstate, ltepop, nltepop, ratecoeff
    from artis_tpu.plasma.radfield import dbb
    from artis_tpu.synthdata import write_synthetic_atomicdata
    import tempfile

    folder = tempfile.mkdtemp()
    write_synthetic_atomicdata(folder, elements=((26, 3),), nlevels_per_ion=6)
    ad = atomicdata.read_atomicdata(folder, nlevels_requiretransitions=lambda z, s: 0)
    dad = atomic.to_device(ad)
    opts = kilonova_lte(mintemp=1000.0, maxtemp=30000.0, tablesize=40)
    rc = ratecoeff.build_tables(dad, opts.tablesize, opts.mintemp, opts.maxtemp)
    indices = nltepop.build_indices(dad, opts)

    ncells = 3
    temps = np.array([6000.0, 9000.0, 14000.0])
    cells = cellstate.init_cellstate(
        dad, ncells, np.full(ncells, 1e-13), np.ones(ncells), opts.mintemp, opts.maxtemp
    )
    cells = cells.replace(
        Te=jnp.asarray(temps), TR=jnp.asarray(temps), TJ=jnp.asarray(temps),
        W=jnp.full(ncells, 0.3), elem_massfrac=jnp.ones((ncells, 1)),
    )
    cells = ltepop.calculate_ion_balance_nne(dad, cells, opts)
    lte_pops = ltepop.calculate_levelpops(dad, cells, opts)

    _, pops_default = nltepop.solve_all_elements(
        indices, dad, rc, cells, opts, lte_pops, t_mid=5.0 * 86400.0
    )

    # every line detailed, J_b_lu set to the dbb value the default path uses
    nlines = dad.nlines
    jblue_of_line = jnp.arange(nlines, dtype=jnp.int32)
    jb_arr = dbb(
        dad.line_nu[None, :], jnp.maximum(cells.TR, 1.0)[:, None], cells.W[:, None]
    )
    _, pops_jblue = nltepop.solve_all_elements(
        indices, dad, rc, cells, opts, lte_pops, t_mid=5.0 * 86400.0,
        jblue_normed=(jblue_of_line, jb_arr),
    )
    np.testing.assert_allclose(
        np.asarray(pops_jblue), np.asarray(pops_default), rtol=1e-10
    )
