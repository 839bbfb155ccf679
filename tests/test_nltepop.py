"""NLTE population solver tests (reference: nltepop.cc:750-1058).

The key physics check: in an undiluted blackbody radiation field with
W = 1 and T_R = T_e, every rate pair in the statistical-equilibrium matrix is
in detailed balance, so the NLTE solution must reproduce the LTE
(Boltzmann/Saha) populations.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from artis_tpu import atomic
from artis_tpu.io import atomicdata
from artis_tpu.options import kilonova_lte
from artis_tpu.plasma import cellstate, ltepop, nltepop, ratecoeff
from artis_tpu.synthdata import write_synthetic_atomicdata


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    folder = tmp_path_factory.mktemp("atomic_nlte")
    write_synthetic_atomicdata(folder, elements=((26, 3),), nlevels_per_ion=6)
    ad = atomicdata.read_atomicdata(str(folder), nlevels_requiretransitions=lambda z, s: 0)
    dad = atomic.to_device(ad)
    opts = kilonova_lte(mintemp=1000.0, maxtemp=30000.0, tablesize=40)
    rc = ratecoeff.build_tables(dad, opts.tablesize, opts.mintemp, opts.maxtemp)
    indices = nltepop.build_indices(dad)

    ncells = 4
    temps = np.array([5000.0, 8000.0, 12000.0, 16000.0])
    cells = cellstate.init_cellstate(
        dad, ncells, np.full(ncells, 1e-13), np.ones(ncells), opts.mintemp, opts.maxtemp
    )
    cells = cells.replace(
        Te=jnp.asarray(temps), TR=jnp.asarray(temps), TJ=jnp.asarray(temps),
        W=jnp.ones(ncells), elem_massfrac=jnp.ones((ncells, 1)),
    )
    cells = ltepop.calculate_ion_balance_nne(dad, cells, opts)
    return dad, rc, indices, opts, cells, temps


def test_detailed_balance_reproduces_lte(setup):
    dad, rc, indices, opts, cells, temps = setup
    lte_pops = ltepop.calculate_levelpops(dad, cells, opts)
    out_cells, nlte_pops = nltepop.solve_all_elements(
        indices, dad, rc, cells, opts, lte_pops, t_mid=5.0 * 86400.0
    )
    lte = np.asarray(lte_pops)
    nlte = np.asarray(nlte_pops)
    # compare populated levels (ignore MINPOP-floored ones)
    mask = lte > 1e-20
    ratio = nlte[mask] / lte[mask]
    # rate tables use fixed-grid Simpson integration + T interpolation;
    # detailed balance should hold to a few percent
    assert np.all(np.isfinite(ratio))
    # tolerance bounded by the fixed-grid Simpson rate integrals and the
    # TABLESIZE log-T interpolation of the recombination LUTs on the
    # synthetic atomic dataset
    assert np.quantile(np.abs(np.log(ratio)), 0.95) < 0.12, (
        f"departure coefficients deviate: {np.quantile(ratio, [0.01, 0.5, 0.99])}"
    )
    # element population conserved per cell
    np.testing.assert_allclose(
        nlte.sum(axis=1), np.asarray(cells.elem_numberdens())[:, 0], rtol=1e-6
    )
    # nne updated consistently
    assert np.all(np.asarray(out_cells.nne) > 0)


def test_nlte_departure_in_diluted_field(setup):
    """With W << 1 the excited states must be underpopulated vs LTE."""
    dad, rc, indices, opts, cells, temps = setup
    cells_dilute = cells.replace(W=jnp.full(cells.ncells, 1e-3))
    lte_pops = ltepop.calculate_levelpops(dad, cells_dilute, opts)
    _, nlte_pops = nltepop.solve_all_elements(
        indices, dad, rc, cells_dilute, opts, lte_pops, t_mid=5.0 * 86400.0
    )
    lte = np.asarray(lte_pops)
    nlte = np.asarray(nlte_pops)
    # ground states of each ion should hold a larger share than in LTE for
    # at least the neutral ion (radiative excitation strongly suppressed);
    # a crude but robust check: mean departure coefficient of excited levels < 1
    lvl_ion = np.asarray(dad.level_ion)
    ion_start = np.asarray(dad.ion_level_start)
    is_ground = np.zeros(dad.nlevels_total, bool)
    is_ground[ion_start] = True
    exc = ~is_ground
    dep = nlte[:, exc] / np.maximum(lte[:, exc], 1e-300)
    sel = lte[:, exc] > 1e-10
    assert np.median(dep[sel]) < 1.0


def test_superlevel_reproduces_lte_in_detailed_balance(setup):
    """With the per-ion NLTE cap forcing superlevels, detailed-balance
    conditions must still reproduce Boltzmann pops — the superlevel's
    internal distribution is exactly Boltzmann there
    (reference: nltepop.cc:850-870, 1061-1072)."""
    dad, rc, indices, opts, cells, temps = setup
    opts_sl = opts.replace(nlte_all_levels=False, nlte_maxlevel=2,
                           nlte_maxlevel_fe2=2)
    indices_sl = nltepop.build_indices(dad, opts_sl)
    # 6 levels/ion with cap 2 -> levels 3..5 collapse into a superlevel
    assert any(np.any(ix.sl_member) for ix in indices_sl)
    assert all(ix.dim_reduced < ix.dim for ix in indices_sl if np.any(ix.sl_member))
    lte_pops = ltepop.calculate_levelpops(dad, cells, opts_sl)
    _, nlte_pops = nltepop.solve_all_elements(
        indices_sl, dad, rc, cells, opts_sl, lte_pops, t_mid=5.0 * 86400.0
    )
    lte = np.asarray(lte_pops)
    nlte = np.asarray(nlte_pops)
    mask = lte > 1e-20
    ratio = nlte[mask] / lte[mask]
    assert np.all(np.isfinite(ratio))
    assert np.quantile(np.abs(np.log(ratio)), 0.95) < 0.12
    np.testing.assert_allclose(
        nlte.sum(axis=1), np.asarray(cells.elem_numberdens())[:, 0], rtol=1e-6
    )


def test_refinement_does_not_worsen_residual(setup):
    """LU iterative refinement keeps the best-residual iterate
    (reference: nltepop.cc:623-746), so refined pops can never be less
    self-consistent than the unrefined solve."""
    dad, rc, indices, opts, cells, temps = setup
    cells_d = cells.replace(W=jnp.full(cells.ncells, 1e-3))
    lte_pops = ltepop.calculate_levelpops(dad, cells_d, opts)
    outs = {}
    for n_ref in (0, 4):
        o = opts.replace(nlte_refine_iters=n_ref)
        _, pops = nltepop.solve_all_elements(
            indices, dad, rc, cells_d, o, lte_pops, t_mid=5.0 * 86400.0
        )
        outs[n_ref] = np.asarray(pops)
    for pops in outs.values():
        assert np.all(np.isfinite(pops)) and np.all(pops >= 0)
    # refined and unrefined solves agree on the physical scale
    sel = outs[0] > 1e-6
    np.testing.assert_allclose(outs[4][sel], outs[0][sel], rtol=0.05)
