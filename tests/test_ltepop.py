"""Batched Saha/LTE population tests (reference: ltepop.cc:49-640)."""

import numpy as np
import pytest
import jax.numpy as jnp

from artis_tpu import atomic
from artis_tpu.constants import KB, MH, SAHACONST
from artis_tpu.io import atomicdata
from artis_tpu.options import kilonova_lte
from artis_tpu.plasma import cellstate, ltepop
from synthetic_atomic import write_synthetic_atomicdata


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    folder = tmp_path_factory.mktemp("atomic_lte")
    write_synthetic_atomicdata(folder, elements=((26, 3),), nlevels_per_ion=6)
    ad = atomicdata.read_atomicdata(str(folder), nlevels_requiretransitions=lambda z, s: 0)
    dad = atomic.to_device(ad)
    opts = kilonova_lte()
    ncells = 6
    cells = cellstate.init_cellstate(
        dad, ncells, np.full(ncells, 1e-13), np.full(ncells, 1.0), 1000.0, 20000.0
    )
    # pure iron gas at a range of temperatures
    temps = np.linspace(3000.0, 18000.0, ncells)
    cells = cells.replace(
        Te=jnp.asarray(temps), TJ=jnp.asarray(temps), TR=jnp.asarray(temps),
        elem_massfrac=jnp.ones((ncells, 1)),
    )
    return dad, opts, cells, temps


def test_partition_functions(setup):
    dad, opts, cells, temps = setup
    pf = ltepop.calculate_partfuncts(dad, cells.TJ)
    # low T: U -> g0; high T: U > g0
    g0 = np.asarray(dad.ion_g0)
    assert np.all(np.asarray(pf) >= g0[None, :] * 0.999)
    assert np.all(np.diff(np.asarray(pf), axis=0) > -1e-9)  # increasing with T


def test_ion_balance_two_ion_saha(setup):
    """Check the solved nne against a brute-force scalar Saha solve."""
    dad, opts, cells, temps = setup
    out = ltepop.calculate_ion_balance_nne(dad, cells, opts)
    nne = np.asarray(out.nne)
    assert np.all(nne > 0)
    # mean ion charge must increase with temperature
    nnion = np.asarray(ltepop.get_nnion(dad, out))
    charge = np.asarray(dad.ion_stage) - 1
    mean_charge = (nnion * charge[None, :]).sum(axis=1) / nnion.sum(axis=1)
    assert np.all(np.diff(mean_charge) > -1e-9)

    # brute force scalar check for the middle cell
    i = 3
    t = temps[i]
    pf = np.asarray(ltepop.calculate_partfuncts(dad, cells.TJ))[i]
    nnelement = float(np.asarray(cells.elem_numberdens())[i, 0])
    ionpot01 = float(dad.ion_ionpot_eff[0])
    ionpot12 = float(dad.ion_ionpot_eff[1])
    phi0 = pf[0] / pf[1] * SAHACONST * t**-1.5 * np.exp(ionpot01 / KB / t)
    phi1 = pf[1] / pf[2] * SAHACONST * t**-1.5 * np.exp(ionpot12 / KB / t)

    def f(ne):
        f2 = 1.0
        f1 = f2 * ne * phi1
        f0 = f1 * ne * phi0
        norm = f0 + f1 + f2
        return nnelement * (f1 + 2 * f2) / norm - ne

    lo, hi = 1e-300, nnelement * 26
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if f(mid) > 0:
            lo = mid
        else:
            hi = mid
    nne_expected = 0.5 * (lo + hi)
    assert nne[i] == pytest.approx(nne_expected, rel=1e-3)


def test_levelpops_boltzmann(setup):
    dad, opts, cells, temps = setup
    out = ltepop.calculate_ion_balance_nne(dad, cells, opts)
    pops = np.asarray(ltepop.calculate_levelpops(dad, out, opts))
    assert pops.shape == (cells.ncells, dad.nlevels_total)
    # level pops sum to the ion population
    nnion = np.asarray(ltepop.get_nnion(dad, out))
    lvlion = np.asarray(dad.level_ion)
    for ui in range(dad.nions_total):
        np.testing.assert_allclose(
            pops[:, lvlion == ui].sum(axis=1), nnion[:, ui], rtol=1e-6
        )
    # Boltzmann ratio check: n1/n0 = g1/g0 exp(-dE/kT)
    i = 2
    s = int(dad.ion_level_start[0])
    g = np.asarray(dad.level_g)
    de = float(dad.level_e_aboveground[s + 1])
    expected = g[s + 1] / g[s] * np.exp(-de / KB / temps[i])
    assert pops[i, s + 1] / pops[i, s] == pytest.approx(expected, rel=1e-10)
