"""Spencer-Fano non-thermal solver tests (reference: nonthermal.cc:2391-2541).

Physics check: the Kozma & Fransson behaviour — as the ionisation fraction
x_e = nne/nniontot drops, more of the deposited energy goes into ionisation
and excitation and less into heating of thermal electrons.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from artis_tpu import atomic
from artis_tpu.io import atomicdata
from artis_tpu.plasma import nonthermal
from artis_tpu.synthdata import write_synthetic_atomicdata


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    folder = tmp_path_factory.mktemp("atomic_nt")
    write_synthetic_atomicdata(folder, elements=((26, 3), (28, 2)), nlevels_per_ion=6)
    ad = atomicdata.read_atomicdata(str(folder))
    dad = atomic.to_device(ad)
    ntd = nonthermal.build_nonthermal_data(
        ad, dad, "/root/reference/data", sf_points=192
    )
    return ad, dad, ntd


def test_collion_shells_matched(setup):
    ad, dad, ntd = setup
    # Fe I-III and Ni I-II have Younger-fit shells in collion.txt
    assert ntd.nshells > 0
    assert ntd.nexc > 0
    ionpots = np.asarray(ntd.shell_ionpot_ev)
    assert np.all(ionpots >= ntd.sf_emin)
    assert np.all(ionpots < 2e4)


def test_heating_fraction_drops_with_xe(setup):
    ad, dad, ntd = setup
    nions = dad.nlevels_total  # placeholder; use real nions below
    nions = dad.nions_total
    ncells = 3
    nnion = jnp.zeros((ncells, nions)).at[:, 0].set(1e8)
    pops = jnp.zeros((ncells, dad.nlevels_total)).at[:, dad.ion_level_start[0]].set(1e8)
    heats = []
    for xe in (1.0, 0.1, 0.01):
        out = nonthermal.solve_spencerfano_cells(
            ntd, dad, pops, nnion, jnp.full(ncells, 1e8 * xe)
        )
        y = np.asarray(out["y"])
        assert np.all(np.isfinite(y))
        h = float(out["frac_heating"][0])
        i = float(out["frac_ionization"][0])
        e = float(out["frac_excitation"][0])
        assert 0.0 <= h <= 1.0 and 0.0 <= i <= 1.0 and 0.0 <= e <= 1.0
        assert h + i + e == pytest.approx(1.0, abs=1e-6)
        heats.append(h)
    # high x_e -> nearly all heating (Axelrod limit ~0.97)
    assert heats[0] > 0.9
    # monotonic decline of heating as x_e drops (Kozma & Fransson 1992)
    assert heats[0] > heats[1] > heats[2]
    assert heats[2] < 0.5


def test_eff_ionpot_positive_for_included_ions(setup):
    ad, dad, ntd = setup
    nions = dad.nions_total
    ncells = 2
    # spread population over all ions
    nnion = jnp.full((ncells, nions), 1e7)
    pops = jnp.zeros((ncells, dad.nlevels_total)).at[:, dad.ion_level_start].set(1e7)
    out = nonthermal.solve_spencerfano_cells(
        ntd, dad, pops, nnion, jnp.full(ncells, 1e7)
    )
    eff = np.asarray(out["eff_ionpot"])
    shells = np.unique(np.asarray(ntd.shell_ion))
    assert np.all(eff[:, shells] > 0)
    # rate coefficient: positive for ions with shells when deposition > 0
    rate = nonthermal.nt_ionization_ratecoeff(
        jnp.full(ncells, 1e-10), jnp.sum(nnion, axis=1), out["eff_ionpot"]
    )
    assert np.all(np.asarray(rate)[:, shells] > 0)
