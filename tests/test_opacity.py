"""Continuum-opacity tests vs direct dense evaluation
(reference: rpkt.cc:783-898, 972-1032)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from artis_tpu import atomic
from artis_tpu.constants import HOVERKB, SAHACONST, SIGMA_T
from artis_tpu.io import atomicdata
from artis_tpu.transport import opacity
from synthetic_atomic import write_synthetic_atomicdata


@pytest.fixture(scope="module")
def dad(tmp_path_factory):
    folder = tmp_path_factory.mktemp("atomic_op")
    write_synthetic_atomicdata(folder, elements=((26, 3), (27, 2)), nlevels_per_ion=6)
    ad = atomicdata.read_atomicdata(str(folder), nlevels_requiretransitions=lambda z, s: 0)
    return atomic.to_device(ad)


def dense_chi_bf(dad, nu, cell, levelpops, nnion, nne, nnetot, t_e):
    """Direct loop over every continuum (reference algorithm)."""
    total = 0.0
    for i in range(dad.nbfcontinua):
        nu_edge = float(dad.cont_nu_edge[i])
        if not (nu_edge <= nu <= nu_edge * dad.last_phixs_nuovernuedge):
            continue
        ion = int(dad.cont_ion[i])
        is_ground = int(dad.cont_uniquelower[i]) == int(dad.ion_level_start[ion])
        if not (nnion[cell, ion] / nnetot[cell] > 1e-6 or is_ground):
            continue
        nnlevel = levelpops[cell, int(dad.cont_uniquelower[i])]
        if nnlevel <= 0:
            continue
        row = int(dad.cont_phixsrow[i])
        npts = dad.nphixspoints
        inc = dad.nphixsnuincrement
        ireal = (nu / nu_edge - 1.0) / inc
        ii = int(ireal)
        xs = np.asarray(dad.allphixs[row])
        if ii < 0:
            sigma = 0.0
        elif ii < npts - 1:
            sigma = xs[ii] * (1 - (ireal - ii)) + xs[ii + 1] * (ireal - ii)
        else:
            numax = nu_edge * dad.last_phixs_nuovernuedge
            sigma = xs[npts - 1] * (numax / nu) ** 3
        g_l = float(dad.level_g[dad.cont_uniquelower[i]])
        g_u = float(dad.level_g[dad.cont_uniqueupper[i]])
        sf = SAHACONST * g_l / g_u * t_e[cell] ** -1.5 * np.exp(HOVERKB * nu_edge / t_e[cell])
        nnupper = levelpops[cell, int(dad.cont_uniqueupper[i])]
        departure = nnupper / nnlevel * nne[cell] * sf
        corr = max(0.0, 1.0 - departure * np.exp(-HOVERKB * nu / t_e[cell]))
        total += nnlevel * sigma * float(dad.cont_probability[i]) * corr
    return total


def test_chi_bf_matches_dense(dad):
    rng = np.random.default_rng(3)
    ncells = 4
    levelpops = 10.0 ** rng.uniform(-5, 5, (ncells, dad.nlevels_total))
    nnion = 10.0 ** rng.uniform(0, 6, (ncells, dad.nions_total))
    nne = 10.0 ** rng.uniform(4, 8, ncells)
    nnetot = nne * 1.2
    t_e = rng.uniform(4000, 15000, ncells)

    n = 32
    nu_lo = float(dad.cont_nu_edge[0]) * 0.8
    nu_hi = float(dad.cont_nu_edge[-1]) * 3.0
    nu = rng.uniform(nu_lo, nu_hi, n)
    cells = rng.integers(0, ncells, n)

    bf_a, bf_dep = opacity.build_bf_tables(
        dad, jnp.asarray(levelpops), jnp.asarray(nnion), jnp.asarray(nne),
        jnp.asarray(nnetot), jnp.asarray(t_e),
    )
    chi_bf, select = opacity.calculate_chi_bf(
        dad, jnp.asarray(nu), jnp.asarray(cells), jnp.ones(n, bool),
        bf_a, bf_dep, jnp.asarray(t_e), chunk=4,
    )
    for i in range(n):
        expected = dense_chi_bf(dad, nu[i], cells[i], levelpops, nnion, nne, nnetot, t_e)
        got = float(chi_bf[i])
        if expected == 0:
            assert got == pytest.approx(0.0, abs=1e-25)
        else:
            # phixs table is float32; tolerate that level of rounding
            assert got == pytest.approx(expected, rel=1e-5), f"packet {i}"


def test_select_continuum_within_window(dad):
    rng = np.random.default_rng(4)
    ncells = 2
    levelpops = 10.0 ** rng.uniform(-2, 4, (ncells, dad.nlevels_total))
    nnion = 10.0 ** rng.uniform(2, 6, (ncells, dad.nions_total))
    nne = np.full(ncells, 1e6)
    nnetot = nne * 1.1
    t_e = np.full(ncells, 8000.0)
    n = 256
    nu = np.full(n, float(dad.cont_nu_edge[-1]) * 1.5)
    cells = rng.integers(0, ncells, n)
    bf_a, bf_dep = opacity.build_bf_tables(
        dad, jnp.asarray(levelpops), jnp.asarray(nnion), jnp.asarray(nne),
        jnp.asarray(nnetot), jnp.asarray(t_e),
    )
    chi_bf, select = opacity.calculate_chi_bf(
        dad, jnp.asarray(nu), jnp.asarray(cells), jnp.ones(n, bool),
        bf_a, bf_dep, jnp.asarray(t_e), chunk=4,
    )
    assert np.all(np.asarray(chi_bf) > 0)
    chosen = np.asarray(select(jax.random.PRNGKey(0)))
    # all selected continua must be inside the frequency window
    edges = np.asarray(dad.cont_nu_edge)[chosen]
    assert np.all(edges <= nu)
    assert np.all(edges * dad.last_phixs_nuovernuedge >= nu)
    # multiple distinct continua get selected
    assert len(np.unique(chosen)) > 1


def test_chi_ff(dad):
    # ff opacity formula sanity: scales as nu^-3 and with nne
    nnion = np.ones((1, dad.nions_total))
    t_e = np.array([1e4])
    part = opacity.chi_ff_nnionpart_cells(dad, jnp.asarray(nnion), jnp.asarray(t_e))
    assert float(part[0]) > 0
    chi1 = opacity.calculate_chi_ffheating(part, jnp.array([1e6]), t_e, jnp.array([1e15]))
    chi2 = opacity.calculate_chi_ffheating(part, jnp.array([1e6]), t_e, jnp.array([2e15]))
    # in Wien regime chi ~ nu^-3 * (1 - exp(-hnu/kT)) ~ nu^-3
    assert float(chi1[0]) / float(chi2[0]) == pytest.approx(8.0, rel=0.05)


def test_gamma_contr_ground_continua(dad):
    """groundcont gamma contributions: sigma*prob*corrfactor per ground
    continuum, no level population factor (reference: rpkt.cc:580-599,
    870-880)."""
    import jax
    from artis_tpu.atomic import photoionization_crosssection

    rng = np.random.default_rng(7)
    ncells = 2
    levelpops = 10.0 ** rng.uniform(-2, 4, (ncells, dad.nlevels_total))
    nnion = 10.0 ** rng.uniform(2, 6, (ncells, dad.nions_total))
    nne = np.full(ncells, 1e6)
    nnetot = nne * 1.1
    t_e = np.full(ncells, 8000.0)
    bf_a, bf_dep = opacity.build_bf_tables(
        dad, jnp.asarray(levelpops), jnp.asarray(nnion), jnp.asarray(nne),
        jnp.asarray(nnetot), jnp.asarray(t_e),
    )
    n = 8
    nu = rng.uniform(float(dad.cont_nu_edge[0]), float(dad.cont_nu_edge[-1]) * 1.5, n)
    cells_idx = rng.integers(0, ncells, n)
    chi_bf, sel, gc = opacity.calculate_chi_bf(
        dad, jnp.asarray(nu), jnp.asarray(cells_idx), jnp.ones(n, bool),
        bf_a, bf_dep, jnp.asarray(t_e), chunk=4, want_gamma_contr=True,
    )
    gc = np.asarray(gc)
    assert gc.shape == (n, dad.nbfcontinua_ground)
    # dense check for one packet: sum over ground continua in window
    gidx = np.asarray(dad.cont_groundindex)
    edges = np.asarray(dad.cont_nu_edge)
    prob = np.asarray(dad.cont_probability)
    dep = np.asarray(bf_dep)
    from artis_tpu.constants import HOVERKB
    for p in range(n):
        c = cells_idx[p]
        expected = np.zeros(dad.nbfcontinua_ground)
        for ci in range(dad.nbfcontinua):
            g = gidx[ci]
            if g < 0:
                continue
            if not (edges[ci] <= nu[p] <= edges[ci] * dad.last_phixs_nuovernuedge):
                continue
            sig = float(photoionization_crosssection(
                dad, jnp.asarray([ci]).astype(int)[0] * 0 + np.asarray(dad.cont_phixsrow)[ci],
                edges[ci], nu[p]))
            # build_bf_tables returns LOG departure (float32-safe form)
            corr = max(0.0, 1.0 - np.exp(np.clip(
                dep[c, ci] - HOVERKB * nu[p] / t_e[c], -80.0, 80.0)))
            expected[g] += sig * prob[ci] * corr
        np.testing.assert_allclose(gc[p], expected, rtol=1e-5, atol=1e-40)
