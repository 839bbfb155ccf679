"""LUT-off on-the-fly radiation-field integrals
(reference: ratecoeff.cc:685-817, thermalbalance.cc:43-106).

Oracle: for an undiluted blackbody field (W=1, T_R=T) with zero stimulated
correction, the on-the-fly corrphotoion integral equals the LUT value at the
same temperature — identical integrand on the identical Simpson grid."""

import numpy as np
import jax.numpy as jnp
import pytest

from artis_tpu import atomic
from artis_tpu.io import atomicdata
from artis_tpu.options import kilonova_lte
from artis_tpu.plasma import ratecoeff
from artis_tpu.synthdata import write_synthetic_atomicdata


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    folder = tmp_path_factory.mktemp("atomic_otf")
    write_synthetic_atomicdata(folder, elements=((26, 3),), nlevels_per_ion=6)
    ad = atomicdata.read_atomicdata(str(folder), nlevels_requiretransitions=lambda z, s: 0)
    dad = atomic.to_device(ad)
    opts = kilonova_lte(mintemp=2000.0, maxtemp=32000.0, tablesize=40)
    rc = ratecoeff.build_tables(dad, opts.tablesize, opts.mintemp, opts.maxtemp)
    return dad, rc, opts


def test_otf_matches_lut_for_undiluted_blackbody(setup):
    dad, rc, opts = setup
    # temperatures exactly on the LUT grid -> no interpolation error
    t_pts = np.asarray(rc.t_grid)[[5, 15, 25]]
    ncells = len(t_pts)
    t = jnp.asarray(t_pts)
    w = jnp.ones(ncells)
    dep = jnp.zeros((ncells, dad.nbfcontinua))  # no stimulated correction

    corr_otf, bfh_otf = ratecoeff.radfield_bf_integrals_cells(
        dad, t, t, w, dep
    )
    corr_lut = ratecoeff.interpolate_lut(
        rc.corrphotoion, rc,
        jnp.arange(dad.nbfcontinua)[None, :].repeat(ncells, 0), t[:, None],
    )
    bfh_lut = ratecoeff.interpolate_lut(
        rc.bfheating, rc,
        jnp.arange(dad.nbfcontinua)[None, :].repeat(ncells, 0), t[:, None],
    )
    # LUT integrand uses (1 - e^{-hnu/kT}) with T == T_R == T_e here, and the
    # OTF corrfactor with dep=0 is exactly 1 -> corr_otf should be LARGER
    # than or equal to the LUT value by the stimulated-emission factor; the
    # bfheating integrands are identical
    np.testing.assert_allclose(
        np.asarray(bfh_otf), np.asarray(bfh_lut), rtol=1e-6
    )
    ratio = np.asarray(corr_otf) / np.maximum(np.asarray(corr_lut), 1e-300)
    sel = np.asarray(corr_lut) > 0
    assert np.all(ratio[sel] >= 1.0 - 1e-6)
    # the stimulated factor is bounded: at the threshold it is the largest
    assert np.all(ratio[sel] < 10.0)


def test_otf_with_unit_departure_matches_lut(setup):
    """With departure ratio == 1, the OTF corrfactor (1 - e^{-hnu/kTe})
    reproduces the LUT integrand exactly."""
    dad, rc, opts = setup
    t_pts = np.asarray(rc.t_grid)[[8, 20]]
    ncells = len(t_pts)
    t = jnp.asarray(t_pts)
    w = jnp.ones(ncells)
    dep = jnp.ones((ncells, dad.nbfcontinua))

    corr_otf, _ = ratecoeff.radfield_bf_integrals_cells(dad, t, t, w, dep)
    corr_lut = ratecoeff.interpolate_lut(
        rc.corrphotoion, rc,
        jnp.arange(dad.nbfcontinua)[None, :].repeat(ncells, 0), t[:, None],
    )
    np.testing.assert_allclose(
        np.asarray(corr_otf), np.asarray(corr_lut), rtol=1e-6
    )


def test_otf_scales_with_dilution(setup):
    """J is linear in W, so the integrals must scale linearly with W."""
    dad, rc, opts = setup
    t = jnp.full(2, 8000.0)
    dep = jnp.zeros((2, dad.nbfcontinua))
    c1, b1 = ratecoeff.radfield_bf_integrals_cells(dad, t, t, jnp.ones(2), dep)
    c2, b2 = ratecoeff.radfield_bf_integrals_cells(dad, t, t, jnp.full(2, 0.25), dep)
    np.testing.assert_allclose(np.asarray(c2), 0.25 * np.asarray(c1), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(b2), 0.25 * np.asarray(b1), rtol=1e-12)
