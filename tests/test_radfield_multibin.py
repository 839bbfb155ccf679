"""Multibin radiation-field model tests (reference: radfield.cc:42-366,
834-911)."""

import numpy as np
import jax.numpy as jnp

from artis_tpu.plasma import radfield


def test_bin_boundaries_and_selection():
    nbins = 64
    lo = np.asarray(radfield.bin_nu_lower(nbins))
    hi = np.asarray(radfield.bin_nu_upper(nbins))
    assert lo[0] == radfield.NU_LOWER_FIRST
    assert hi[-1] == radfield.NU_UPPER_SUPERBIN
    np.testing.assert_allclose(hi[:-1], lo[1:])
    # selection: mid of each bin maps back to it; out-of-range maps to -1
    mids = 0.5 * (lo[:-1] + hi[:-1])
    sel = np.asarray(radfield.select_bin(jnp.asarray(mids), nbins))
    np.testing.assert_array_equal(sel, np.arange(nbins - 1))
    assert int(radfield.select_bin(jnp.asarray(lo[0] * 0.5), nbins)) == -1
    assert int(radfield.select_bin(jnp.asarray(hi[-1] * 2.0), nbins)) == -1


def test_fit_recovers_planck_parameters():
    """A dilute Planck field binned exactly must fit back to (T_R, W)."""
    nbins = 64
    nu_l = radfield.bin_nu_lower(nbins)
    nu_u = radfield.bin_nu_upper(nbins)
    t0, w0 = 7500.0, 0.4
    jbin = w0 * radfield.planck_integral(t0, nu_l, nu_u, False)[None, :]
    nujbin = w0 * radfield.planck_integral(t0, nu_l, nu_u, True)[None, :]
    cnt = jnp.ones((1, nbins))
    tr, w = radfield.fit_bin_params(
        jbin, nujbin, cnt, jnp.asarray([9000.0]), nbins, 1000.0, 30000.0
    )
    tr = np.asarray(tr)[0]
    w = np.asarray(w)[0]
    sel = slice(5, nbins - 4)  # away from edge bins with tiny J
    assert np.median(np.abs(tr[sel] - t0)) < 5.0
    np.testing.assert_allclose(np.median(w[sel]), w0, rtol=1e-3)
    # the superbin is pinned to T_e (radfield.cc:870-875)
    assert tr[-1] == 9000.0
    # zero-contribution bins get W = 0
    tr2, w2 = radfield.fit_bin_params(
        jbin, nujbin, jnp.zeros((1, nbins)), jnp.asarray([9000.0]), nbins,
        1000.0, 30000.0,
    )
    assert np.all(np.asarray(w2) == 0.0)


def test_binned_lookup_falls_back_to_fullspec():
    nbins = 16
    tr_bins = jnp.full((1, nbins), 8000.0)
    w_bins = jnp.zeros((1, nbins)).at[0, 3].set(0.5)
    nu_inbin3 = radfield.bin_nu_lower(nbins)[3] * 1.0001
    cellidx = jnp.zeros(2, jnp.int32)
    nu = jnp.asarray([float(nu_inbin3), radfield.NU_LOWER_FIRST * 0.5])
    jnu = radfield.radfield_dbb_binned(
        nu, cellidx, tr_bins, w_bins, jnp.asarray([6000.0]), jnp.asarray([0.1]),
        nbins,
    )
    expect0 = float(radfield.dbb(nu[0], 8000.0, 0.5))
    expect1 = float(radfield.dbb(nu[1], 6000.0, 0.1))  # fallback full-spec
    np.testing.assert_allclose(float(jnu[0]), expect0, rtol=1e-6)
    np.testing.assert_allclose(float(jnu[1]), expect1, rtol=1e-6)
