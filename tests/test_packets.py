"""Pellet initialisation tests on a synthetic Ni56-powered model
(reference: packet.cc:86-162, decay.cc:1311-1402)."""

import jax
import numpy as np
import pytest

from artis_tpu import decay, grid as grid_mod, packets
from artis_tpu.constants import DAY, H, MEV
from artis_tpu.io import gammadata, model as model_io
from artis_tpu.options import GridType, kilonova_lte

from test_grid import write_1d_model


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pkt")
    tmin = 0.4 * DAY
    tmax = 10.0 * DAY
    m = model_io.read_model(write_1d_model(tmp), tmin)
    g = grid_mod.grid_init(m, tmin, GridType.SPHERICAL1D)
    dec = decay.init_nuclides(list(m.nuc_z), list(m.nuc_a))
    dec.t_model = m.t_model
    gammadata.init_gamma_data(dec, datadir="/root/reference/data")
    colmap = np.array([dec.get_nucindex(z, a) for z, a in zip(m.nuc_z, m.nuc_a)])
    init = np.zeros((m.npts_model, dec.num_nuclides))
    init[:, colmap[colmap >= 0]] = m.initnucmassfrac[:, colmap >= 0]
    opts = kilonova_lte(npkts=20000, grid_type=GridType.SPHERICAL1D,
                        use_model_initial_energy=False)
    tables = packets.make_pellet_tables(g, dec, init, None, opts, tmin, tmax)
    key = jax.random.PRNGKey(1234)
    st = packets.packet_init(key, g, tables, opts)
    return m, g, dec, opts, tables, st, tmin, tmax


def test_pellet_energy_sum(setup):
    m, g, dec, opts, tables, st, tmin, tmax = setup
    # packet energies are carried in units of e0 = etot/npkts, so the total in
    # erg is sum(e_cmf) * e0 = etot exactly
    np.testing.assert_allclose(
        float(np.sum(np.asarray(st.e_cmf))) * tables.e0, tables.norm, rtol=1e-12
    )
    assert np.all(np.asarray(st.e_cmf) > 0)


def test_pellet_types_and_times(setup):
    m, g, dec, opts, tables, st, tmin, tmax = setup
    assert np.all(np.asarray(st.ptype) == packets.TYPE_RADIOACTIVE_PELLET)
    td = np.asarray(st.tdecay)
    assert np.all(td > m.t_model)
    assert np.all(td < tmax)


def test_pellet_positions_in_cells(setup):
    m, g, dec, opts, tables, st, tmin, tmax = setup
    pos = np.asarray(st.pos)
    r = np.linalg.norm(pos, axis=1)
    cells = np.asarray(st.where)
    rmin = np.asarray(g.cell_pos_min)[cells, 0]
    rmax_ = np.asarray(g.cell_pos_max)[cells, 0]
    assert np.all(r >= rmin * (1 - 1e-12))
    assert np.all(r <= rmax_ * (1 + 1e-12))
    # direction is radial (homologous flow)
    dirs = np.asarray(st.dir)
    cosang = np.sum(dirs * pos / r[:, None], axis=1)
    np.testing.assert_allclose(cosang, 1.0, atol=1e-10)


def test_pellet_cell_distribution(setup):
    """Packets land in cells proportional to cell decay energy."""
    m, g, dec, opts, tables, st, tmin, tmax = setup
    cells = np.asarray(st.where)
    counts = np.bincount(cells, minlength=g.ngrid)
    en_cum = np.asarray(tables.en_cumulative_cell)
    en = np.diff(np.concatenate([[0.0], en_cum]))
    frac_expected = en / en.sum()
    frac_observed = counts / counts.sum()
    # multinomial noise: |obs - exp| < 5 sigma
    sigma = np.sqrt(np.maximum(frac_expected * (1 - frac_expected) / counts.sum(), 1e-12))
    assert np.all(np.abs(frac_observed - frac_expected) < 5 * sigma + 1e-4)


def test_decaytime_distribution_ni56(setup):
    """For pure Ni56 single-step chains the accepted tdecay distribution is a
    truncated exponential; compare the median against the analytic value."""
    m, g, dec, opts, tables, st, tmin, tmax = setup
    ni56 = dec.get_nucindex(28, 56)
    td = np.asarray(st.tdecay)
    nuc = np.asarray(st.pellet_nucindex)
    # packets whose chain END is Ni56 itself (single-step [Ni56] path)
    sel = nuc == ni56
    assert sel.sum() > 500
    tau = 8.80 * DAY
    t0 = m.t_model
    samples = td[sel]
    # truncated exponential on (t0, tmax): median solves
    # F(t) = (1-exp(-(t-t0)/tau)) / (1-exp(-(tmax-t0)/tau)) = 0.5
    ftot = 1 - np.exp(-(tmax - t0) / tau)
    med_expected = t0 - tau * np.log(1 - 0.5 * ftot)
    med_observed = np.median(samples)
    assert abs(med_observed / med_expected - 1) < 0.05


def test_particle_vs_gamma_split(setup):
    """originated_from_particlenotgamma frequency matches the energy split."""
    m, g, dec, opts, tables, st, tmin, tmax = setup
    nuc = np.asarray(st.pellet_nucindex)
    frompart = np.asarray(st.originated_from_particlenotgamma)
    co56 = dec.get_nucindex(27, 56)
    dt_bplus = decay.DECAYTYPE_BETAPLUS
    sel = (nuc == co56) & (np.asarray(st.pellet_decaytype) == dt_bplus)
    if sel.sum() > 200:
        engamma = dec.nuc_endecay_gamma[co56]
        enpart = dec.nuc_endecay_particle[co56, dt_bplus]
        expected = enpart / (engamma + enpart) if engamma + enpart > 0 else 1.0
        observed = frompart[sel].mean()
        assert abs(observed - expected) < 0.1
    # nu_cmf = enparticle/H for decay pellets (decay.cc:1401)
    sel2 = nuc == co56
    if sel2.sum():
        np.testing.assert_allclose(
            np.asarray(st.nu_cmf)[sel2],
            dec.nuc_endecay_particle[co56, np.asarray(st.pellet_decaytype)[sel2]] / H,
            rtol=1e-10,
        )
