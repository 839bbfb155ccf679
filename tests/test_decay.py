"""Decay-network tests against analytic Bateman solutions
(reference: decay.cc:503-537, 840-999)."""

import math

import numpy as np
import pytest

from artis_tpu import decay
from artis_tpu.constants import DAY, MH, MEV


def test_standard_network_paths():
    dec = decay.init_nuclides([], [])
    # standard nuclides: Ni57, Ni56, Co56, Cr48, V48, Co57, Fe52, Mn52
    assert dec.num_nuclides == 8
    # path count: Ni57 has B+/EC branches each extending through Co57 (4),
    # Co57 (1), Ni56 + two Co56-branch extensions (3), Co56 (2),
    # Cr48 + Cr48->V48 (2), V48 (1), Fe52 + Fe52->Mn52 (2), Mn52 (1) == 16
    assert dec.npaths == 16
    assert dec.maxlen == 2
    # every path's non-last nuclide is unstable
    for i in range(dec.npaths):
        for j in range(dec.path_len[i] - 1):
            assert dec.nuc_meanlife[dec.path_nucindex[i, j]] > 0


def test_bateman_single_decay():
    dec = decay.init_nuclides([], [])
    t = 5.0 * DAY
    lam = np.array([[1.0 / (8.80 * DAY), 0.0]])
    res = decay.calculate_decaychain_batch(lam, np.array([1]), t)
    assert res[0] == pytest.approx(math.exp(-t / (8.80 * DAY)), rel=1e-12)


def test_bateman_two_step_vs_analytic():
    """Ni56 -> Co56: analytic N2(t) = l1/(l2-l1) (e^-l1 t - e^-l2 t)."""
    l1 = 1.0 / (8.80 * DAY)
    l2 = 1.0 / (113.7 * DAY)
    t = 20.0 * DAY
    lam = np.array([[l1, l2, 0.0]])
    res = decay.calculate_decaychain_batch(lam, np.array([2]), t)
    expected = l1 / (l2 - l1) * (math.exp(-l1 * t) - math.exp(-l2 * t))
    assert res[0] == pytest.approx(expected, rel=1e-12)


def test_bateman_three_step_sink():
    """Chain to the stable sink: N3(inf) -> N1(0) (number conservation)."""
    l1, l2 = 1.0 / (8.80 * DAY), 1.0 / (113.7 * DAY)
    lam = np.array([[l1, l2, 0.0]])
    res = decay.calculate_decaychain_batch(lam, np.array([3]), 1e13)
    assert res[0] == pytest.approx(1.0, rel=1e-9)


def test_massfrac_evolution_conserves_mass():
    """Beta/EC decays conserve A, so total tracked mass fraction is constant
    once daughters (incl. off-network) are counted."""
    dec = decay.init_nuclides([], [])
    dec.t_model = 0.0
    ncells = 3
    init = np.zeros((ncells, dec.num_nuclides))
    ni56 = dec.get_nucindex(28, 56)
    co56 = dec.get_nucindex(27, 56)
    init[:, ni56] = np.array([0.5, 0.1, 0.0])
    init[:, co56] = np.array([0.0, 0.05, 0.2])

    for t in [0.0, 5 * DAY, 50 * DAY, 500 * DAY]:
        mf = decay.get_nuc_massfrac_all(dec, init, t)
        fe56 = decay.get_nuc_massfrac_offnetwork(dec, init, t, 26, 56)
        total = mf[:, ni56] + mf[:, co56] + fe56
        np.testing.assert_allclose(total, init[:, ni56] + init[:, co56], rtol=1e-10)

    # at t=0 the abundances equal initial ones
    mf0 = decay.get_nuc_massfrac_all(dec, init, 0.0)
    np.testing.assert_allclose(mf0[:, ni56], init[:, ni56], rtol=1e-12)
    np.testing.assert_allclose(mf0[:, co56], init[:, co56], atol=1e-15)


def test_endecay_between_times_additive():
    dec = decay.init_nuclides([], [])
    dec.t_model = 0.2 * DAY
    init = np.zeros((1, dec.num_nuclides))
    init[0, dec.get_nucindex(28, 56)] = 1.0

    def between(t0, t1):
        e0 = decay.endecay_to_tinf_per_ejectamass_at_time(dec, init, t0)
        e1 = decay.endecay_to_tinf_per_ejectamass_at_time(dec, init, t1)
        return (e0 - e1).sum()

    e_a = between(0.4 * DAY, 5 * DAY)
    e_b = between(5 * DAY, 10 * DAY)
    e_ab = between(0.4 * DAY, 10 * DAY)
    assert e_ab == pytest.approx(e_a + e_b, rel=1e-12)
    assert e_a > 0 and e_b > 0


def test_endecay_withexpansion_less_than_without():
    """Expansion weighting must reduce the available energy."""
    dec = decay.init_nuclides([], [])
    dec.t_model = 0.05 * DAY
    init = np.zeros((1, dec.num_nuclides))
    init[0, dec.get_nucindex(28, 56)] = 1.0
    tstart = 2.0 * DAY
    with_exp = decay.endecay_t0_to_time_withexpansion(dec, init, tstart)[0]
    e0 = decay.endecay_to_tinf_per_ejectamass_at_time(dec, init, dec.t_model)
    e1 = decay.endecay_to_tinf_per_ejectamass_at_time(dec, init, tstart)
    without = (e0 - e1).sum()
    assert 0 < with_exp < without


def test_custom_nuclides_with_decay_files():
    """Load the real beta-minus/alpha decay data files and build r-process
    chains (reference: decay.cc:898-959)."""
    datadir = "/root/reference/data"
    # a few r-process nuclides from the kilonova model
    custom_z = [38, 58, 60, 28, 27]
    custom_a = [95, 145, 150, 56, 56]
    dec = decay.init_nuclides(custom_z, custom_a, datadir)
    assert dec.num_nuclides >= 8
    assert dec.npaths > 14
    # Sr95 should beta-decay through a chain
    sr95 = dec.get_nucindex(38, 95)
    assert sr95 >= 0
    assert dec.nuc_meanlife[sr95] > 0
    # find a path starting at Sr95 with length > 1 (chain through Y95, Zr95...)
    starts = dec.path_top_nucindex == sr95
    assert starts.any()
    assert dec.path_len[starts].max() >= 2


def test_particle_injection_and_gamma_rates():
    dec = decay.init_nuclides([], [])
    dec.t_model = 0.0
    init = np.zeros((1, dec.num_nuclides))
    init[0, dec.get_nucindex(28, 56)] = 1.0
    t = 20.0 * DAY
    # Ni56 EC produces no positrons; Co56 beta+ does
    rate_bplus = decay.get_particle_injection_rate(dec, init, t, decay.DECAYTYPE_BETAPLUS)
    assert rate_bplus[0] > 0
    # analytic check: rate = X_Co56(t)/tau_Co56 * branch * E_pos / m56
    mf = decay.get_nuc_massfrac_all(dec, init, t)
    co56 = dec.get_nucindex(27, 56)
    expected = (
        mf[0, co56] / (113.7 * DAY) * 0.19 * (0.63 * MEV) / (56 * MH)
    )
    assert rate_bplus[0] == pytest.approx(expected, rel=1e-10)
    gam = decay.get_gamma_emission_rate(dec, init, t)
    assert gam[0] == 0.0  # gamma energies not yet loaded (gamma-line data sets them)
