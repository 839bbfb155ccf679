"""Atomic-data parser tests on synthetic datasets
(reference behaviours: input.cc:912-1255)."""

import numpy as np
import pytest

from artis_tpu.constants import EV, H
from artis_tpu.io import atomicdata
from synthetic_atomic import write_synthetic_atomicdata


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    folder = tmp_path_factory.mktemp("atomic")
    write_synthetic_atomicdata(folder)
    return atomicdata.read_atomicdata(
        str(folder), nlevels_requiretransitions=lambda z, s: 0
    )


def test_structure_counts(dataset):
    ad = dataset
    assert ad.nelements == 2
    assert list(ad.elem_z) == [26, 27]
    assert ad.nions_total == 5
    assert ad.nlevels_total == 25
    # each ion: 5 levels, all pairs = 10 transitions -> 5 ions * 10 lines
    assert ad.nlines == 50
    # each transition appears once as down and once as up
    assert ad.ntrans_total == 100


def test_energy_offsets_cumulative(dataset):
    ad = dataset
    # ion 1's ground energy = ionpot of ion 0 (energyoffset accumulation,
    # reference: input.cc:981-987)
    fe0_ionpot = ad.ion_ionpot[0]
    fe1_ground = ad.epsilon(0, 1, 0)
    assert fe1_ground == pytest.approx(fe0_ionpot, rel=1e-12)
    fe2_ground = ad.epsilon(0, 2, 0)
    assert fe2_ground == pytest.approx(ad.ion_ionpot[0] + ad.ion_ionpot[1], rel=1e-12)
    # energies strictly increasing within an ion
    for ui in range(ad.nions_total):
        s = ad.ion_level_start[ui]
        e = ad.level_energy[s : s + ad.ion_nlevels[ui]]
        assert np.all(np.diff(e) > 0)


def test_linelist_sorted_descending(dataset):
    ad = dataset
    assert np.all(np.diff(ad.line_nu) <= 0)
    # each line's nu equals the level energy difference / H
    for i in [0, 10, ad.nlines - 1]:
        el, ion = ad.line_element[i], ad.line_ion[i]
        nu = (ad.epsilon(el, ion, int(ad.line_upper[i])) - ad.epsilon(el, ion, int(ad.line_lower[i]))) / H
        assert nu == pytest.approx(ad.line_nu[i], rel=1e-12)


def test_alltrans_blocks(dataset):
    ad = dataset
    # level 4 (top) of ion 0 has 4 down transitions, 0 up
    gl_top = ad.get_uniquelevelindex(0, 0, 4)
    assert ad.level_ndowntrans[gl_top] == 4
    assert ad.level_nuptrans[gl_top] == 0
    # ground level has 0 down, 4 up
    gl0 = ad.get_uniquelevelindex(0, 0, 0)
    assert ad.level_ndowntrans[gl0] == 0
    assert ad.level_nuptrans[gl0] == 4
    # lineindex pointers resolve to the right level pair
    s = ad.level_alltrans_start[gl_top]
    for k in range(4):
        li = ad.trans_lineindex[s + k]
        assert ad.line_upper[li] == 4
        assert ad.line_lower[li] == ad.trans_target[s + k]
    # oscillator strengths positive
    assert np.all(ad.trans_osc_strength > 0)


def test_ionising_levels(dataset):
    ad = dataset
    # levels were placed below the ionpot, so all levels of non-top ions ionise
    assert ad.ion_nionisinglevels[0] == 5
    assert ad.ion_nionisinglevels[1] == 5
    # top ion has no ionising levels
    assert ad.ion_nionisinglevels[2] == 0


def test_phixs_tables(dataset):
    ad = dataset
    assert ad.nphixspoints == 20
    # per element-pair: levels 0 (2 targets) and 1 (1 target)
    # Fe has 2 non-top ions, Co has 1 -> 3 ion pairs, each 2 tables
    assert ad.allphixs.shape == (6, 20)
    assert ad.nbfcontinua == 3 * (2 + 1)
    assert ad.nbfcontinua_ground == 3
    # cont list sorted ascending by nu_edge
    assert np.all(np.diff(ad.cont_nu_edge) >= 0)
    assert np.all(np.diff(ad.groundcont_nu_edge) >= 0)
    # ground level of Fe I has 2 targets with probs 0.7/0.3
    gl0 = ad.get_uniquelevelindex(0, 0, 0)
    assert ad.level_nphixstargets[gl0] == 2
    s = ad.level_phixstargetstart[gl0]
    np.testing.assert_allclose(ad.phixstargets_prob[s : s + 2], [0.7, 0.3])
    assert list(ad.phixstargets_level[s : s + 2]) == [0, 1]
    # threshold energies: nu_edge = (eps_upper - eps_lower)/H
    i = 0
    el, ion, lev = ad.cont_element[i], ad.cont_ion[i], ad.cont_level[i]
    up = ad.cont_upperlevel[i]
    nu_edge = (ad.epsilon(el, ion + 1, int(up)) - ad.epsilon(el, ion, int(lev))) / H
    assert nu_edge == pytest.approx(ad.cont_nu_edge[i], rel=1e-12)


def test_groundterm_detection(dataset):
    ad = dataset
    # synthetic stat weights are all distinct and energies equally spaced:
    # no 2x jump -> ground term stays 1 (first big-gap rule fails at level 1)
    assert np.all(ad.ion_nlevels_groundterm >= 1)


def test_cont_index_assignment(dataset):
    ad = dataset
    # cont_index increments by nphixstargets over levels with tables
    cis = ad.level_cont_index[ad.level_cont_index >= 0]
    assert cis[0] == 0
    assert ad.level_cont_index.max() < ad.nbfcontinua


def test_nlevels_requiretransitions(tmp_path):
    """Fake forbidden transitions are inserted to couple low levels
    (reference: input.cc:421-448)."""
    write_synthetic_atomicdata(tmp_path, elements=((26, 2),), nlevels_per_ion=4)
    # remove some transitions to create gaps: rewrite transitiondata with only 1-2
    lines = []
    with open(tmp_path / "transitiondata.txt") as f:
        content = f.read().splitlines()
    out = []
    i = 0
    while i < len(content):
        z, stage, n = content[i].split()
        n = int(n)
        rows = content[i + 1 : i + 1 + n]
        # keep 1->2 and 3->4: the jump from lower=1 to lower=3 leaves level 1
        # missing required couplings, so fakes (1->3), (1->4) get inserted
        kept = [r for r in rows if (r.split()[0], r.split()[1]) in (("1", "2"), ("3", "4"))]
        out.append(f"{z} {stage} {len(kept)}")
        out.extend(kept)
        i += 1 + n
    (tmp_path / "transitiondata.txt").write_text("\n".join(out) + "\n")

    ad = atomicdata.read_atomicdata(
        str(tmp_path), nlevels_requiretransitions=lambda z, s: 4
    )
    # originally only 1->2 per ion; with required transitions, level 0 must be
    # coupled to all 4 levels and so on; check fake lines exist with A=0
    fake = ad.trans_A == 0
    assert fake.sum() > 0
    assert np.all(ad.trans_forbidden[fake])
    assert np.all(ad.trans_coll_str[fake] == -2.0)


def test_duplicate_transitions_summed(tmp_path):
    write_synthetic_atomicdata(tmp_path, elements=((26, 2),), nlevels_per_ion=3)
    with open(tmp_path / "transitiondata.txt") as f:
        content = f.read().splitlines()
    # duplicate the first transition row of the first block
    z, stage, n = content[0].split()
    rows = content[1 : 1 + int(n)]
    rows = [rows[0]] + rows  # duplicate first
    out = [f"{z} {stage} {len(rows)}"] + rows + content[1 + int(n):]
    (tmp_path / "transitiondata.txt").write_text("\n".join(out) + "\n")

    ad = atomicdata.read_atomicdata(str(tmp_path), nlevels_requiretransitions=lambda z, s: 0)
    A_dup = float(rows[0].split()[2])
    # alltrans A is summed; linelist A keeps first occurrence
    # find the line for (lower=0, upper=1) of element 0 ion 0
    m = (ad.line_element == 0) & (ad.line_ion == 0) & (ad.line_lower == 0) & (ad.line_upper == 1)
    assert m.sum() == 1
    li = int(np.nonzero(m)[0][0])
    assert ad.line_A[li] == pytest.approx(A_dup)
    gl1 = ad.get_uniquelevelindex(0, 0, 1)
    s = ad.level_alltrans_start[gl1]
    down_targets = ad.trans_target[s : s + ad.level_ndowntrans[gl1]]
    k = int(np.nonzero(down_targets == 0)[0][0])
    assert ad.trans_A[s + k] == pytest.approx(2 * A_dup)
