"""Atomic dataset reader: compositiondata / adata / transitiondata / phixsdata.

TPU-native rebuild of the reference atomic-data input path (reference:
input.cc:912-1255 read_atomicdata_files, input.cc:335-370 read_ion_levels,
input.cc:372-456 read_ion_transitions, input.cc:458-606
add_transitions_to_unsorted_linelist, input.cc:86-226 read_phixs_data_table,
input.cc:608-910 ground-term/phixs-list setup).

Everything is parsed on the host into flat, offset-indexed NumPy arrays — the
same flattening the reference uses for its node-shared globals (globals.h:81-94
alltrans_startdown / phixsstart / allcont), which is exactly the layout a TPU
gather wants. Level indices in the input files are 1-based
(groundstate_index_in, input.cc:45).
"""

from __future__ import annotations

import dataclasses
import math
import os

import numpy as np

from ..constants import CLIGHT, EV, H, ME, PI, QE


@dataclasses.dataclass
class AtomicData:
    """Flat atomic dataset. 'unique' indices run over all elements' ions/levels."""

    # per element
    nelements: int
    elem_z: np.ndarray  # (nelements,)
    elem_nions: np.ndarray
    elem_ion_start: np.ndarray  # uniqueionindex of ion 0
    elem_meanweight_init: np.ndarray  # initstablemeannucmass [g]
    elem_abundance_uniform: np.ndarray  # unused legacy column

    # per ion (flat over elements)
    nions_total: int
    ion_element: np.ndarray
    ion_stage: np.ndarray
    ion_nlevels: np.ndarray
    ion_level_start: np.ndarray  # uniquelevelindex of level 0
    ion_ionpot: np.ndarray  # [erg]
    ion_nionisinglevels: np.ndarray
    ion_nlevels_groundterm: np.ndarray
    ion_groundcontindex: np.ndarray
    ion_maxrecombininglevel: np.ndarray

    # per level (flat)
    nlevels_total: int
    level_energy: np.ndarray  # epsilon [erg], incl. element energy offset
    level_g: np.ndarray  # statistical weight
    level_ndowntrans: np.ndarray
    level_nuptrans: np.ndarray
    level_alltrans_start: np.ndarray  # start of [down | up] block in alltrans
    level_nphixstargets: np.ndarray
    level_phixstargetstart: np.ndarray
    level_phixsrow: np.ndarray  # row into allphixs, -1 if none
    level_cont_index: np.ndarray  # -1 if no bf continuum
    level_closestgroundlevelcont: np.ndarray

    # all transitions: per level a block of ndowntrans entries then nuptrans
    ntrans_total: int
    trans_lineindex: np.ndarray  # index into the nu-sorted linelist
    trans_target: np.ndarray  # target level (within-ion index)
    trans_A: np.ndarray  # summed over duplicates
    trans_coll_str: np.ndarray
    trans_osc_strength: np.ndarray  # f_ul, summed over duplicates
    trans_forbidden: np.ndarray  # bool

    # linelist sorted by nu DESCENDING (reference: input.cc:1139-1146)
    nlines: int
    line_nu: np.ndarray  # [Hz]
    line_A: np.ndarray  # first-occurrence einstein A (reference semantics)
    line_element: np.ndarray
    line_ion: np.ndarray
    line_upper: np.ndarray  # within-ion level index
    line_lower: np.ndarray

    # photoionisation tables
    nphixspoints: int
    nphixsnuincrement: float
    last_phixs_nuovernuedge: float
    allphixs: np.ndarray  # (nbftables, nphixspoints) float32 [cm^2]
    phixstargets_prob: np.ndarray  # flat
    phixstargets_level: np.ndarray  # flat (upper-ion level index)

    # bound-free continua sorted by nu_edge ascending (reference: input.cc:785)
    nbfcontinua: int
    cont_nu_edge: np.ndarray
    cont_element: np.ndarray
    cont_ion: np.ndarray
    cont_level: np.ndarray  # within-ion level index
    cont_phixstargetindex: np.ndarray
    cont_probability: np.ndarray
    cont_upperlevel: np.ndarray
    cont_phixsrow: np.ndarray
    cont_index_in_groundphixslist: np.ndarray

    # ground-level continua sorted by nu_edge
    nbfcontinua_ground: int
    groundcont_nu_edge: np.ndarray
    groundcont_element: np.ndarray
    groundcont_ion: np.ndarray

    def get_elementindex(self, z: int) -> int:
        idx = np.nonzero(self.elem_z == z)[0]
        return int(idx[0]) if len(idx) else -100

    def get_uniqueionindex(self, element: int, ion: int) -> int:
        return int(self.elem_ion_start[element]) + ion

    def get_uniquelevelindex(self, element: int, ion: int, level: int) -> int:
        return int(self.ion_level_start[self.get_uniqueionindex(element, ion)]) + level

    def get_nlevels(self, element: int, ion: int) -> int:
        return int(self.ion_nlevels[self.get_uniqueionindex(element, ion)])

    def epsilon(self, element: int, ion: int, level: int) -> float:
        return float(self.level_energy[self.get_uniquelevelindex(element, ion, level)])

    def stat_weight(self, element: int, ion: int, level: int) -> float:
        return float(self.level_g[self.get_uniquelevelindex(element, ion, level)])

    @property
    def max_nions(self) -> int:
        return int(self.elem_nions.max())

    @property
    def max_nlevels(self) -> int:
        return int(self.ion_nlevels.max())


def _noncomment_lines_iter(path):
    with open(path) as f:
        for line in f:
            s = line.strip()
            if s and not s.startswith("#"):
                yield s


@dataclasses.dataclass
class _CompositionRow:
    z: int
    nions: int
    lowermost_ionstage: int
    uppermost_ionstage: int
    nlevelsmax: int
    abundance: float
    mass_amu: float


def read_composition(path: str) -> list[_CompositionRow]:
    """(reference: input.cc:923-966)"""
    it = _noncomment_lines_iter(path)
    nelements = int(next(it).split()[0])
    t_preset = int(next(it).split()[0])
    homogeneous = int(next(it).split()[0])
    assert t_preset == 0 and homogeneous == 0
    rows = []
    for _ in range(nelements):
        t = next(it).split()
        rows.append(
            _CompositionRow(
                z=int(t[0]), nions=int(t[1]), lowermost_ionstage=int(t[2]),
                uppermost_ionstage=int(t[3]), nlevelsmax=int(t[4]),
                abundance=float(t[5]), mass_amu=float(t[6]),
            )
        )
        assert rows[-1].nions == 0 or (
            rows[-1].nions == rows[-1].uppermost_ionstage - rows[-1].lowermost_ionstage + 1
        )
    return rows


class _AdataReader:
    """Sequential reader over adata.txt ion blocks (reference: input.cc:989-1014)."""

    def __init__(self, path: str):
        self.lines = open(path).read().splitlines()
        self.pos = 0

    def _next_noncomment(self):
        while self.pos < len(self.lines):
            s = self.lines[self.pos].strip()
            self.pos += 1
            if s and not s.startswith("#"):
                return s
        raise EOFError("adata.txt exhausted")

    def next_header(self):
        s = self._next_noncomment()
        t = s.split()
        return int(t[0]), int(t[1]), int(t[2]), float(t[3])  # Z, ionstage, nlevels, ionpot_ev

    def read_levels(self, nlevels):
        energies = np.empty(nlevels)
        gs = np.empty(nlevels)
        for i in range(nlevels):
            t = self._next_noncomment().split()
            assert int(t[0]) == i + 1, f"adata level index {t[0]} != {i + 1}"
            energies[i] = float(t[1])
            gs[i] = float(t[2])
        return energies, gs


class _TransReader:
    """Sequential reader over transitiondata.txt ion blocks
    (reference: input.cc:1042-1053, 372-456)."""

    def __init__(self, path: str):
        self.lines = open(path).read().splitlines()
        self.pos = 0

    def _next_noncomment(self):
        while self.pos < len(self.lines):
            s = self.lines[self.pos].strip()
            self.pos += 1
            if s and not s.startswith("#"):
                return s
        raise EOFError("transitiondata.txt exhausted")

    def seek_block(self, z, ionstage):
        tz, tstage, ntrans = -1, -1, 0
        while tz != z or tstage != ionstage:
            for _ in range(ntrans):
                self.pos += 1  # skip table rows (raw getline in reference)
            t = self._next_noncomment().split()
            tz, tstage, ntrans = int(t[0]), int(t[1]), int(t[2])
        return ntrans

    def read_transitions(self, ntrans_in_file):
        """Returns arrays (lower, upper, A, coll_str, forbidden), 0-based levels."""
        lower = np.empty(ntrans_in_file, dtype=np.int64)
        upper = np.empty(ntrans_in_file, dtype=np.int64)
        A = np.empty(ntrans_in_file)
        coll = np.full(ntrans_in_file, -1.0)
        forb = np.zeros(ntrans_in_file, dtype=bool)
        oldformat = None
        for i in range(ntrans_in_file):
            t = self.lines[self.pos].split()
            self.pos += 1
            if oldformat is None:
                assert len(t) in (4, 5), f"unexpected transition column count {len(t)}"
                oldformat = len(t) == 4
            if oldformat:
                lower[i] = int(t[1]) - 1
                upper[i] = int(t[2]) - 1
                A[i] = float(t[3])
            else:
                lower[i] = int(t[0]) - 1
                upper[i] = int(t[1]) - 1
                A[i] = float(t[2])
                coll[i] = float(t[3])
                forb[i] = int(t[4]) == 1
        return lower, upper, A, coll, forb

    def skip_transitions(self, ntrans_in_file):
        self.pos += ntrans_in_file


def _add_required_transitions(lower, upper, A, coll, forb, nlevels_requiretransitions, nlevelsmax):
    """Insert fake forbidden transitions so the first N levels are collisionally
    coupled to all levels (reference: input.cc:421-448)."""
    if nlevels_requiretransitions <= 0 or len(lower) == 0:
        return lower, upper, A, coll, forb
    upperlim = nlevelsmax  # nlevels_requiretransitions_upperlevels (input.cc:1092)
    out_l, out_u, out_A, out_c, out_f = [], [], [], [], []
    prev_lower, prev_upper = 0, -1
    for i in range(len(lower)):
        lo, up = int(lower[i]), int(upper[i])
        if prev_lower < nlevels_requiretransitions:
            if lo == prev_lower and up > prev_upper + 1:
                stoplevel = min(up - 1, upperlim - 1)
            elif lo > prev_lower and prev_upper < upperlim - 1:
                stoplevel = upperlim - 1
            else:
                stoplevel = -1
            for tmplevel in range(prev_upper + 1, stoplevel + 1):
                if tmplevel == prev_lower:
                    continue
                out_l.append(prev_lower)
                out_u.append(tmplevel)
                out_A.append(0.0)
                out_c.append(-2.0)
                out_f.append(True)
        out_l.append(lo)
        out_u.append(up)
        out_A.append(float(A[i]))
        out_c.append(float(coll[i]))
        out_f.append(bool(forb[i]))
        prev_lower, prev_upper = lo, up
    return (
        np.array(out_l, dtype=np.int64),
        np.array(out_u, dtype=np.int64),
        np.array(out_A),
        np.array(out_c),
        np.array(out_f, dtype=bool),
    )


def _calculate_nlevels_groundterm(energies: np.ndarray, gs: np.ndarray) -> int:
    """(reference: input.cc:608-647)"""
    nlevels = len(energies)
    if nlevels == 1:
        return 1
    nlevels_groundterm = 1
    endiff10 = energies[1] - energies[0]
    endiff21 = energies[2] - energies[1] if nlevels > 2 else 0.0
    if nlevels > 2 and not (endiff10 > 2.0 * endiff21):
        for level in range(1, nlevels - 2):
            endiff1 = energies[level] - energies[level - 1]
            endiff2 = energies[level + 1] - energies[level]
            if endiff2 > 2.0 * endiff1:
                nlevels_groundterm = level + 1
                break
    # no duplicate stat weights within the ground term
    for level_a in range(1, nlevels_groundterm):
        for level_b in range(level_a):
            if abs(gs[level_a] - gs[level_b]) < 0.4:
                return level_a
    return nlevels_groundterm


def read_atomicdata(
    folder: str,
    composition_rows=None,
    single_level_top_ion: bool = False,
    single_ground_level: bool = False,
    nlevels_requiretransitions=None,
) -> AtomicData:
    """Read the full atomic dataset from a run folder.

    nlevels_requiretransitions: callable (Z, ionstage) -> int or None
    (reference NLEVELS_REQUIRETRANSITIONS, artisoptions_kilonova_lte.h:29-31).
    """
    if composition_rows is None:
        composition_rows = read_composition(os.path.join(folder, "compositiondata.txt"))
    if nlevels_requiretransitions is None:
        def nlevels_requiretransitions(z, ionstage):
            return 80 if (z in (26, 28) and ionstage >= 1) else 0

    adata = _AdataReader(os.path.join(folder, "adata.txt"))
    tdata = _TransReader(os.path.join(folder, "transitiondata.txt"))

    nelements = len(composition_rows)
    elem_z = np.array([r.z for r in composition_rows], dtype=np.int32)
    elem_nions = np.array([r.nions for r in composition_rows], dtype=np.int32)
    elem_ion_start = np.concatenate([[0], np.cumsum(elem_nions)[:-1]]).astype(np.int32)
    nions_total = int(elem_nions.sum())

    ion_element = np.zeros(nions_total, dtype=np.int32)
    ion_stage = np.zeros(nions_total, dtype=np.int32)
    ion_nlevels = np.zeros(nions_total, dtype=np.int32)
    ion_ionpot = np.zeros(nions_total)
    ion_nionisinglevels = np.zeros(nions_total, dtype=np.int32)
    ion_nlevels_groundterm = np.zeros(nions_total, dtype=np.int32)

    level_energy_list = []
    level_g_list = []
    # per-ion transition tables (0-based in-ion level indices)
    ion_transitions = []

    uii = 0
    for element, row in enumerate(composition_rows):
        energyoffset = 0.0
        ionpot_ev = 0.0
        for ion in range(row.nions):
            ionstage_want = row.lowermost_ionstage + ion
            energyoffset += ionpot_ev
            # advance adata to matching ion block, accumulating skipped ionpots
            # of same-Z blocks (reference: input.cc:994-1014)
            z_in, stage_in, nlevels_in = -1, -1, 0
            while z_in != row.z or stage_in != ionstage_want:
                if z_in == row.z:
                    energyoffset += ionpot_ev
                if nlevels_in:
                    adata.pos += nlevels_in  # skip level rows (raw lines)
                z_in, stage_in, nlevels_in, ionpot_ev = adata.next_header()

            nlevelsmax = row.nlevelsmax
            if single_level_top_ion and ion == row.nions - 1:
                nlevelsmax = 1
            if nlevelsmax < 0 or nlevelsmax > nlevels_in:
                nlevelsmax = nlevels_in

            energies_ev, gs = adata.read_levels(nlevels_in)
            energies_ev = energies_ev[:nlevelsmax]
            gs = gs[:nlevelsmax]
            assert np.all(gs > 0)

            # ionising levels: energy below ionpot and not the top ion
            # (reference: input.cc:356-362)
            if ion < row.nions - 1:
                ion_nionisinglevels[uii] = int(np.sum(energies_ev < ionpot_ev))

            level_energy_list.append((energyoffset + energies_ev) * EV)
            level_g_list.append(gs)

            ntrans_in_file = tdata.seek_block(row.z, ionstage_want)
            if single_level_top_ion and ion == row.nions - 1:
                tdata.skip_transitions(ntrans_in_file)
                trans = (np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0),
                         np.zeros(0), np.zeros(0, bool))
            else:
                trans = tdata.read_transitions(ntrans_in_file)
                nreq = min(nlevelsmax, nlevels_requiretransitions(row.z, ionstage_want))
                trans = _add_required_transitions(*trans, nreq, nlevelsmax)
            ion_transitions.append(trans)

            ion_element[uii] = element
            ion_stage[uii] = ionstage_want
            ion_nlevels[uii] = nlevelsmax
            ion_ionpot[uii] = ionpot_ev * EV
            if single_ground_level:
                ion_nlevels_groundterm[uii] = 1
            else:
                ion_nlevels_groundterm[uii] = _calculate_nlevels_groundterm(energies_ev, gs)
            uii += 1

    ion_level_start = np.concatenate([[0], np.cumsum(ion_nlevels)[:-1]]).astype(np.int64)
    nlevels_total = int(ion_nlevels.sum())
    level_energy = np.concatenate(level_energy_list) if level_energy_list else np.zeros(0)
    level_g = np.concatenate(level_g_list) if level_g_list else np.zeros(0)

    # --- build the linelist and per-level transition blocks ---
    # (reference: input.cc:458-606 add_transitions_to_unsorted_linelist)
    lines_nu, lines_A, lines_el, lines_ion, lines_up, lines_lo = [], [], [], [], [], []
    # unique (summed) transitions per ion: dict (lower, upper) -> idx
    ion_uniq = []
    for uii in range(nions_total):
        element = ion_element[uii]
        nlevmax = int(ion_nlevels[uii])
        lstart = int(ion_level_start[uii])
        lower, upper, A, coll, forb = ion_transitions[uii]
        uniq: dict = {}
        ulo, uup, uA, ucoll, uf, uline = [], [], [], [], [], []
        for i in range(len(lower)):
            lo, up = int(lower[i]), int(upper[i])
            if lo >= nlevmax or up >= nlevmax:
                continue
            nu_trans = (level_energy[lstart + up] - level_energy[lstart + lo]) / H
            if not nu_trans > 0:
                continue
            g_ratio = level_g[lstart + up] / level_g[lstart + lo]
            f_ul = g_ratio * ME * CLIGHT**3 / (8 * (QE * nu_trans * PI) ** 2) * A[i]
            key = (lo, up)
            if key not in uniq:
                uniq[key] = len(ulo)
                ulo.append(lo)
                uup.append(up)
                uA.append(float(A[i]))
                ucoll.append(float(coll[i]))
                uf.append(bool(forb[i]))
                uline.append(len(lines_nu))
                # linelist keeps the FIRST occurrence's A (input.cc:528-535)
                lines_nu.append(nu_trans)
                lines_A.append(float(A[i]))
                lines_el.append(int(element))
                lines_ion.append(uii - int(elem_ion_start[element]))
                lines_up.append(up)
                lines_lo.append(lo)
            else:
                j = uniq[key]
                uA[j] += float(A[i])
                ucoll[j] = max(ucoll[j], float(coll[i]))
                # osc strength is recomputed from summed A below
        ion_uniq.append((np.array(ulo, np.int64), np.array(uup, np.int64), np.array(uA),
                         np.array(ucoll), np.array(uf, bool), np.array(uline, np.int64)))

    nlines = len(lines_nu)
    line_nu = np.array(lines_nu)
    line_A = np.array(lines_A)
    line_element = np.array(lines_el, dtype=np.int32)
    line_ion = np.array(lines_ion, dtype=np.int32)
    line_upper = np.array(lines_up, dtype=np.int32)
    line_lower = np.array(lines_lo, dtype=np.int32)

    # sort by nu descending, tie-break ascending on ids (input.cc:1139-1146)
    order = np.lexsort((line_A, line_upper, line_lower, line_ion, line_element, -line_nu))
    line_nu = line_nu[order]
    line_A = line_A[order]
    line_element = line_element[order]
    line_ion = line_ion[order]
    line_upper = line_upper[order]
    line_lower = line_lower[order]
    lineindex_of_unsorted = np.empty(nlines, dtype=np.int64)
    lineindex_of_unsorted[order] = np.arange(nlines)

    # per-level [down | up] blocks
    level_ndowntrans = np.zeros(nlevels_total, dtype=np.int32)
    level_nuptrans = np.zeros(nlevels_total, dtype=np.int32)
    for uii in range(nions_total):
        lstart = int(ion_level_start[uii])
        ulo, uup, uA, ucoll, uf, uline = ion_uniq[uii]
        np.add.at(level_ndowntrans, lstart + uup, 1)
        np.add.at(level_nuptrans, lstart + ulo, 1)

    level_alltrans_start = np.concatenate(
        [[0], np.cumsum(level_ndowntrans + level_nuptrans)[:-1]]
    ).astype(np.int64)
    ntrans_total = int((level_ndowntrans + level_nuptrans).sum())

    trans_lineindex = np.zeros(ntrans_total, dtype=np.int64)
    trans_target = np.zeros(ntrans_total, dtype=np.int32)
    trans_A = np.zeros(ntrans_total)
    trans_coll_str = np.zeros(ntrans_total)
    trans_osc_strength = np.zeros(ntrans_total)
    trans_forbidden = np.zeros(ntrans_total, dtype=bool)

    down_fill = np.zeros(nlevels_total, dtype=np.int64)
    up_fill = np.zeros(nlevels_total, dtype=np.int64)
    for uii in range(nions_total):
        lstart = int(ion_level_start[uii])
        ulo, uup, uA, ucoll, uf, uline = ion_uniq[uii]
        nu_trans = (level_energy[lstart + uup] - level_energy[lstart + ulo]) / H
        g_ratio = level_g[lstart + uup] / level_g[lstart + ulo]
        f_ul = g_ratio * ME * CLIGHT**3 / (8 * (QE * nu_trans * PI) ** 2) * uA
        sorted_line = lineindex_of_unsorted[uline]
        for k in range(len(ulo)):
            gup = lstart + int(uup[k])
            glo = lstart + int(ulo[k])
            di = level_alltrans_start[gup] + down_fill[gup]
            down_fill[gup] += 1
            trans_lineindex[di] = sorted_line[k]
            trans_target[di] = ulo[k]
            trans_A[di] = uA[k]
            trans_coll_str[di] = ucoll[k]
            trans_osc_strength[di] = f_ul[k]
            trans_forbidden[di] = uf[k]
            ui = level_alltrans_start[glo] + level_ndowntrans[glo] + up_fill[glo]
            up_fill[glo] += 1
            trans_lineindex[ui] = sorted_line[k]
            trans_target[ui] = uup[k]
            trans_A[ui] = uA[k]
            trans_coll_str[ui] = ucoll[k]
            trans_osc_strength[ui] = f_ul[k]
            trans_forbidden[ui] = uf[k]

    # --- photoionisation data ---
    (
        nphixspoints, nphixsnuincrement, last_nuovernuedge, allphixs,
        pt_prob, pt_level, level_nphixstargets, level_phixstargetstart,
        level_phixsrow,
    ) = _read_phixs(
        os.path.join(folder, "phixsdata_v2.txt"),
        elem_z, elem_nions, elem_ion_start, ion_stage, ion_nlevels,
        ion_nionisinglevels, ion_level_start, single_level_top_ion,
    )

    # cont_index per level (reference: input.cc:850-863)
    level_cont_index = np.full(nlevels_total, -1, dtype=np.int64)
    cont_index = 0
    for gl in range(nlevels_total):
        if level_nphixstargets[gl] > 0:
            level_cont_index[gl] = cont_index
            cont_index += int(level_nphixstargets[gl])
    nbfcontinua = cont_index

    # maxrecombininglevel per upper ion (reference: input.cc:151-161)
    ion_maxrecombininglevel = np.full(nions_total, -1, dtype=np.int32)
    for uii in range(nions_total):
        element = int(ion_element[uii])
        nions = int(elem_nions[element])
        ion = uii - int(elem_ion_start[element])
        if ion >= nions - 1:
            continue
        lstart = int(ion_level_start[uii])
        for lev in range(int(ion_nlevels[uii])):
            gl = lstart + lev
            n = int(level_nphixstargets[gl])
            if n > 0:
                s = int(level_phixstargetstart[gl])
                maxup = int(pt_level[s : s + n].max())
                ion_maxrecombininglevel[uii + 1] = max(ion_maxrecombininglevel[uii + 1], maxup)

    # --- ground-level continua and sorted allcont (reference: input.cc:703-822) ---
    gc_nu, gc_el, gc_ion = [], [], []
    for uii in range(nions_total):
        element = int(ion_element[uii])
        nions = int(elem_nions[element])
        ion = uii - int(elem_ion_start[element])
        if ion >= nions - 1:
            continue
        gl = int(ion_level_start[uii])  # ground level
        if level_nphixstargets[gl] == 0:
            continue
        s = int(level_phixstargetstart[gl])
        upperlevel0 = int(pt_level[s])
        e_thresh = level_energy[int(ion_level_start[uii + 1]) + upperlevel0] - level_energy[gl]
        gc_nu.append(e_thresh / H)
        gc_el.append(element)
        gc_ion.append(ion)
    gorder = np.argsort(np.array(gc_nu), kind="stable") if gc_nu else np.zeros(0, np.int64)
    groundcont_nu_edge = np.array(gc_nu)[gorder] if gc_nu else np.zeros(0)
    groundcont_element = np.array(gc_el, np.int32)[gorder] if gc_nu else np.zeros(0, np.int32)
    groundcont_ion = np.array(gc_ion, np.int32)[gorder] if gc_nu else np.zeros(0, np.int32)
    nbfcontinua_ground = len(groundcont_nu_edge)

    ion_groundcontindex = np.full(nions_total, -1, dtype=np.int32)
    for i in range(nbfcontinua_ground):
        uii = int(elem_ion_start[groundcont_element[i]]) + int(groundcont_ion[i])
        ion_groundcontindex[uii] = i

    c_nu, c_el, c_ion, c_lev, c_pti, c_prob, c_up, c_row, c_gidx = (
        [], [], [], [], [], [], [], [], []
    )
    level_closestgroundlevelcont = np.full(nlevels_total, -1, dtype=np.int64)
    for uii in range(nions_total):
        element = int(ion_element[uii])
        nions = int(elem_nions[element])
        ion = uii - int(elem_ion_start[element])
        if ion >= nions - 1:
            continue
        lstart = int(ion_level_start[uii])
        upstart = int(ion_level_start[uii + 1])
        for lev in range(int(ion_nionisinglevels[uii])):
            gl = lstart + lev
            n = int(level_nphixstargets[gl])
            if n == 0:
                continue
            s = int(level_phixstargetstart[gl])
            nu_edge0 = (level_energy[upstart + int(pt_level[s])] - level_energy[gl]) / H
            # closest ground continuum by nu_edge of target 0 (input.cc:649-698)
            gidx = -1
            if nbfcontinua_ground > 0 and nu_edge0 >= groundcont_nu_edge[0]:
                i = int(np.searchsorted(groundcont_nu_edge, nu_edge0, side="right"))
                if i >= nbfcontinua_ground:
                    gidx = nbfcontinua_ground - 1
                else:
                    left = nu_edge0 - groundcont_nu_edge[i - 1]
                    right = groundcont_nu_edge[i] - nu_edge0
                    gidx = i - 1 if left <= right else i
            level_closestgroundlevelcont[gl] = gidx
            for pti in range(n):
                upperlevel = int(pt_level[s + pti])
                nu_edge = (level_energy[upstart + upperlevel] - level_energy[gl]) / H
                c_nu.append(nu_edge)
                c_el.append(element)
                c_ion.append(ion)
                c_lev.append(lev)
                c_pti.append(pti)
                c_prob.append(float(pt_prob[s + pti]))
                c_up.append(upperlevel)
                c_row.append(int(level_phixsrow[gl]))
                c_gidx.append(gidx)

    assert len(c_nu) == nbfcontinua, f"{len(c_nu)} != {nbfcontinua}"
    corder = np.argsort(np.array(c_nu), kind="stable") if c_nu else np.zeros(0, np.int64)

    return AtomicData(
        nelements=nelements,
        elem_z=elem_z,
        elem_nions=elem_nions,
        elem_ion_start=elem_ion_start,
        elem_meanweight_init=np.array([r.mass_amu for r in composition_rows]) * 1.67352e-24,
        elem_abundance_uniform=np.array([r.abundance for r in composition_rows]),
        nions_total=nions_total,
        ion_element=ion_element,
        ion_stage=ion_stage,
        ion_nlevels=ion_nlevels,
        ion_level_start=ion_level_start,
        ion_ionpot=ion_ionpot,
        ion_nionisinglevels=ion_nionisinglevels,
        ion_nlevels_groundterm=ion_nlevels_groundterm,
        ion_groundcontindex=ion_groundcontindex,
        ion_maxrecombininglevel=ion_maxrecombininglevel,
        nlevels_total=nlevels_total,
        level_energy=level_energy,
        level_g=level_g,
        level_ndowntrans=level_ndowntrans,
        level_nuptrans=level_nuptrans,
        level_alltrans_start=level_alltrans_start,
        level_nphixstargets=level_nphixstargets,
        level_phixstargetstart=level_phixstargetstart,
        level_phixsrow=level_phixsrow,
        level_cont_index=level_cont_index,
        level_closestgroundlevelcont=level_closestgroundlevelcont,
        ntrans_total=ntrans_total,
        trans_lineindex=trans_lineindex,
        trans_target=trans_target,
        trans_A=trans_A,
        trans_coll_str=trans_coll_str,
        trans_osc_strength=trans_osc_strength,
        trans_forbidden=trans_forbidden,
        nlines=nlines,
        line_nu=line_nu,
        line_A=line_A,
        line_element=line_element,
        line_ion=line_ion,
        line_upper=line_upper,
        line_lower=line_lower,
        nphixspoints=nphixspoints,
        nphixsnuincrement=nphixsnuincrement,
        last_phixs_nuovernuedge=last_nuovernuedge,
        allphixs=allphixs,
        phixstargets_prob=pt_prob,
        phixstargets_level=pt_level,
        nbfcontinua=nbfcontinua,
        cont_nu_edge=np.array(c_nu)[corder] if c_nu else np.zeros(0),
        cont_element=np.array(c_el, np.int32)[corder] if c_nu else np.zeros(0, np.int32),
        cont_ion=np.array(c_ion, np.int32)[corder] if c_nu else np.zeros(0, np.int32),
        cont_level=np.array(c_lev, np.int32)[corder] if c_nu else np.zeros(0, np.int32),
        cont_phixstargetindex=np.array(c_pti, np.int32)[corder] if c_nu else np.zeros(0, np.int32),
        cont_probability=np.array(c_prob)[corder] if c_nu else np.zeros(0),
        cont_upperlevel=np.array(c_up, np.int32)[corder] if c_nu else np.zeros(0, np.int32),
        cont_phixsrow=np.array(c_row, np.int64)[corder] if c_nu else np.zeros(0, np.int64),
        cont_index_in_groundphixslist=np.array(c_gidx, np.int64)[corder]
        if c_nu
        else np.zeros(0, np.int64),
        nbfcontinua_ground=nbfcontinua_ground,
        groundcont_nu_edge=groundcont_nu_edge,
        groundcont_element=groundcont_element,
        groundcont_ion=groundcont_ion,
    )


def _read_phixs(
    path, elem_z, elem_nions, elem_ion_start, ion_stage, ion_nlevels,
    ion_nionisinglevels, ion_level_start, single_level_top_ion,
):
    """Parse phixsdata_v2.txt (reference: input.cc:228-327, 86-226).

    Format: NPHIXSPOINTS, NPHIXSNUINCREMENT, then per-table:
    'Z upperionstage upperlevel lowerionstage lowerlevel threshold_ev',
    a target table if upperlevel < 0, then NPHIXSPOINTS cross sections [Mb].
    """
    nlevels_total = int(ion_nlevels.sum())
    level_nphixstargets = np.zeros(nlevels_total, dtype=np.int32)
    level_phixstargetstart = np.full(nlevels_total, -1, dtype=np.int64)
    level_phixsrow = np.full(nlevels_total, -1, dtype=np.int64)
    pt_prob: list[float] = []
    pt_level: list[int] = []
    phixs_rows: list[np.ndarray] = []

    if not os.path.exists(path):
        return 100, 0.1, 1 + 0.1 * 99, np.zeros((0, 100), np.float32), \
            np.zeros(0), np.zeros(0, np.int32), level_nphixstargets, \
            level_phixstargetstart, level_phixsrow

    toks = open(path).read().split()
    pos = 0

    def next_tok():
        nonlocal pos
        t = toks[pos]
        pos += 1
        return t

    nphixspoints = int(next_tok())
    nphixsnuincrement = float(next_tok())
    last_nuovernuedge = 1.0 + nphixsnuincrement * (nphixspoints - 1)

    zindex = {int(z): i for i, z in enumerate(elem_z)}

    while pos < len(toks):
        Z = int(next_tok())
        upperionstage = int(next_tok())
        upperlevel_in = int(next_tok())
        lowerionstage = int(next_tok())
        lowerlevel_in = int(next_tok())
        _threshold_ev = float(next_tok())

        element = zindex.get(Z, -1)
        keep = False
        if element >= 0 and elem_nions[element] > 0:
            stage0 = int(ion_stage[elem_ion_start[element]])
            upperion = upperionstage - stage0
            lowerion = lowerionstage - stage0
            lowerlevel = lowerlevel_in - 1
            nions = int(elem_nions[element])
            if (
                lowerion >= 0
                and upperion < nions
                and lowerlevel < int(ion_nionisinglevels[elem_ion_start[element] + lowerion])
            ):
                keep = True

        ntargets_in = 1
        targets = []
        if upperlevel_in < 0:
            ntargets_in = int(next_tok())
            for _ in range(ntargets_in):
                ul = int(next_tok())
                prob = float(next_tok())
                targets.append((ul - 1, prob))
        else:
            targets.append((upperlevel_in - 1, 1.0))

        xs = np.empty(nphixspoints, dtype=np.float32)
        for i in range(nphixspoints):
            xs[i] = float(next_tok())

        if not keep:
            continue

        gl = int(ion_level_start[elem_ion_start[element] + lowerion]) + lowerlevel
        assert level_phixstargetstart[gl] == -1, "duplicate phixs table"
        level_phixstargetstart[gl] = len(pt_prob)
        if single_level_top_ion and upperion == int(elem_nions[element]) - 1:
            # send everything to the single top-ion level (input.cc:100-143)
            level_nphixstargets[gl] = 1
            pt_prob.append(1.0)
            pt_level.append(0)
        else:
            level_nphixstargets[gl] = len(targets)
            for ul, prob in targets:
                pt_prob.append(prob)
                pt_level.append(ul)
        level_phixsrow[gl] = len(phixs_rows)
        phixs_rows.append(xs * 1e-18)  # Mb -> cm^2

    allphixs = (
        np.stack(phixs_rows) if phixs_rows else np.zeros((0, nphixspoints), np.float32)
    )
    return (
        nphixspoints, nphixsnuincrement, last_nuovernuedge, allphixs,
        np.array(pt_prob), np.array(pt_level, np.int32),
        level_nphixstargets, level_phixstargetstart, level_phixsrow,
    )
