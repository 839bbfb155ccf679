"""Gamma-ray line lists per nuclide (reference: gammapkt.cc:59-207).

Reads `<elname><A>_lines.txt` files (e.g. ni56_lines.txt), sets each nuclide's
average gamma energy per decay, and builds padded per-nuclide sampling tables
plus the energy-sorted global gamma line list.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

from ..constants import MEV
from .model import ELSYMBOLS


@dataclasses.dataclass
class GammaData:
    """Padded per-nuclide gamma spectra for batched sampling."""

    # padded tables (num_nuclides, maxlines)
    line_energy: np.ndarray  # [erg], 0 padded
    line_prob: np.ndarray  # per-decay emission probability
    line_cumfrac: np.ndarray  # cumulative prob*energy / E_gamma_avg, padded with 1+eps
    nuc_nlines: np.ndarray  # (num_nuclides,)

    # energy-ascending global list (reference: gammapkt.cc:158-192)
    sorted_energy: np.ndarray  # (total_lines,)
    sorted_nucindex: np.ndarray
    sorted_nucgammaindex: np.ndarray

    @property
    def maxlines(self) -> int:
        return self.line_energy.shape[1]


def _read_spectrum_file(path: str):
    toks = open(path).read().split()
    nlines = int(toks[0])
    vals = np.array([float(t) for t in toks[1 : 1 + 2 * nlines]]).reshape(nlines, 2)
    energy = vals[:, 0] * MEV
    prob = vals[:, 1]
    return energy, prob


def init_gamma_data(decdata, folder: str = ".", datadir: str | None = None) -> GammaData:
    """Load gamma spectra for every nuclide (reference: gammapkt.cc:95-207).

    Mutates decdata's endecay_gamma to the spectrum-averaged values, exactly as
    the reference's read_gamma_spectrum does (gammapkt.cc:82).
    """
    nnuc = decdata.num_nuclides
    spectra_e: list[np.ndarray] = [np.zeros(0)] * nnuc
    spectra_p: list[np.ndarray] = [np.zeros(0)] * nnuc

    for nucindex in range(nnuc):
        z = int(decdata.nuc_z[nucindex])
        a = int(decdata.nuc_a[nucindex])
        if z < 1:
            continue
        fname = f"{ELSYMBOLS[z].lower()}{a}_lines.txt"
        candidates = [os.path.join(folder, fname)]
        if datadir:
            candidates.append(os.path.join(datadir, fname))
        candidates.append(os.path.join(folder, "data", fname))
        path = next((p for p in candidates if os.path.exists(p)), None)
        if path is not None:
            energy, prob = _read_spectrum_file(path)
            spectra_e[nucindex] = energy
            spectra_p[nucindex] = prob
            decdata.set_nucdecayenergygamma(nucindex, float(np.sum(energy * prob)))
        elif decdata.nuc_endecay_gamma[nucindex] > 0:
            # single trivial line carrying the whole gamma energy
            # (reference: gammapkt.cc:87-93)
            spectra_e[nucindex] = np.array([decdata.nuc_endecay_gamma[nucindex]])
            spectra_p[nucindex] = np.array([1.0])

    # Fe52/Mn52 special average energies set AFTER spectra (gammapkt.cc:149-154)
    for (z, a), en in (((26, 52), 0.86 * MEV), ((25, 52), 3.415 * MEV)):
        idx = decdata.get_nucindex(z, a)
        if idx >= 0:
            decdata.set_nucdecayenergygamma(idx, en)
            if len(spectra_e[idx]) == 0:
                spectra_e[idx] = np.array([en])
                spectra_p[idx] = np.array([1.0])

    maxlines = max(1, max(len(e) for e in spectra_e))
    line_energy = np.zeros((nnuc, maxlines))
    line_prob = np.zeros((nnuc, maxlines))
    line_cumfrac = np.full((nnuc, maxlines), 2.0)  # padded beyond 1
    nuc_nlines = np.zeros(nnuc, dtype=np.int32)
    for i in range(nnuc):
        n = len(spectra_e[i])
        nuc_nlines[i] = n
        if n == 0:
            continue
        line_energy[i, :n] = spectra_e[i]
        line_prob[i, :n] = spectra_p[i]
        e_avg = decdata.nuc_endecay_gamma[i]
        if e_avg > 0:
            cum = np.cumsum(spectra_p[i] * spectra_e[i]) / e_avg
            line_cumfrac[i, :n] = cum

    # energy-sorted global list
    all_nuc, all_idx, all_e = [], [], []
    for i in range(nnuc):
        for j in range(nuc_nlines[i]):
            all_nuc.append(i)
            all_idx.append(j)
            all_e.append(line_energy[i, j])
    order = np.lexsort((all_idx, all_nuc, all_e)) if all_e else np.zeros(0, np.int64)

    return GammaData(
        line_energy=line_energy,
        line_prob=line_prob,
        line_cumfrac=line_cumfrac,
        nuc_nlines=nuc_nlines,
        sorted_energy=np.array(all_e)[order] if all_e else np.zeros(0),
        sorted_nucindex=np.array(all_nuc, np.int32)[order] if all_e else np.zeros(0, np.int32),
        sorted_nucgammaindex=np.array(all_idx, np.int32)[order] if all_e else np.zeros(0, np.int32),
    )


def read_xcom_photoion(path: str, elem_z) -> tuple:
    """Padded per-element XCOM photoionisation tables for the run's elements
    (reference: gammapkt.cc:209-256 init_xcom_photoion_data).

    Returns (energies, sigmas, lengths): (nelem, L) arrays; energy in MeV,
    sigma in barns/atom. Missing elements get length 0.
    """
    import numpy as np

    byz: dict = {}
    with open(path) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            parts = line.split()
            z = int(parts[0])
            byz.setdefault(z, []).append((float(parts[1]), float(parts[2])))
    maxlen = max((len(byz.get(int(z), [])) for z in elem_z), default=1) or 1
    nelem = len(elem_z)
    energies = np.full((nelem, maxlen), 1e99)
    sigmas = np.full((nelem, maxlen), 1e-99)
    lengths = np.zeros(nelem, np.int32)
    for i, z in enumerate(elem_z):
        rows = byz.get(int(z), [])
        lengths[i] = len(rows)
        for j, (e, sg) in enumerate(rows):
            energies[i, j] = e
            sigmas[i, j] = max(sg, 1e-99)
    return energies, sigmas, lengths
