"""Recombination-rate calibration from ``recombrates.txt``.

TPU-native rebuild of the reference's read_recombrate_file
(ratecoeff.cc:513-653): when a run directory provides tabulated radiative
recombination coefficients per (Z, upper ionstage), the photoionisation
cross sections of the lower ion's levels are scaled so that the LTE
recombination coefficient at RECOMBCALIBRATION_T_ELEC matches the table —
first all ionising levels toward the low-n value (skipped when the
multiplier falls outside [0.05, 2), ratecoeff.cc:585-589), then a top-up
toward the total: superlevel rows only when a superlevel boundary is known
(ratecoeff.cc:605-618), otherwise every level (ratecoeff.cc:620-628).

Runs on the host AtomicData (numpy) BEFORE the rate-coefficient LUTs are
built, so every downstream table (alpha_sp, bfheating, bfcooling,
corrphotoion, transport chi_bf) sees the calibrated cross sections.
"""

from __future__ import annotations

import os

import numpy as np

from ..constants import FOURPI, HOVERKB, KB, SAHACONST, TWOOVERCLIGHTSQUARED


def _simpson_weights(n: int) -> np.ndarray:
    w = np.zeros(n)
    if n < 3:
        return np.ones(n) / max(n - 1, 1)
    m = n if n % 2 == 1 else n - 1
    w[0:m:2] += 1.0 / 3.0
    w[1:m:2] += 4.0 / 3.0
    w[2:m:2] += 1.0 / 3.0
    w[0] = 1.0 / 3.0
    w[m - 1] = 1.0 / 3.0
    if n % 2 == 0:
        w[n - 2] += 0.5
        w[n - 1] += 0.5
    return w


def _alpha_sp(ad, cont_idx: np.ndarray, t_e: float) -> np.ndarray:
    """alpha_sp per selected continuum at one temperature (the same Simpson
    integrand as plasma/ratecoeff.build_tables, ratecoeff.cc:343-405)."""
    nu_edge = ad.cont_nu_edge[cont_idx]
    lower_u = ad.ion_level_start[
        ad.elem_ion_start[ad.cont_element[cont_idx]] + ad.cont_ion[cont_idx]
    ] + ad.cont_level[cont_idx]
    upper_u = ad.ion_level_start[
        ad.elem_ion_start[ad.cont_element[cont_idx]] + ad.cont_ion[cont_idx] + 1
    ] + ad.cont_upperlevel[cont_idx]
    g_l = ad.level_g[lower_u]
    g_u = ad.level_g[upper_u]
    prob = ad.cont_probability[cont_idx]
    sigma = np.asarray(ad.allphixs, np.float64)[ad.cont_phixsrow[cont_idx]]

    npts = ad.nphixspoints
    kgrid = 1.0 + ad.nphixsnuincrement * np.arange(npts)
    nu = nu_edge[:, None] * kgrid[None, :]
    dnu = nu_edge * ad.nphixsnuincrement
    w = _simpson_weights(npts)
    expfac = np.exp(-HOVERKB * (nu - nu_edge[:, None]) / t_e)
    integ = np.sum(
        w[None, :] * sigma * TWOOVERCLIGHTSQUARED * nu**2 * expfac, axis=1
    ) * dnu
    return FOURPI * SAHACONST * (g_l / g_u) * t_e**-1.5 * prob * integ


def _ion_rrc(ad, element: int, lowerion: int, t_e: float,
             only_levels_from: int | None = None) -> float:
    """LTE radiative recombination coefficient of upperion -> lowerion,
    weighted per ground-multiplet population of the upper ion
    (ratecoeff.cc:973-1070 calculate_ionrecombcoeff with assume_lte,
    per_groundmultipletpop)."""
    uii_low = int(ad.elem_ion_start[element] + lowerion)
    uii_up = uii_low + 1
    ls_up = int(ad.ion_level_start[uii_up])
    e_up = ad.level_energy[ls_up: ls_up + int(ad.ion_nlevels[uii_up])]
    g_up = ad.level_g[ls_up: ls_up + int(ad.ion_nlevels[uii_up])]
    boltz = g_up / g_up[0] * np.exp(-(e_up - e_up[0]) / KB / t_e)
    ngt = max(int(ad.ion_nlevels_groundterm[uii_up]), 1)
    nnupperion = float(np.sum(boltz[:ngt]))
    if nnupperion <= 0:
        return 0.0

    sel = np.nonzero(
        (ad.cont_element == element) & (ad.cont_ion == lowerion)
        & (ad.cont_level >= (only_levels_from or 0))
    )[0]
    if len(sel) == 0:
        return 0.0
    alpha = _alpha_sp(ad, sel, t_e)
    w_up = boltz[np.minimum(ad.cont_upperlevel[sel], len(boltz) - 1)]
    return float(np.sum(alpha * w_up) / nnupperion)


def _scale_levels(ad, element: int, lowerion: int, factor: float,
                  level_from: int = 0) -> None:
    """Multiply the phixs tables of the lower ion's levels >= level_from
    (ratecoeff.cc:481-510 scale_level_phixs — targets share one table, so
    each row is scaled once)."""
    uii = int(ad.elem_ion_start[element] + lowerion)
    ls = int(ad.ion_level_start[uii])
    nion_lev = int(ad.ion_nionisinglevels[uii])
    rows = ad.level_phixsrow[ls + level_from: ls + nion_lev]
    rows = np.unique(rows[rows >= 0])
    ad.allphixs[rows] = (
        np.asarray(ad.allphixs[rows], np.float64) * factor
    ).astype(ad.allphixs.dtype)


def apply_recombrate_calibration(ad, rundir: str, t_elec: float = 6000.0,
                                 superlevel_first_level=None, log=print):
    """Read ``rundir/recombrates.txt`` (if present) and calibrate phixs.

    superlevel_first_level: optional callable (element, ion) -> first level
    index of the NLTE superlevel; when given, the total-RRC top-up scales
    only superlevel rows (the reference path, ratecoeff.cc:605-618).
    Returns True when a calibration was applied.
    """
    path = os.path.join(rundir, "recombrates.txt")
    if not os.path.exists(path):
        return False
    log(f"reading recombination rate file ({path}); "
        f"calibrating at T_e = {t_elec:.1f} K")
    log_te = np.log10(t_elec)

    with open(path) as f:
        tokens = f.read().split()
    pos = 0
    while pos + 3 <= len(tokens):
        z = int(tokens[pos]); upperionstage = int(tokens[pos + 1])
        nrows = int(tokens[pos + 2]); pos += 3
        rows = np.array(tokens[pos: pos + 3 * nrows], np.float64).reshape(nrows, 3)
        pos += 3 * nrows

        element = ad.get_elementindex(z)
        if element < 0:
            continue
        ion_stage0 = int(ad.ion_stage[ad.elem_ion_start[element]])
        upperion = upperionstage - ion_stage0
        if not (0 < upperion < int(ad.elem_nions[element])):
            continue
        lowerion = upperion - 1

        below = rows[rows[:, 0] < log_te]
        above = rows[rows[:, 0] > log_te]
        if len(below) == 0 or len(above) == 0:
            continue
        lo = below[np.argmax(below[:, 0])]
        hi = above[np.argmin(above[:, 0])]
        x = (log_te - lo[0]) / (hi[0] - lo[0])
        # reference interpolation (ratecoeff.cc:571-573) weights the LOWER
        # row by x — reproduced verbatim for output parity
        input_low_n = x * lo[1] + (1 - x) * hi[1]
        input_total = x * lo[2] + (1 - x) * hi[2]

        rrc = _ion_rrc(ad, element, lowerion, t_elec)
        if rrc <= 0:
            continue
        log(f"  Z={z} ionstage {upperionstage}->{upperionstage - 1}: "
            f"rrc {rrc:.3e} input_low_n {input_low_n:.3e} "
            f"input_total {input_total:.3e}")

        if input_low_n >= 0:
            mult = input_low_n / rrc
            if 0.05 <= mult < 2.0:
                _scale_levels(ad, element, lowerion, mult)
                rrc = _ion_rrc(ad, element, lowerion, t_elec)
                log(f"    scaled all levels by {mult:.3f} -> rrc {rrc:.3e}")
            else:
                log(f"    not scaling by {mult:.3f} (outside [0.05, 2))")

        sl_first = (superlevel_first_level(element, lowerion)
                    if superlevel_first_level else None)
        if rrc < input_total and sl_first is not None:
            rrc_sl = _ion_rrc(ad, element, lowerion, t_elec,
                              only_levels_from=sl_first)
            if rrc_sl > 0:
                mult = 1.0 + (input_total - rrc) / rrc_sl
                _scale_levels(ad, element, lowerion, mult, level_from=sl_first)
                log(f"    scaled superlevel (from level {sl_first}) by "
                    f"{mult:.3f}")
                continue
        mult = input_total / rrc
        if mult >= 0:
            _scale_levels(ad, element, lowerion, mult)
            rrc = _ion_rrc(ad, element, lowerion, t_elec)
            log(f"    scaled all levels by {mult:.3f} -> rrc {rrc:.3e}")
    return True
