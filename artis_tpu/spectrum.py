"""Spectra and light curves from escaped packets.

TPU-native rebuild of the reference post-processing (reference:
spectrum_lightcurve.cc:481-536 init_spectra, 186-246 add_to_spec, 638-670
add_to_lc_res, 345-418 write_spectrum, 606-631 write_light_curve;
exspec.cc:28-151 do_angle_bin). Binning is vectorised host-side NumPy
histogramming over the escaped-packet arrays — the reference's per-packet
atomicadds become np.add.at scatter adds.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

from .constants import CLIGHTSQUARED, CLIGHT_PROP, DAY, LSUN, PARSEC, PI

MNUBINS = 1000  # reference: exspec.h:5


@dataclasses.dataclass
class Spectra:
    """Log-nu-binned flux per timestep (reference: spectrum_lightcurve.h:11-21)."""

    nu_min: float
    nu_max: float
    ntimesteps: int
    flux: np.ndarray  # (ntimesteps, MNUBINS) [erg/s/cm2/Hz at 1 Mpc]
    lower_freq: np.ndarray
    delta_freq: np.ndarray
    do_emission_res: bool = False
    emission: np.ndarray | None = None  # (ntimesteps, MNUBINS, proccount)
    trueemission: np.ndarray | None = None
    absorption: np.ndarray | None = None  # (ntimesteps, MNUBINS, ioncount)


def init_spectra(nu_min: float, nu_max: float, ntimesteps: int,
                 do_emission_res: bool = False, proccount: int = 0, ioncount: int = 0) -> Spectra:
    dlognu = (math.log(nu_max) - math.log(nu_min)) / MNUBINS
    lower = np.exp(math.log(nu_min) + np.arange(MNUBINS) * dlognu)
    upper = np.exp(math.log(nu_min) + (np.arange(MNUBINS) + 1) * dlognu)
    return Spectra(
        nu_min=nu_min,
        nu_max=nu_max,
        ntimesteps=ntimesteps,
        flux=np.zeros((ntimesteps, MNUBINS)),
        lower_freq=lower,
        delta_freq=upper - lower,
        do_emission_res=do_emission_res,
        emission=np.zeros((ntimesteps, MNUBINS, proccount)) if do_emission_res else None,
        trueemission=np.zeros((ntimesteps, MNUBINS, proccount)) if do_emission_res else None,
        absorption=np.zeros((ntimesteps, MNUBINS, ioncount)) if do_emission_res else None,
    )


def get_timestep_index(time, ts_start, tmax):
    """Timestep containing each arrival time (reference: sn3d.h:235-247)."""
    edges = np.concatenate([ts_start, [tmax]])
    return np.clip(np.searchsorted(edges, time, side="right") - 1, 0, len(ts_start) - 1)


def arrive_time(pos, dirvec, escape_time):
    return escape_time - np.sum(pos * dirvec, axis=-1) / CLIGHT_PROP


def add_packets_to_spectra(
    spec: Spectra,
    pos, dirvec, escape_time, nu_rf, e_rf,
    ts_start, tmin, tmax, nprocs: int = 1,
    anglefactor: float = 1.0,
    emissiontype=None, trueemissiontype=None,
    emission_column=None,
    absorptiontype=None, absorptionfreq=None, absorption_column=None,
    weight=None,
):
    """Bin escaped r-packets into the flux grid with optional per-process
    emission / per-ion absorption attribution and an optional per-packet
    weight (a Stokes component) (reference: spectrum_lightcurve.cc:186-303
    add_to_spec)."""
    t_arr = arrive_time(pos, dirvec, escape_time)
    keep = (t_arr > tmin) & (t_arr < tmax) & (nu_rf > spec.nu_min) & (nu_rf < spec.nu_max)
    if not np.any(keep):
        return
    t_arr = t_arr[keep]
    nu = nu_rf[keep]
    e = e_rf[keep]
    w = weight[keep] if weight is not None else 1.0
    nts = get_timestep_index(t_arr, ts_start, tmax)
    dlognu = (math.log(spec.nu_max) - math.log(spec.nu_min)) / MNUBINS
    nnu = np.minimum(((np.log(nu) - math.log(spec.nu_min)) / dlognu).astype(np.int64), MNUBINS - 1)
    width_all = np.concatenate([np.diff(ts_start), [tmax - ts_start[-1]]])
    width = width_all[nts]
    norm = e / width / 4.0e12 / PI / PARSEC / PARSEC / nprocs * anglefactor * w
    delta_e = norm / spec.delta_freq[nnu]
    np.add.at(spec.flux, (nts, nnu), delta_e)
    if spec.do_emission_res and emission_column is not None:
        if emissiontype is not None:
            col = emission_column(emissiontype[keep])
            ok = col >= 0
            np.add.at(spec.emission, (nts[ok], nnu[ok], col[ok]), delta_e[ok])
        if trueemissiontype is not None:
            col = emission_column(trueemissiontype[keep])
            ok = col >= 0
            np.add.at(spec.trueemission, (nts[ok], nnu[ok], col[ok]), delta_e[ok])
        if absorptiontype is not None and absorptionfreq is not None:
            # absorption binned at the last-absorption frequency
            # (spectrum_lightcurve.cc:262-303)
            afreq = absorptionfreq[keep]
            at = absorptiontype[keep]
            good = (afreq > 0) & np.isfinite(afreq) & (at >= 0)
            nnu_abs = np.floor(
                (np.log(np.where(good, afreq, spec.nu_min)) - math.log(spec.nu_min)) / dlognu
            ).astype(np.int64)
            good &= (nnu_abs >= 0) & (nnu_abs < MNUBINS)
            if np.any(good):
                ioncol = absorption_column(at[good])
                de_abs = norm[good] / spec.delta_freq[nnu_abs[good]]
                np.add.at(spec.absorption, (nts[good], nnu_abs[good], ioncol), de_abs)


def add_packets_to_lightcurve(
    lum, lumcmf, pos, dirvec, escape_time, e_rf, e_cmf,
    ts_start, tmin, tmax, vmax, nprocs: int = 1,
):
    """Bolometric light curve binning (reference: spectrum_lightcurve.cc:638-670)."""
    width = np.concatenate([np.diff(ts_start), [tmax - ts_start[-1]]])
    t_arr = arrive_time(pos, dirvec, escape_time)
    keep = (t_arr > tmin) & (t_arr < tmax)
    nts = get_timestep_index(t_arr[keep], ts_start, tmax)
    np.add.at(lum, nts, e_rf[keep] / width[nts] / nprocs)

    inverse_gamma = math.sqrt(1.0 - vmax * vmax / CLIGHTSQUARED)
    t_arr_cmf = escape_time * inverse_gamma
    keep = (t_arr_cmf > tmin) & (t_arr_cmf < tmax)
    nts = get_timestep_index(t_arr_cmf[keep], ts_start, tmax)
    np.add.at(lumcmf, nts, e_cmf[keep] / width[nts] / nprocs / inverse_gamma)


def write_light_curve(path, ts_mid, lum, lumcmf, gamma_dep=None, cmf_lum_ts=None, width=None):
    """(reference: spectrum_lightcurve.cc:606-631)"""
    with open(path, "w") as f:
        for nts in range(len(lum)):
            f.write(f"{ts_mid[nts] / DAY:g} {lum[nts] / LSUN:g} {lumcmf[nts] / LSUN:g}\n")
        if gamma_dep is not None:
            for nts in range(len(lum)):
                f.write(
                    f"{ts_mid[nts] / DAY:g} {gamma_dep[nts] / LSUN / width[nts]:g} "
                    f"{cmf_lum_ts[nts] / width[nts] / LSUN:g}\n"
                )


def write_spectrum(path, spec: Spectra, ts_mid, numtimesteps=None,
                   emission_path=None, trueemission_path=None, absorption_path=None):
    """(reference: spectrum_lightcurve.cc:345-418)"""
    numtimesteps = numtimesteps if numtimesteps is not None else spec.ntimesteps
    em_f = open(emission_path, "w") if (emission_path and spec.do_emission_res) else None
    tem_f = open(trueemission_path, "w") if (trueemission_path and spec.do_emission_res) else None
    ab_f = open(absorption_path, "w") if (absorption_path and spec.do_emission_res) else None
    with open(path, "w") as f:
        f.write("0 " + " ".join(f"{t / DAY:g}" for t in ts_mid[:numtimesteps]) + " \n")
        for nnu in range(MNUBINS):
            nu_mid = spec.lower_freq[nnu] + spec.delta_freq[nnu] / 2
            row = " ".join(f"{spec.flux[nts, nnu]:g}" for nts in range(numtimesteps))
            f.write(f"{nu_mid:g} {row} \n")
            if em_f is not None:
                for nts in range(numtimesteps):
                    em_f.write(" ".join(f"{v:g}" for v in spec.emission[nts, nnu]) + " \n")
                    tem_f.write(" ".join(f"{v:g}" for v in spec.trueemission[nts, nnu]) + " \n")
                    ab_f.write(" ".join(f"{v:g}" for v in spec.absorption[nts, nnu]) + " \n")
    for fh in (em_f, tem_f, ab_f):
        if fh is not None:
            fh.close()


def write_specpol(path, stokes_i: Spectra, stokes_q: Spectra, stokes_u: Spectra,
                  ts_mid, emission_path=None, absorption_path=None):
    """specpol.out layout: header row of timestep mid-days repeated for I,Q,U;
    then per frequency bin the three Stokes flux rows concatenated
    (reference: spectrum_lightcurve.cc:419-478 write_specpol)."""
    ntimesteps = stokes_i.ntimesteps
    do_em = stokes_i.do_emission_res and emission_path is not None
    em_f = open(emission_path, "w") if do_em else None
    ab_f = open(absorption_path, "w") if do_em else None
    with open(path, "w") as f:
        header = " ".join(f"{t / DAY:g}" for t in ts_mid[:ntimesteps])
        f.write(f"0 {header} {header} {header} \n")
        for nnu in range(MNUBINS):
            nu_mid = stokes_i.lower_freq[nnu] + stokes_i.delta_freq[nnu] / 2
            f.write(f"{nu_mid:g} ")
            for sp in (stokes_i, stokes_q, stokes_u):
                f.write(" ".join(f"{sp.flux[nts, nnu]:g}" for nts in range(ntimesteps)) + " ")
                if do_em:
                    for nts in range(ntimesteps):
                        em_f.write(" ".join(f"{v:g}" for v in sp.emission[nts, nnu]) + " \n")
                        ab_f.write(" ".join(f"{v:g}" for v in sp.absorption[nts, nnu]) + " \n")
            f.write("\n")
    for fh in (em_f, ab_f):
        if fh is not None:
            fh.close()
