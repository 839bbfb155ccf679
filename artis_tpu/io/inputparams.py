"""`input.txt` runtime-parameter parsing and the timestep grid.

TPU-native rebuild of the reference parameter reader
(reference: input.cc:1576-1767 read_parameterfile, input.cc:1844-1978
time_init, input.cc:1770-1841 update_parameterfile). The file is a fixed
sequence of non-comment lines; several legacy lines are parsed and ignored,
exactly as in the reference.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

from ..constants import CLIGHT, DAY
from ..options import TimeStepSizeMethod

# canonical per-line comments written back out on restart
# (reference: input.cc inputlinecomments)
INPUT_LINE_COMMENTS = (
    "pre_zseed: specific random number seed if > 0 or random if negative",
    "globals::ntimesteps: number of timesteps",
    "timestep_start timestep_finish: number of start and end time step",
    "tmin_days tmax_days: start and end times [day]",
    "UNUSED nusyn_min_mev nusyn_max_mev",
    "UNUSED nsyn_time: number of times for synthesis",
    "UNUSED start and end times for synthesis",
    "UNUSED model dimensions",
    "UNUSED compute r-light curve",
    "UNUSED n_out_it: number of iterations",
    "UNUSED change speed of light by some factor",
    "use grey opacity for gammas?",
    "UNUSED syn_dir: x, y, and z components of unit vector",
    "opacity_case: opacity choice",
    "rho_crit_para: free parameter for calculation of rho_crit",
    "UNUSED debug_packet",
    "simulation_continued_from_saved: (0: new simulation, 1: continue)",
    "UNUSED rfcut_angstroms",
    "num_lte_timesteps",
    "cell_is_optically_thick num_grey_timesteps",
    "UNUSED max_bf_continua",
    "nprocs_exspec: extract spectra for n MPI tasks",
    "do_emission_res: Extract line-of-sight dependent emission info",
    "kpktdiffusion_timescale n_kpktdiffusion_timesteps",
)


@dataclasses.dataclass
class InputParams:
    pre_zseed: int = -1
    ntimesteps: int = 0
    timestep_start: int = 0
    timestep_finish: int = 0
    tmin: float = 0.0  # [s]
    tmax: float = 0.0  # [s]
    gamma_kappagrey: float = -1.0  # <0: detailed gamma transport
    opacity_case: int = 0
    rho_crit_para: float = 1.0
    simulation_continued_from_saved: bool = False
    nu_rfcut: float = 0.0
    num_lte_timesteps: int = 0
    cell_is_optically_thick: float = 0.0
    num_grey_timesteps: int = 0
    nprocs_exspec: int = 1
    do_emission_res: bool = True
    kpktdiffusion_timescale: float = 0.0
    n_kpktdiffusion_timesteps: int = 0


def _noncomment_lines(path: str):
    with open(path) as f:
        for line in f:
            stripped = line.strip()
            if stripped and not stripped.startswith("#"):
                yield line


def read_parameterfile(path: str) -> InputParams:
    """Parse input.txt (reference: input.cc:1576-1767)."""
    it = _noncomment_lines(path)

    def nxt():
        return next(it)

    p = InputParams()
    p.pre_zseed = int(nxt().split()[0])
    p.ntimesteps = int(nxt().split()[0])
    assert p.ntimesteps > 0
    ts = nxt().split()
    p.timestep_start, p.timestep_finish = int(ts[0]), int(ts[1])
    assert p.timestep_start < p.ntimesteps
    assert p.timestep_start <= p.timestep_finish <= p.ntimesteps
    tmm = nxt().split()
    tmin_days, tmax_days = float(tmm[0]), float(tmm[1])
    assert 0 < tmin_days < tmax_days
    p.tmin, p.tmax = tmin_days * DAY, tmax_days * DAY
    nxt()  # UNUSED nusyn range
    nxt()  # UNUSED nsyn_time
    nxt()  # UNUSED syn times
    nxt()  # UNUSED model dimensions
    nxt()  # UNUSED r-light curve
    nxt()  # UNUSED n_out_it
    nxt()  # UNUSED CLIGHT factor
    p.gamma_kappagrey = float(nxt().split()[0])
    nxt()  # UNUSED syn_dir
    p.opacity_case = int(nxt().split()[0])
    p.rho_crit_para = float(nxt().split()[0])
    nxt()  # UNUSED debug_packet (must be -1 in reference)
    continue_flag = int(nxt().split()[0])
    p.simulation_continued_from_saved = continue_flag == 1 and p.timestep_start != 0
    rfcut_angstroms = float(nxt().split()[0])
    p.nu_rfcut = CLIGHT / (rfcut_angstroms * 1e-8)
    p.num_lte_timesteps = int(nxt().split()[0])
    grey = nxt().split()
    p.cell_is_optically_thick = float(grey[0])
    p.num_grey_timesteps = int(grey[1])
    nxt()  # UNUSED max_bf_continua
    p.nprocs_exspec = int(nxt().split()[0])
    p.do_emission_res = int(nxt().split()[0]) != 0
    kd = nxt().split()
    p.kpktdiffusion_timescale = float(kd[0])
    p.n_kpktdiffusion_timesteps = int(kd[1])
    return p


def update_parameterfile(path: str, nts: int, timestep_finish: int, nprocs: int) -> None:
    """Rewrite input.txt so the run resumes from timestep ``nts``
    (reference: input.cc:1770-1841)."""
    with open(path) as f:
        lines = f.readlines()
    out = []
    noncomment_linenum = -1
    for line in lines:
        stripped = line.strip()
        if stripped and not stripped.startswith("#"):
            noncomment_linenum += 1
            content = line.split("#")[0].rstrip()
            if nts >= 0 and noncomment_linenum == 2:
                content = f"{nts} {timestep_finish}"
            elif nts >= 0 and noncomment_linenum == 16:
                content = "1"
            elif noncomment_linenum == 21:
                content = f"{nprocs}"
            if noncomment_linenum < len(INPUT_LINE_COMMENTS):
                content = content.ljust(25) + "# " + INPUT_LINE_COMMENTS[noncomment_linenum]
            out.append(content + "\n")
        else:
            out.append(line)
    with open(path, "w") as f:
        f.writelines(out)


@dataclasses.dataclass
class TimeSteps:
    start: np.ndarray  # (ntimesteps+1,) [s] — last entry is the dummy at tmax
    mid: np.ndarray
    width: np.ndarray


def time_init(
    tmin: float,
    tmax: float,
    ntimesteps: int,
    method: TimeStepSizeMethod = TimeStepSizeMethod.LOGARITHMIC,
    fixed_timestep_width_days: float = -1.0,
    timestep_transition_time_days: float = -1.0,
) -> TimeSteps:
    """Build the timestep grid (reference: input.cc:1844-1978)."""
    start = np.zeros(ntimesteps + 1)
    mid = np.zeros(ntimesteps + 1)
    width = np.zeros(ntimesteps + 1)
    n = np.arange(ntimesteps)

    if method == TimeStepSizeMethod.LOGARITHMIC:
        dlogt = (math.log(tmax) - math.log(tmin)) / ntimesteps
        start[:-1] = tmin * np.exp(n * dlogt)
        mid[:-1] = tmin * np.exp((n + 0.5) * dlogt)
        width[:-1] = tmin * np.exp((n + 1) * dlogt) - start[:-1]
    elif method == TimeStepSizeMethod.CONSTANT:
        dt = (tmax - tmin) / ntimesteps
        start[:-1] = tmin + n * dt
        width[:-1] = dt
        mid[:-1] = start[:-1] + 0.5 * dt
    elif method == TimeStepSizeMethod.LOGARITHMIC_THEN_CONSTANT:
        t_transition = timestep_transition_time_days * DAY
        maxtsdelta = fixed_timestep_width_days * DAY
        assert tmin < t_transition < tmax
        nts_fixed = math.ceil((tmax - t_transition) / maxtsdelta)
        fixed_tsdelta = (tmax - t_transition) / nts_fixed
        nts_log = ntimesteps - nts_fixed
        assert 0 < nts_log < ntimesteps
        dlogt = (math.log(t_transition) - math.log(tmin)) / nts_log
        for i in range(ntimesteps):
            if i < nts_log:
                start[i] = tmin * math.exp(i * dlogt)
                mid[i] = tmin * math.exp((i + 0.5) * dlogt)
                width[i] = tmin * math.exp((i + 1) * dlogt) - start[i]
            else:
                prev = start[i - 1] + width[i - 1] if i > 0 else tmin
                start[i] = prev
                width[i] = fixed_tsdelta
                mid[i] = start[i] + 0.5 * width[i]
    elif method == TimeStepSizeMethod.CONSTANT_THEN_LOGARITHMIC:
        t_transition = timestep_transition_time_days * DAY
        maxtsdelta = fixed_timestep_width_days * DAY
        assert tmin < t_transition < tmax
        nts_fixed = math.ceil((t_transition - tmin) / maxtsdelta)
        fixed_tsdelta = (t_transition - tmin) / nts_fixed
        nts_log = ntimesteps - nts_fixed
        assert 0 < nts_log < ntimesteps
        dlogt = (math.log(tmax) - math.log(t_transition)) / nts_log
        for i in range(ntimesteps):
            if i < nts_fixed:
                start[i] = tmin + i * fixed_tsdelta
                width[i] = fixed_tsdelta
                mid[i] = start[i] + 0.5 * width[i]
            else:
                prev = start[i - 1] + width[i - 1] if i > 0 else tmin
                start[i] = prev
                width[i] = t_transition * math.exp((i - nts_fixed + 1) * dlogt) - start[i]
                mid[i] = start[i] + 0.5 * width[i]
    else:
        raise ValueError(method)

    start[ntimesteps] = tmax
    mid[ntimesteps] = tmax
    width[ntimesteps] = 0.0

    # consistency: start + width == next start (reference: input.cc:1967-1977)
    assert np.all(
        np.abs((start[:ntimesteps] + width[:ntimesteps]) / start[1 : ntimesteps + 1] - 1) < 0.001
    )
    return TimeSteps(start=start, mid=mid, width=width)
