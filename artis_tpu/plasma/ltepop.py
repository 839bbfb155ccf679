"""LTE / Saha ionisation balance and level populations, batched over cells.

TPU-native rebuild of the reference LTE population layer (reference:
ltepop.cc:49-60 phi_saha, 229-276 calculate_partfunct, 278-320
find_uppermost_ion, 359-415 find_converged_nne, 421-454
calculate_ionfractions, 473-502 calculate_levelpop, 562-640
set_groundlevelpops / calculate_ion_balance_nne).

Design: every per-cell GSL Brent root-find becomes one lane of a batched
bisection; phi factors are computed in log space, which reproduces the
reference's float64-overflow clipping (ltepop.cc:310-317) exactly at the
log(DBL_MAX) threshold while never producing an inf on the TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..atomic import DeviceAtomicData
from ..constants import KB, MH, SAHACONST
from ..options import Options
from .cellstate import CellState

LOG_DBL_MAX = 709.782712893384


def calculate_partfuncts(dad: DeviceAtomicData, t_exc: jax.Array) -> jax.Array:
    """Partition functions U(cell, ion) with Boltzmann excitation at t_exc
    (reference: ltepop.cc:229-276; in LTE the level ratios are pure Boltzmann).

    t_exc: (ncells,). Returns (ncells, nions_total).
    """
    # (ncells, nlevels): g_l * exp(-E_above / kT)
    boltz = dad.level_g[None, :] * jnp.exp(
        -dad.level_e_aboveground[None, :] / (KB * t_exc[:, None])
    )
    ncells = t_exc.shape[0]
    out = jnp.zeros((ncells, dad.nions_total), boltz.dtype)
    return out.at[:, dad.level_ion].add(boltz)


def log_phi_saha(dad: DeviceAtomicData, partfuncts: jax.Array, t_e: jax.Array) -> jax.Array:
    """log of the Saha factor phi = n_ion/(n_ion+1 * nne) per (cell, ion)
    (reference: ltepop.cc:49-60). Entries for top ions are meaningless."""
    upper_pf = jnp.roll(partfuncts, -1, axis=1)
    log_ratio = jnp.log(partfuncts) - jnp.log(jnp.maximum(upper_pf, 1e-300))
    return (
        log_ratio
        + jnp.log(SAHACONST)
        - 1.5 * jnp.log(t_e)[:, None]
        + dad.ion_ionpot_eff[None, :] / (KB * t_e[:, None])
    )


def _ion_index_grid(dad: DeviceAtomicData):
    """(nelements, max_nions) uniqueionindex or -1 padding."""
    nelem, maxn = dad.nelements, dad.max_nions
    ionidx = dad.elem_ion_start[:, None] + jnp.arange(maxn)[None, :]
    valid = jnp.arange(maxn)[None, :] < dad.elem_nions[:, None]
    return jnp.where(valid, ionidx, 0), valid


def find_uppermost_ion(
    dad: DeviceAtomicData, logphi: jax.Array, nne_hi: jax.Array
) -> jax.Array:
    """Clip the ion chain where cumprod(nne_hi * phi) would overflow float64
    (reference: ltepop.cc:278-320, use_phi_saha path).

    Returns (ncells, nelements) uppermost ion index.
    """
    ionidx, valid = _ion_index_grid(dad)
    # log(nne_hi * phi) per (cell, element, ion)
    lf = jnp.log(jnp.maximum(nne_hi, 1e-300))[:, None, None] + logphi[:, ionidx]
    # only ions below the top can contribute a phi factor
    is_below_top = (jnp.arange(dad.max_nions)[None, :] < (dad.elem_nions - 1)[:, None])[None, :, :]
    lf = jnp.where(is_below_top & valid[None, :, :], lf, 0.0)
    cum = jnp.cumsum(lf, axis=2)
    # uppermost = number of leading ions with finite cumulative factor
    finite = cum < LOG_DBL_MAX
    # count of consecutive finite entries from ion 0 over positions < nions-1
    consec = jnp.cumprod(
        jnp.where(is_below_top & valid[None, :, :], finite, True).astype(jnp.int32), axis=2
    )
    n_ok = jnp.sum(
        jnp.where(is_below_top & valid[None, :, :], consec, 0), axis=2
    )
    return jnp.minimum(n_ok, dad.elem_nions[None, :] - 1).astype(jnp.int32)


def calculate_ionfractions_log(
    dad: DeviceAtomicData, logphi: jax.Array, nne: jax.Array, uppermost_ion: jax.Array
) -> jax.Array:
    """(ncells, nelements, max_nions) ion fractions, 0 beyond uppermost
    (reference: ltepop.cc:421-454, evaluated stably in log space)."""
    ionidx, valid = _ion_index_grid(dad)
    lognne = jnp.log(jnp.maximum(nne, 1e-300))
    # log step from ion+1 down to ion: log(nne * phi_ion)
    lstep = lognne[:, None, None] + logphi[:, ionidx]
    # logfrac[ion] relative to uppermost: sum of steps from ion..uppermost-1
    maxn = dad.max_nions
    pos = jnp.arange(maxn)
    in_chain = (pos[None, None, :] < uppermost_ion[:, :, None]) & valid[None, :, :]
    lstep = jnp.where(in_chain, lstep, 0.0)
    # suffix sums: logfrac[i] = sum_{j>=i, j<uppermost} lstep[j]
    suffix = jnp.cumsum(lstep[..., ::-1], axis=2)[..., ::-1]
    logfrac = jnp.where(pos[None, None, :] <= uppermost_ion[:, :, None], suffix, -jnp.inf)
    logfrac = jnp.where(valid[None, :, :], logfrac, -jnp.inf)
    m = jnp.max(logfrac, axis=2, keepdims=True)
    w = jnp.exp(logfrac - m)
    return w / jnp.sum(w, axis=2, keepdims=True)


def nne_bisection(
    dad: DeviceAtomicData,
    logphi: jax.Array,
    nnelement: jax.Array,
    uppermost_ion: jax.Array,
    nne_hi: jax.Array,
    niter: int = 64,
):
    """Solve nne = sum_ions charge * n_ion(nne) by batched bisection
    (reference: ltepop.cc:359-415 uses per-cell GSL Brent on [0, rho/MH])."""
    ionidx, valid = _ion_index_grid(dad)
    charge = jnp.where(valid, dad.ion_stage[ionidx] - 1, 0)

    def nne_after(nne):
        frac = calculate_ionfractions_log(dad, logphi, nne, uppermost_ion)
        nnion = nnelement[:, :, None] * frac
        return jnp.maximum(jnp.sum(nnion * charge[None, :, :], axis=(1, 2)), 1e-300)

    lo = jnp.zeros_like(nne_hi) + 1e-300
    hi = nne_hi

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        f_mid = nne_after(mid) - mid
        lo = jnp.where(f_mid > 0, mid, lo)
        hi = jnp.where(f_mid > 0, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, niter, body, (lo, hi))
    return 0.5 * (lo + hi)


def set_groundlevelpops(
    dad: DeviceAtomicData,
    partfuncts: jax.Array,
    logphi: jax.Array,
    nnelement: jax.Array,
    uppermost_ion: jax.Array,
    nne: jax.Array,
    minpop: float,
) -> jax.Array:
    """(ncells, nions_total) ground-level pops (reference: ltepop.cc:562-603)."""
    ionidx, valid = _ion_index_grid(dad)
    frac = calculate_ionfractions_log(dad, logphi, nne, uppermost_ion)
    pos = jnp.arange(dad.max_nions)
    nnion = jnp.where(
        pos[None, None, :] <= uppermost_ion[:, :, None],
        jnp.maximum(minpop, nnelement[:, :, None] * frac),
        minpop,
    )
    nnion = jnp.where(nnelement[:, :, None] > 0, nnion, 0.0)
    groundpop_grid = (
        nnion * dad.ion_g0[ionidx][None, :, :] / partfuncts[:, ionidx]
    )
    ncells = nne.shape[0]
    out = jnp.zeros((ncells, dad.nions_total), groundpop_grid.dtype)
    flat_ionidx = ionidx.reshape(-1)
    flat_valid = valid.reshape(-1)
    # scatter element-grid values into the flat ion axis (each target unique)
    out = out.at[:, flat_ionidx].add(
        jnp.where(flat_valid[None, :], groundpop_grid.reshape(ncells, -1), 0.0)
    )
    return out


def calculate_ion_balance_nne(
    dad: DeviceAtomicData, cells: CellState, opts: Options, force_lte: bool | jax.Array = True,
    gamma_ion=None, nt_ion_rate=None, rc=None,
) -> CellState:
    """Full LTE/Saha nne + ground-pop solve for all cells at once
    (reference: ltepop.cc:607-640 calculate_ion_balance_nne).

    When gamma_ion (photoionisation rate per ground-level pop, from the LUT
    gamma estimators) is given and force_saha is off, non-thick cells use the
    nebular rate-balance phi = alpha_sp / (Gamma_ion + Gamma_NT)
    (reference: ltepop.cc:64-120 phi_rate_balance).
    """
    t_exc = cells.TJ if opts.ltepop_excitation_use_tj else cells.Te
    partfuncts = calculate_partfuncts(dad, t_exc)
    logphi = log_phi_saha(dad, partfuncts, cells.Te)
    if gamma_ion is not None and not opts.force_saha_ion_balance and rc is not None:
        from .ratecoeff import interpolate_lut

        ionidx = jnp.arange(dad.nions_total)
        alpha_sp = interpolate_lut(
            rc.ion_alpha_sp, rc, ionidx[None, :], cells.Te[:, None]
        )  # (ncells, nions)
        gamma_per_ion = gamma_ion * dad.ion_g0[None, :] / jnp.maximum(partfuncts, 1e-300)
        gtot = gamma_per_ion + (nt_ion_rate if nt_ion_rate is not None else 0.0)
        logphi_rate = jnp.log(jnp.maximum(alpha_sp, 1e-300)) - jnp.log(
            jnp.maximum(gtot, 1e-300)
        )
        use_rate = (gtot > 0) & (cells.thick[:, None] != 1)
        logphi = jnp.where(use_rate, logphi_rate, logphi)

    nne_hi = cells.rho / MH
    nnelement = cells.elem_numberdens()
    uppermost = find_uppermost_ion(dad, logphi, nne_hi)
    nne = nne_bisection(dad, logphi, nnelement, uppermost, nne_hi)
    nne = jnp.maximum(nne, opts.minpop)
    groundpops = set_groundlevelpops(
        dad, partfuncts, logphi, nnelement, uppermost, nne, opts.minpop
    )

    # recompute nne from the actual ion pops (reference: set_calculated_nne)
    nnion = groundpops * partfuncts / dad.ion_g0[None, :]
    charge = (dad.ion_stage - 1)[None, :]
    nne_calculated = jnp.maximum(jnp.sum(nnion * charge, axis=1), opts.minpop)

    from ..devutil import assert_testmodeonly
    # reference: ltepop.cc assert_testmodeonly(nne >= 0 / isfinite) and
    # grid.cc set_nne assertions
    assert_testmodeonly(
        jnp.isfinite(nne_calculated) & (nne_calculated > 0.0),
        "ion-balance nne finite and positive")
    assert_testmodeonly(
        jnp.all(jnp.isfinite(groundpops) & (groundpops >= 0.0), axis=1),
        "ground-level populations finite and non-negative")

    return cells.replace(
        ion_partfuncts=partfuncts,
        ion_groundlevelpops=groundpops,
        elements_uppermost_ion=uppermost,
        nne=nne_calculated,
    )


def get_nnion(dad: DeviceAtomicData, cells: CellState) -> jax.Array:
    """(ncells, nions_total) total ion populations (reference: ltepop.cc:550-558)."""
    return cells.ion_groundlevelpops * cells.ion_partfuncts / dad.ion_g0[None, :]


def calculate_levelpops(
    dad: DeviceAtomicData, cells: CellState, opts: Options
) -> jax.Array:
    """Dense (ncells, nlevels_total) Boltzmann level populations.

    This is the TPU replacement for the reference's per-cell lazy cell cache
    (globals.h:172-198): one fused elementwise op refreshes every population,
    then the transport loop is pure gathers.
    (reference: ltepop.cc:473-502 calculate_levelpop_boltzmann)
    """
    t_exc = cells.TJ if opts.ltepop_excitation_use_tj else cells.Te
    groundpop = cells.ion_groundlevelpops[:, dad.level_ion]  # (ncells, nlevels)
    g0 = dad.ion_g0[dad.level_ion][None, :]
    nn = groundpop * dad.level_g[None, :] / g0 * jnp.exp(
        -dad.level_e_aboveground[None, :] / (KB * t_exc[:, None])
    )
    # MINPOP floor where the element is present (reference: ltepop.cc:490-502)
    elem_of_level = dad.ion_element[dad.level_ion]
    has_elem = cells.elem_massfrac[:, elem_of_level] > 0
    nn = jnp.where(nn < opts.minpop, jnp.where(has_elem, opts.minpop, 0.0), nn)
    return nn
