"""Electron-temperature solver: heating == cooling, batched over cells.

TPU-native rebuild of the reference thermal balance (reference:
thermalbalance.cc:187-241 T_e_eqn_heating_minus_cooling, 291-378
call_T_e_finder, 108-184 heating rates, 43-106 bf-heating coefficients).

The reference runs a per-cell GSL Brent solve where EVERY function evaluation
re-solves the ionisation balance and re-sums all rates; here one bisection
iteration does the same work for ALL cells as fused scans, so the whole grid's
T_e solve is ~30 batched evaluations total.

The bf-heating coefficient with the full-spectrum dilute-blackbody radiation
field equals W * LUT(T_R) exactly (the no-LUT integral of
sigma (1-nu_edge/nu) J_nu (1-exp(-hnu/kT_R)) with J_nu = W dbb(nu, T_R)),
so both reference paths coincide until the multibin field lands.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..atomic import DeviceAtomicData
from ..constants import H, HCLIGHTOVERFOURPI, KB
from ..options import Options
from .ltepop import calculate_ion_balance_nne, calculate_levelpops, get_nnion
from .ratecoeff import RateCoeffTables, interpolate_lut
from .transitionrates import (
    beta_sobolev, col_deexcitation_ratecoeff, col_excitation_ratecoeff,
    col_ionization_ratecoeff, col_recombination_ratecoeff,
)


class HeatingCoolingRates(NamedTuple):
    heating_collisional: jax.Array  # (ncells,)
    heating_bf: jax.Array
    heating_ff: jax.Array
    heating_dep: jax.Array
    cooling_ff: jax.Array
    cooling_fb: jax.Array
    cooling_collisional: jax.Array
    cooling_adiabatic: jax.Array


def compute_heating_cooling(
    dad: DeviceAtomicData,
    rc: RateCoeffTables,
    cells,
    opts: Options,
    levelpops: jax.Array,
    nnion: jax.Array,
    t_current,
    ffheating_norm: jax.Array,  # normalised ff-heating estimator (ncells,)
    dep_heating: jax.Array,  # non-thermal deposition heating rate (ncells,)
    bfheat_renorm: jax.Array | None = None,  # (ncells, nbfcontinua_ground)
    bfheating_cells: jax.Array | None = None,  # (ncells, ncont) LUT-off
    # on-the-fly bf-heating coefficients vs the current radiation field
    # (reference: thermalbalance.cc:43-106; replaces n*W*LUT(T_R)*renorm)
    trans_chunk: int = 4096,
    cont_chunk: int = 1024,
) -> HeatingCoolingRates:
    ncells = levelpops.shape[0]
    dtype = levelpops.dtype
    t_e = cells.Te
    nne = cells.nne
    t_r = jnp.maximum(cells.TR, 1.0)
    w = cells.W

    heat_coldeexc = jnp.zeros(ncells, dtype)
    cool_colexc = jnp.zeros(ncells, dtype)

    ntrans = dad.ntrans_total
    if ntrans > 0:
        nchunks = -(-ntrans // trans_chunk)

        def trans_body(carry, c):
            heat, coolexc = carry
            kidx = jnp.clip(c * trans_chunk + jnp.arange(trans_chunk), 0, ntrans - 1)
            valid = (c * trans_chunk + jnp.arange(trans_chunk)) < ntrans
            owner = dad.trans_owner[kidx]
            is_down = dad.trans_is_down[kidx]
            target = dad.ion_level_start[dad.level_ion[owner]] + dad.trans_target[kidx]
            eps_trans = jnp.abs(dad.level_energy[owner] - dad.level_energy[target])
            g_owner = dad.level_g[owner]
            g_target = dad.level_g[target]
            g_u = jnp.where(is_down, g_owner, g_target)
            g_l = jnp.where(is_down, g_target, g_owner)
            upper = jnp.where(is_down, owner, target)
            lower = jnp.where(is_down, target, owner)
            n_u = levelpops[:, upper]
            n_l = levelpops[:, lower]
            wv = jnp.where(valid, 1.0, 0.0)[None, :]

            # collisional deexcitation heating (thermalbalance.cc:108-131):
            # counted once per line via the down-block entries
            c_down = col_deexcitation_ratecoeff(
                t_e[:, None], nne[:, None], eps_trans[None, :], dad.trans_coll_str[kidx][None, :],
                dad.trans_forbidden[kidx][None, :], dad.trans_osc_strength[kidx][None, :],
                g_u[None, :], g_l[None, :],
            )
            heat = heat + jnp.sum(
                wv * jnp.where(is_down[None, :], n_u * c_down * eps_trans[None, :], 0.0), axis=1
            )
            # collisional excitation cooling via the up-block entries
            c_up = col_excitation_ratecoeff(
                t_e[:, None], nne[:, None], eps_trans[None, :], dad.trans_coll_str[kidx][None, :],
                dad.trans_forbidden[kidx][None, :], dad.trans_osc_strength[kidx][None, :],
                g_u[None, :], g_l[None, :],
            )
            coolexc = coolexc + jnp.sum(
                wv * jnp.where(~is_down[None, :], n_l * c_up * eps_trans[None, :], 0.0), axis=1
            )
            return (heat, coolexc), None

        (heat_coldeexc, cool_colexc), _ = jax.lax.scan(
            trans_body, (heat_coldeexc, cool_colexc), jnp.arange(nchunks)
        )

    heat_bf = jnp.zeros(ncells, dtype)
    cool_fb = jnp.zeros(ncells, dtype)
    cool_colion = jnp.zeros(ncells, dtype)
    ncont = dad.nbfcontinua
    if ncont > 0:
        nchunks = -(-ncont // cont_chunk)
        if bfheat_renorm is None:
            bfheat_renorm = jnp.ones((ncells, max(dad.nbfcontinua_ground, 1)), dtype)

        def cont_body(carry, c):
            heat_bf, cool_fb, cool_colion = carry
            idx = c * cont_chunk + jnp.arange(cont_chunk)
            valid = idx < ncont
            ci = jnp.clip(idx, 0, ncont - 1)
            ll = dad.cont_uniquelower[ci]
            ul = dad.cont_uniqueupper[ci]
            ion = dad.cont_ion[ci]
            eps_trans = dad.level_energy[ul] - dad.level_energy[ll]
            sigma_edge = (
                dad.allphixs[dad.cont_phixsrow[ci], 0].astype(dtype) * dad.cont_probability[ci]
            )
            wv = jnp.where(valid, 1.0, 0.0)[None, :]
            n_ll = levelpops[:, ll]

            # bf heating: n_level * W * LUT(T_R) * renorm (thermalbalance.cc:246-289)
            # or, LUT-off, n_level * (on-the-fly radfield integral)
            if bfheating_cells is not None:
                heat_bf = heat_bf + jnp.sum(wv * n_ll * bfheating_cells[:, ci], axis=1)
            else:
                bfh = interpolate_lut(rc.bfheating, rc, ci[None, :], t_r[:, None])
                gidx = jnp.clip(dad.cont_groundindex[ci], 0, max(dad.nbfcontinua_ground - 1, 0))
                renorm = bfheat_renorm[:, gidx]
                heat_bf = heat_bf + jnp.sum(wv * n_ll * w[:, None] * bfh * renorm, axis=1)

            # fb cooling (kpkt.cc:147-171)
            bfcool = interpolate_lut(rc.bfcooling, rc, ci[None, :], t_e[:, None])
            nnupperion = nnion[:, jnp.minimum(ion + 1, dad.nions_total - 1)]
            cool_fb = cool_fb + jnp.sum(wv * bfcool * nnupperion * nne[:, None], axis=1)

            # collisional ionisation cooling (kpkt.cc:116-145)
            c_ion = col_ionization_ratecoeff(
                t_e[:, None], nne[:, None], sigma_edge[None, :], eps_trans[None, :],
                dad.ion_stage[ion][None, :],
            )
            cool_colion = cool_colion + jnp.sum(wv * n_ll * c_ion * eps_trans[None, :], axis=1)
            return (heat_bf, cool_fb, cool_colion), None

        (heat_bf, cool_fb, cool_colion), _ = jax.lax.scan(
            cont_body, (heat_bf, cool_fb, cool_colion), jnp.arange(nchunks)
        )

    # free-free cooling (kpkt.cc:66-82)
    charge = (dad.ion_stage - 1).astype(dtype)
    cool_ff = jnp.sum(
        jnp.where(
            charge[None, :] > 0,
            1.426e-27 * jnp.sqrt(t_e)[:, None] * charge[None, :] ** 2 * nnion * nne[:, None],
            0.0,
        ),
        axis=1,
    )

    # adiabatic cooling p dV/V with dV/V = 3/t (thermalbalance.cc:226-233)
    nntot = jnp.sum(nnion, axis=1) + nne
    cool_adiabatic = nntot * KB * t_e * 3.0 / t_current

    return HeatingCoolingRates(
        heating_collisional=heat_coldeexc,
        heating_bf=heat_bf,
        heating_ff=ffheating_norm,
        heating_dep=dep_heating,
        cooling_ff=cool_ff,
        cooling_fb=cool_fb,
        cooling_collisional=cool_colexc + cool_colion,
        cooling_adiabatic=cool_adiabatic,
    )


def call_t_e_finder(
    dad: DeviceAtomicData,
    rc: RateCoeffTables,
    cells,
    opts: Options,
    t_current,
    ffheating_norm: jax.Array,
    dep_heating: jax.Array,
    bfheat_renorm: jax.Array | None = None,
    bfheating_cells: jax.Array | None = None,
    niter: int = 24,
):
    """Batched bisection for T_e in [mintemp, maxtemp] with the reference's
    out-of-bracket and 2x/0.5x damping rules (thermalbalance.cc:291-378).

    Each evaluation re-solves the Saha/nne balance at the trial T_e, exactly
    as the reference's rootfinder callback does (thermalbalance.cc:209-216).
    Returns the updated CellState (T_e, populations consistent) and the final
    HeatingCoolingRates.
    """
    t_e_old = cells.Te

    def eval_hc(t_e):
        trial = cells.replace(Te=t_e)
        trial = calculate_ion_balance_nne(dad, trial, opts)
        levelpops = calculate_levelpops(dad, trial, opts)
        nnion = get_nnion(dad, trial)
        hc = compute_heating_cooling(
            dad, rc, trial, opts, levelpops, nnion, t_current, ffheating_norm,
            dep_heating, bfheat_renorm, bfheating_cells=bfheating_cells,
        )
        heat = hc.heating_ff + hc.heating_bf + hc.heating_collisional + hc.heating_dep
        cool = hc.cooling_ff + hc.cooling_fb + hc.cooling_collisional + hc.cooling_adiabatic
        return heat - cool

    tmin = jnp.full_like(t_e_old, opts.mintemp)
    tmax = jnp.full_like(t_e_old, opts.maxtemp)
    f_min = eval_hc(tmin)
    f_max = eval_hc(tmax)
    has_root = f_min * f_max < 0

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        f_mid = eval_hc(mid)
        # f is decreasing in T_e (more cooling at higher T): move the bound
        # with the same sign as f_min
        go_up = jnp.sign(f_mid) == jnp.sign(f_min)
        lo = jnp.where(go_up, mid, lo)
        hi = jnp.where(go_up, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, niter, body, (tmin, tmax))
    t_e = 0.5 * (lo + hi)

    # no bracket: pin to the boundary (thermalbalance.cc:347-361)
    t_e = jnp.where(has_root, t_e, jnp.where(f_max < 0, opts.mintemp, opts.maxtemp))
    # 2x / 0.5x damping (thermalbalance.cc:363-371)
    t_e = jnp.clip(t_e, 0.5 * t_e_old, 2.0 * t_e_old)
    t_e = jnp.clip(t_e, opts.mintemp, opts.maxtemp)

    out = cells.replace(Te=t_e)
    out = calculate_ion_balance_nne(dad, out, opts)
    levelpops = calculate_levelpops(dad, out, opts)
    nnion = get_nnion(dad, out)
    hc = compute_heating_cooling(
        dad, rc, out, opts, levelpops, nnion, t_current, ffheating_norm,
        dep_heating, bfheat_renorm, bfheating_cells=bfheating_cells,
    )
    return out, hc
