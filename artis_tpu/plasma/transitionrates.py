"""Macro-atom process-rate sums and k-packet cooling channel tables.

TPU-native rebuild of the reference per-level rate machinery (reference:
macroatom.cc:39-152 calculate_macroatom_transitionrates, macroatom.cc:649-947
rate coefficient functions, kpkt.cc:49-211 calculate_cooling_rates_ion).

The reference fills a lazy per-cell cache as packets visit levels, guarded by
mutexes (globals.h:317). Here ALL (cell, level) sums are produced once per
timestep by chunked scans over the flat transition/continuum axes — the rate
formulas become fused vector ops and the per-packet macro-atom loop reduces to
gathers on these tables plus cumulative-sum channel selection.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..atomic import DeviceAtomicData
from ..devutil import exp_clipped
from ..constants import (
    C_0, EULERGAMMA, H, HCLIGHTOVERFOURPI, HOVERKB, H_IONPOT, KB,
    CLIGHTSQUARED,
)
from .ratecoeff import RateCoeffTables, interpolate_lut
from .radfield import dbb

# macro-atom actions (reference: globals.h MA_ACTION enum order,
# partial_sum order matters for sampling, macroatom.cc:389-396)
MA_ACTION_RADDEEXC = 0
MA_ACTION_COLDEEXC = 1
MA_ACTION_RADRECOMB = 2
MA_ACTION_COLRECOMB = 3
MA_ACTION_INTERNALDOWNSAME = 4
MA_ACTION_INTERNALDOWNLOWER = 5
MA_ACTION_INTERNALUPSAME = 6
MA_ACTION_INTERNALUPHIGHER = 7
MA_ACTION_INTERNALUPHIGHERNT = 8
MA_ACTION_COUNT = 9


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "ma_rates", "cool_exc_level", "cool_ion_cont", "cool_fb_cont",
        "cool_ff_ion", "ion_cooling", "totalcooling", "cool_exc_ion",
        "cool_ion_ion", "cool_fb_ion",
        "cont_rad", "cont_tot_down", "cont_tot_up",
        "jb_line", "jb_arr",
    ],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class ProcessRates:
    ma_rates: jax.Array  # (ncells, nlevels, MA_ACTION_COUNT)
    cool_exc_level: jax.Array  # (ncells, nlevels) collisional-excitation cooling
    cool_ion_cont: jax.Array  # (ncells, ncont) collisional-ionisation cooling
    cool_fb_cont: jax.Array  # (ncells, ncont) free-bound cooling
    cool_ff_ion: jax.Array  # (ncells, nions) free-free cooling
    ion_cooling: jax.Array  # (ncells, nions) total per-ion cooling
    totalcooling: jax.Array  # (ncells,)
    cool_exc_ion: jax.Array  # (ncells, nions)
    cool_ion_ion: jax.Array  # (ncells, nions)
    cool_fb_ion: jax.Array  # (ncells, nions)
    # per-CONTINUUM selection value tables stay dense (ncont is small); the
    # per-TRANSITION values are recomputed lazily by trans_values_at —
    # dense (ncells, ntrans) tables cost GBs at production scale (100k-line
    # atoms x thousands of cells exhausted a 16 GB chip) where the walks
    # only ever touch a few 64-wide chunks per jump. This mirrors the
    # reference, which fills per-transition rates lazily into a one-cell
    # cache (macroatom.cc:39-152) rather than storing them for every cell.
    cont_rad: jax.Array  # (ncells, ncont) R_rec*eps_trans
    cont_tot_down: jax.Array  # (ncells, ncont) (R+C)_rec*eps_lower
    cont_tot_up: jax.Array  # (ncells, ncont) (R+C)_ion*eps_owner
    # detailed J_b_lu inputs the lazy walk values need to reproduce the
    # same up-rates the ma_rates sums used ((1,)/(ncells, 1) when off)
    jb_line: jax.Array  # (nlines,) line -> jblue slot (-1 none)
    jb_arr: jax.Array  # (ncells, njblue) normalised J_b_lu


def beta_sobolev(tau):
    """Escape probability beta = (1 - exp(-tau))/tau (reference:
    macroatom.cc:669-672)."""
    return jnp.where(tau > 1e-100, -jnp.expm1(-tau) / jnp.maximum(tau, 1e-100), 0.0)


def col_deexcitation_ratecoeff(t_e, nne, eps_trans, coll_str, forbidden, osc_strength, g_u, g_l):
    """(reference: macroatom.cc:855-902) — multiply by n_upper for a rate."""
    eoverkt = eps_trans / (KB * t_e)
    # permitted van-Regemorter
    g_bar = 0.2
    gauntfac = jnp.where(
        eoverkt > 0.33421,
        g_bar,
        0.276 * jnp.exp(eoverkt) * (-EULERGAMMA - jnp.log(jnp.maximum(eoverkt, 1e-100))),
    )
    permitted = (
        C_0 * 14.51039491 * nne * jnp.sqrt(t_e) * osc_strength
        * (H_IONPOT / eps_trans) ** 2 * eoverkt * (g_l / g_u) * gauntfac
    )
    forbidden_rate = nne * 8.629e-6 * 0.01 * g_l / jnp.sqrt(t_e)
    negative = jnp.where(forbidden, forbidden_rate, permitted)
    positive = nne * 8.629e-6 * coll_str / g_u / jnp.sqrt(t_e)
    return jnp.where(coll_str < 0, negative, positive)


def col_excitation_ratecoeff(t_e, nne, eps_trans, coll_str, forbidden, osc_strength, g_u, g_l):
    """(reference: macroatom.cc:906-947) — multiply by n_lower for a rate."""
    eoverkt = eps_trans / (KB * t_e)
    exp_eoverkt = exp_clipped(eoverkt)
    g_bar = 0.2
    test = 0.276 * exp_eoverkt * (-EULERGAMMA - jnp.log(jnp.maximum(eoverkt, 1e-100)))
    gamma = jnp.maximum(g_bar, test)
    permitted = (
        C_0 * nne * jnp.sqrt(t_e) * 14.51039491 * osc_strength
        * (H_IONPOT / eps_trans) ** 2 * eoverkt / exp_eoverkt * gamma
    )
    forbidden_rate = nne * 8.629e-6 * 0.01 * jnp.exp(-eoverkt) * g_u / jnp.sqrt(t_e)
    negative = jnp.where(forbidden, forbidden_rate, permitted)
    positive = nne * 8.629e-6 * coll_str * jnp.exp(-eoverkt) / g_l / jnp.sqrt(t_e)
    return jnp.where(coll_str < 0, negative, positive)


def col_ionization_ratecoeff(t_e, nne, sigma_bf_edge, eps_trans, ionstage):
    """Seaton approximation (reference: macroatom.cc:823-851) — per n_lower."""
    g = jnp.where(ionstage == 1, 0.1, jnp.where(ionstage == 2, 0.2, 0.3))
    fac1 = eps_trans / (KB * t_e)
    return nne * 1.55e13 * t_e**-0.5 * g * sigma_bf_edge * jnp.exp(-fac1) / jnp.maximum(fac1, 1e-100)


def col_recombination_ratecoeff(t_e, nne, sigma_bf_edge, eps_trans, upper_ionstage, g_l, g_u):
    """Seaton + Saha detailed balance (reference: macroatom.cc:782-818) — per
    n_upper. The Saha exp(+E/kT) cancels the ionisation exp(-E/kT) exactly, so
    evaluate combined for stability."""
    charge = upper_ionstage - 1
    g = jnp.where(charge == 1, 0.1, jnp.where(charge == 2, 0.2, 0.3))
    fac1 = eps_trans / (KB * t_e)
    sahaconst_no_exp = 2.0706659e-16 * (g_l / g_u) * t_e**-1.5
    return nne * nne * sahaconst_no_exp * 1.55e13 * t_e**-0.5 * g * sigma_bf_edge / jnp.maximum(fac1, 1e-100)


def trans_values_at(
    dad: DeviceAtomicData,
    levelpops: jax.Array,  # (ncells, nlevels)
    rows: jax.Array,  # (N,) cell index per row (nonemptymgi, safe)
    kidx: jax.Array,  # (N, K) flat transition indices (clipped to range)
    te: jax.Array,  # (N,) per-row electron temperature
    ne: jax.Array,  # (N,) per-row electron density
    tr: jax.Array,  # (N,) per-row radiation temperature (1.0 if unused)
    w: jax.Array,  # (N,) per-row dilution factor (0.0 if unused)
    t_mid: float,
    jb_line: jax.Array,  # (nlines,) line -> jblue slot, -1 none
    jb_arr: jax.Array,  # (ncells, njblue) normalised J_b_lu
):
    """Per-(row, transition) selection values, computed ON THE FLY.

    The lazy twin of the chunked `_trans_vals` accumulation inside
    compute_process_rates: identical formulas (reference:
    macroatom.cc:649-947 rate coefficient functions), evaluated only for
    the (N, K) windows a macro-atom/k-packet selection walk actually
    touches — the TPU counterpart of the reference's fill-on-demand
    cellcache (macroatom.cc:39-152), replacing dense (ncells, ntrans)
    tables that cost GBs at production line counts.

    Returns (v_rad, v_tot, v_coolexc):
      v_rad     down slots: R*eps_trans (0 on up slots)
      v_tot     down: (R+C)*eps_target; up: (R+C)*eps_owner
      v_coolexc up slots: n_l*C*eps_trans (0 on down slots)
    """
    nlevels = dad.nlevels_total
    kidx = jnp.clip(kidx, 0, max(dad.ntrans_total - 1, 0))
    owner = jnp.clip(dad.trans_owner[kidx], 0, nlevels - 1)
    is_down = dad.trans_is_down[kidx]
    a_ul = dad.trans_A[kidx]
    coll_str = dad.trans_coll_str[kidx]
    forb = dad.trans_forbidden[kidx]
    osc = dad.trans_osc_strength[kidx]
    owner_ion = dad.level_ion[owner]
    target = dad.ion_level_start[owner_ion] + dad.trans_target[kidx]
    e_owner = dad.level_energy[owner]
    e_target = dad.level_energy[target]
    g_owner = dad.level_g[owner]
    g_target = dad.level_g[target]

    upper = jnp.where(is_down, owner, target)
    lower = jnp.where(is_down, target, owner)
    eps_trans = jnp.abs(e_owner - e_target)
    nu_trans = jnp.maximum(eps_trans / H, 1e-30)
    g_u = jnp.where(is_down, g_owner, g_target)
    g_l = jnp.where(is_down, g_target, g_owner)

    b_ul = a_ul * (CLIGHTSQUARED / (nu_trans * nu_trans)) / (2.0 * H * nu_trans)
    b_lu = g_u / g_l * b_ul

    rowsk = rows[:, None]
    n_u = levelpops[rowsk, upper]  # (N, K)
    n_l = levelpops[rowsk, lower]
    tau = jnp.maximum(
        (b_lu * n_l - b_ul * n_u) * HCLIGHTOVERFOURPI * t_mid, 0.0)
    beta = beta_sobolev(tau)

    tec = te[:, None]
    nec = ne[:, None]

    r_down = a_ul * beta
    c_down = col_deexcitation_ratecoeff(
        tec, nec, eps_trans, coll_str, forb, osc, g_u, g_l)
    wdown = jnp.where(is_down, 1.0, 0.0)
    v_rad = wdown * r_down * eps_trans
    v_tot_down = wdown * (r_down + c_down) * e_target

    r_over_j = jnp.where(
        n_l > 0,
        (b_lu - b_ul * n_u / jnp.maximum(n_l, 1e-300)) * beta,
        b_lu * beta,
    )
    j_nu = dbb(nu_trans, jnp.maximum(tr, 1.0)[:, None], w[:, None])
    li = dad.trans_lineindex[kidx]
    jb_idx = jb_line[jnp.clip(li, 0, jb_line.shape[0] - 1)]
    has_jb = (li >= 0) & (jb_idx >= 0)
    j_detail = jb_arr[rowsk, jnp.maximum(jb_idx, 0)]
    j_nu = jnp.where(has_jb, j_detail, j_nu)
    r_up = jnp.maximum(r_over_j * j_nu, 0.0)
    c_up = col_excitation_ratecoeff(
        tec, nec, eps_trans, coll_str, forb, osc, g_u, g_l)
    wup = jnp.where(is_down, 0.0, 1.0)
    v_tot_up = wup * (r_up + c_up) * e_owner
    v_coolexc = wup * n_l * c_up * eps_trans
    # pin the caller's working precision: dad's f64 constants must not
    # promote an f32 transport walk (selection carries f32 cumulative sums)
    odt = te.dtype
    return (v_rad.astype(odt), (v_tot_down + v_tot_up).astype(odt),
            v_coolexc.astype(odt))


def compute_process_rates(
    dad: DeviceAtomicData,
    rc: RateCoeffTables,
    levelpops: jax.Array,  # (ncells, nlevels)
    nnion: jax.Array,  # (ncells, nions)
    t_e: jax.Array,  # (ncells,)
    t_r: jax.Array,
    w: jax.Array,
    nne: jax.Array,
    t_mid: float,
    corrphotoionrenorm: jax.Array | None = None,  # (ncells, nbfcontinua_ground)
    jblue_normed=None,  # (jblue_of_line, (ncells, njblue)) detailed J_b_lu
    corr_photoion_cells=None,  # (ncells, ncont) LUT-off on-the-fly rates
    trans_chunk: int = 4096,
    cont_chunk: int = 1024,
) -> ProcessRates:
    trans_chunk = max(min(trans_chunk, dad.ntrans_total), 1)
    cont_chunk = max(min(cont_chunk, dad.nbfcontinua), 1)
    ncells = t_e.shape[0]
    nlevels = dad.nlevels_total
    nions = dad.nions_total
    dtype = t_e.dtype

    ma = jnp.zeros((ncells, nlevels, MA_ACTION_COUNT), dtype)
    cool_exc_level = jnp.zeros((ncells, nlevels), dtype)

    # ---- bb processes over the flat transition axis ----
    # Two consumers, two shapes of the same math:
    #  - the (ncells, nlevels, 9) MA action sums and the per-level cooling
    #    accumulate via scatter-add, so they run CHUNKED in a lax.scan (small
    #    carries; full-width scatter updates would materialise (ncells,
    #    ntrans) operands);
    #  - the (ncells, ntrans) selection tables are pure elementwise+gather
    #    maps, so they are built FULL-WIDTH in one fused pass. Carrying them
    #    through the scan double-buffered multi-GB arrays at production
    #    scale (the HLO temp arena alone was ~3.6 GB at 100k lines).
    ntrans = dad.ntrans_total
    ntrans_pad = max(-(-max(ntrans, 1) // trans_chunk) * trans_chunk, trans_chunk)

    def _trans_vals(kidx, valid):
        """Per-transition rate values for the given flat indices.

        Returns (owner, v_rad, v_cdeexc, v_tot_down, v_tot_up, v_coolexc),
        each (ncells, len(kidx)), already masked by `valid`."""
        sl = lambda x: x[kidx]
        owner = jnp.clip(sl(dad.trans_owner), 0, nlevels - 1)
        is_down = sl(dad.trans_is_down)
        target_inion = sl(dad.trans_target)
        a_ul = sl(dad.trans_A)
        coll_str = sl(dad.trans_coll_str)
        forb = sl(dad.trans_forbidden)
        osc = sl(dad.trans_osc_strength)

        owner_ion = dad.level_ion[owner]
        target = dad.ion_level_start[owner_ion] + target_inion
        e_owner = dad.level_energy[owner]
        e_target = dad.level_energy[target]
        g_owner = dad.level_g[owner]
        g_target = dad.level_g[target]

        upper = jnp.where(is_down, owner, target)
        lower = jnp.where(is_down, target, owner)
        eps_trans = jnp.abs(e_owner - e_target)
        nu_trans = jnp.maximum(eps_trans / H, 1e-30)
        g_u = jnp.where(is_down, g_owner, g_target)
        g_l = jnp.where(is_down, g_target, g_owner)

        b_ul = a_ul * (CLIGHTSQUARED / (nu_trans * nu_trans)) / (2.0 * H * nu_trans)
        b_lu = g_u / g_l * b_ul

        n_u = levelpops[:, upper]  # (ncells, K)
        n_l = levelpops[:, lower]
        tau = jnp.maximum(
            (b_lu[None, :] * n_l - b_ul[None, :] * n_u) * HCLIGHTOVERFOURPI * t_mid, 0.0
        )
        beta = beta_sobolev(tau)

        te = t_e[:, None]
        ne = nne[:, None]

        # --- down entries ---
        r_down = a_ul[None, :] * beta  # rad deexc per n_upper
        c_down = col_deexcitation_ratecoeff(
            te, ne, eps_trans[None, :], coll_str[None, :], forb[None, :],
            osc[None, :], g_u[None, :], g_l[None, :],
        )
        wdown = jnp.where(valid & is_down, 1.0, 0.0)[None, :]
        v_rad = wdown * r_down * eps_trans[None, :]
        v_cdeexc = wdown * c_down * eps_trans[None, :]
        v_tot_down = wdown * (r_down + c_down) * e_target[None, :]

        # --- up entries ---
        r_over_j = jnp.where(
            n_l > 0,
            (b_lu[None, :] - b_ul[None, :] * n_u / jnp.maximum(n_l, 1e-300)) * beta,
            b_lu[None, :] * beta,
        )
        j_nu = dbb(nu_trans[None, :], jnp.maximum(t_r, 1.0)[:, None], w[:, None])
        if jblue_normed is not None:
            # detailed line estimator replaces the radiation-field model
            # for selected lines (reference: macroatom.cc:713-720)
            jb_line, jb_arr = jblue_normed
            li = sl(dad.trans_lineindex)
            jb_idx = jb_line[jnp.clip(li, 0, jb_line.shape[0] - 1)]
            has_jb = (li >= 0) & (jb_idx >= 0)
            j_detail = jb_arr[:, jnp.maximum(jb_idx, 0)]
            j_nu = jnp.where(has_jb[None, :], j_detail, j_nu)
        r_up = jnp.maximum(r_over_j * j_nu, 0.0)
        c_up = col_excitation_ratecoeff(
            te, ne, eps_trans[None, :], coll_str[None, :], forb[None, :],
            osc[None, :], g_u[None, :], g_l[None, :],
        )
        wup = jnp.where(valid & ~is_down, 1.0, 0.0)[None, :]
        v_tot_up = wup * (r_up + c_up) * e_owner[None, :]
        v_coolexc = wup * n_l * c_up * eps_trans[None, :]
        return owner, v_rad, v_cdeexc, v_tot_down, v_tot_up, v_coolexc

    if ntrans > 0:
        nchunks = -(-ntrans // trans_chunk)

        def trans_body(carry, c):
            ma, cool_exc_level = carry
            kpos = c * trans_chunk + jnp.arange(trans_chunk)
            kidx = jnp.clip(kpos, 0, ntrans - 1)
            valid = kpos < ntrans  # out-of-range = repeats; weight 0
            (owner, v_rad, v_cdeexc, v_tot_down, v_tot_up,
             v_coolexc) = _trans_vals(kidx, valid)
            ma = ma.at[:, owner, MA_ACTION_RADDEEXC].add(v_rad)
            ma = ma.at[:, owner, MA_ACTION_COLDEEXC].add(v_cdeexc)
            ma = ma.at[:, owner, MA_ACTION_INTERNALDOWNSAME].add(v_tot_down)
            ma = ma.at[:, owner, MA_ACTION_INTERNALUPSAME].add(v_tot_up)
            # collisional-excitation cooling: n_l * C * eps_trans (kpkt.cc:95-105)
            cool_exc_level = cool_exc_level.at[:, owner].add(v_coolexc)
            return (ma, cool_exc_level), None

        (ma, cool_exc_level), _ = jax.lax.scan(
            trans_body, (ma, cool_exc_level), jnp.arange(nchunks),
        )

    # ---- scan over the continuum axis (bf processes) ----
    ncont = dad.nbfcontinua
    ncont_pad = max(-(-max(ncont, 1) // cont_chunk) * cont_chunk, cont_chunk)
    cool_ion_cont = jnp.zeros((ncells, max(ncont, 1)), dtype)
    cool_fb_cont = jnp.zeros((ncells, max(ncont, 1)), dtype)
    cont_rad = jnp.zeros((ncells, ncont_pad), dtype)
    cont_tot_down = jnp.zeros((ncells, ncont_pad), dtype)
    cont_tot_up = jnp.zeros((ncells, ncont_pad), dtype)
    if ncont > 0:
        nchunks = -(-ncont // cont_chunk)
        if corrphotoionrenorm is None:
            corrphotoionrenorm = jnp.ones((ncells, max(dad.nbfcontinua_ground, 1)), dtype)

        def cont_body(carry, c):
            (ma, cool_ion_cont, cool_fb_cont,
             cont_rad, cont_tot_down, cont_tot_up) = carry
            idx = c * cont_chunk + jnp.arange(cont_chunk)
            valid = idx < ncont
            idx_safe = jnp.clip(idx, 0, ncont - 1)
            ll = dad.cont_uniquelower[idx_safe]
            ul = dad.cont_uniqueupper[idx_safe]
            ion = dad.cont_ion[idx_safe]
            eps_trans = dad.level_energy[ul] - dad.level_energy[ll]
            g_l = dad.level_g[ll]
            g_u = dad.level_g[ul]
            sigma_edge = (
                dad.allphixs[dad.cont_phixsrow[idx_safe], 0].astype(dtype)
                * dad.cont_probability[idx_safe]
            )
            upper_stage = dad.ion_stage[ion] + 1
            lower_stage = dad.ion_stage[ion]

            te = t_e[:, None]
            ne = nne[:, None]

            # recombination rates (per n_upperlevel)
            alpha_sp = interpolate_lut(rc.spontrecomb, rc, idx_safe[None, :], te)
            r_rec = ne * alpha_sp
            c_rec = col_recombination_ratecoeff(
                te, ne, sigma_edge[None, :], eps_trans[None, :], upper_stage[None, :],
                g_l[None, :], g_u[None, :],
            )
            wv = jnp.where(valid, 1.0, 0.0)[None, :]
            v_rec_rad = wv * r_rec * eps_trans[None, :]
            v_rec_tot = wv * (r_rec + c_rec) * dad.level_energy[ll][None, :]
            ma = ma.at[:, ul, MA_ACTION_RADRECOMB].add(v_rec_rad)
            ma = ma.at[:, ul, MA_ACTION_COLRECOMB].add(wv * c_rec * eps_trans[None, :])
            ma = ma.at[:, ul, MA_ACTION_INTERNALDOWNLOWER].add(v_rec_tot)

            # ionisation rates (per n_lowerlevel); LUT-off mode uses the
            # on-the-fly radiation-field integral (ratecoeff.cc:731-817)
            if corr_photoion_cells is not None:
                r_ion = corr_photoion_cells[:, idx_safe]
            else:
                gamma_lut = interpolate_lut(
                    rc.corrphotoion, rc, idx_safe[None, :], jnp.maximum(t_r, rc.mintemp)[:, None]
                )
                gidx = jnp.clip(dad.cont_groundindex[idx_safe], 0, max(dad.nbfcontinua_ground - 1, 0))
                renorm = corrphotoionrenorm[:, gidx]
                r_ion = w[:, None] * gamma_lut * renorm
            c_ion = col_ionization_ratecoeff(
                te, ne, sigma_edge[None, :], eps_trans[None, :], lower_stage[None, :]
            )
            v_ion_tot = wv * (r_ion + c_ion) * dad.level_energy[ll][None, :]
            ma = ma.at[:, ll, MA_ACTION_INTERNALUPHIGHER].add(v_ion_tot)

            # cooling channels (kpkt.cc:116-171)
            n_ll = levelpops[:, ll]
            cool_ion_cont = cool_ion_cont.at[:, idx_safe].add(
                wv * n_ll * c_ion * eps_trans[None, :]
            )
            bfcool = interpolate_lut(rc.bfcooling, rc, idx_safe[None, :], te)
            nnupperion = nnion[:, jnp.minimum(ion + 1, nions - 1)]
            cool_fb_cont = cool_fb_cont.at[:, idx_safe].add(wv * bfcool * nnupperion * ne)
            upd = lambda tbl, v: jax.lax.dynamic_update_slice_in_dim(
                tbl, v, c * cont_chunk, axis=1
            )
            cont_rad = upd(cont_rad, v_rec_rad.astype(dtype))
            cont_tot_down = upd(cont_tot_down, v_rec_tot.astype(dtype))
            cont_tot_up = upd(cont_tot_up, v_ion_tot.astype(dtype))
            return (ma, cool_ion_cont, cool_fb_cont,
                    cont_rad, cont_tot_down, cont_tot_up), None

        (ma, cool_ion_cont, cool_fb_cont, cont_rad, cont_tot_down, cont_tot_up), _ = (
            jax.lax.scan(
                cont_body,
                (ma, cool_ion_cont, cool_fb_cont, cont_rad, cont_tot_down, cont_tot_up),
                jnp.arange(nchunks),
            )
        )
    cont_rad = cont_rad[:, :max(ncont, 1)]
    cont_tot_down = cont_tot_down[:, :max(ncont, 1)]
    cont_tot_up = cont_tot_up[:, :max(ncont, 1)]

    # ---- free-free cooling per ion (kpkt.cc:66-82) ----
    charge = (dad.ion_stage - 1).astype(dtype)
    cool_ff_ion = jnp.where(
        charge[None, :] > 0,
        1.426e-27 * jnp.sqrt(t_e)[:, None] * charge[None, :] ** 2 * nnion * nne[:, None],
        0.0,
    )

    # ---- per-ion totals ----
    lvl_ion = dad.level_ion
    cool_exc_ion = jnp.zeros((ncells, nions), dtype).at[:, lvl_ion].add(cool_exc_level)
    cont_ion_idx = dad.cont_ion if ncont else jnp.zeros(1, jnp.int32)
    cool_ion_ion = jnp.zeros((ncells, nions), dtype).at[:, cont_ion_idx].add(cool_ion_cont)
    cool_fb_ion = jnp.zeros((ncells, nions), dtype).at[:, cont_ion_idx].add(cool_fb_cont)
    ion_cooling = cool_ff_ion + cool_exc_ion + cool_ion_ion + cool_fb_ion
    totalcooling = jnp.sum(ion_cooling, axis=1)

    return ProcessRates(
        ma_rates=ma,
        cool_exc_level=cool_exc_level,
        cool_ion_cont=cool_ion_cont,
        cool_fb_cont=cool_fb_cont,
        cool_ff_ion=cool_ff_ion,
        ion_cooling=ion_cooling,
        totalcooling=totalcooling,
        cool_exc_ion=cool_exc_ion,
        cool_ion_ion=cool_ion_ion,
        cool_fb_ion=cool_fb_ion,
        jb_line=(jblue_normed[0].astype(jnp.int32) if jblue_normed is not None
                 else jnp.full((1,), -1, jnp.int32)),
        jb_arr=(jblue_normed[1].astype(dtype) if jblue_normed is not None
                else jnp.zeros((ncells, 1), dtype)),
        cont_rad=cont_rad,
        cont_tot_down=cont_tot_down,
        cont_tot_up=cont_tot_up,
    )
