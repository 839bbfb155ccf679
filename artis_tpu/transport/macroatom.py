"""Batched Lucy macro-atom: internal transitions until deactivation.

TPU-native rebuild of the reference macro-atom (reference: macroatom.cc:309-628
do_macroatom, 39-152 calculate_macroatom_transitionrates, 154-304 selection
helpers). Process-rate sums per (cell, level) are precomputed by
plasma.transitionrates; the jump loop is a masked batched while_loop whose
per-jump transition choice re-walks only the active level's transition block
in fixed-size chunks (the TPU version of the reference's cumulative arrays in
the cell cache).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..atomic import DeviceAtomicData
from ..constants import H
from ..plasma.ratecoeff import RateCoeffTables, select_continuum_nu_batch
from ..plasma.transitionrates import (
    MA_ACTION_COLDEEXC, MA_ACTION_COLRECOMB, MA_ACTION_COUNT,
    MA_ACTION_INTERNALDOWNLOWER, MA_ACTION_INTERNALDOWNSAME,
    MA_ACTION_INTERNALUPHIGHER, MA_ACTION_INTERNALUPHIGHERNT,
    MA_ACTION_INTERNALUPSAME, MA_ACTION_RADDEEXC, MA_ACTION_RADRECOMB,
    ProcessRates, trans_values_at,
)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "recomb_cont_of_upper", "level_recomb_start", "level_recomb_count",
        "ioncont_cont_of_lower", "level_ioncont_start", "level_ioncont_count",
        "cont_emtype", "ion_cont_start", "ion_cont_count",
    ],
    meta_fields=["max_ndowntrans", "max_nuptrans", "max_recomb", "max_ioncont", "max_ioncont_ion", "max_nlevels_ion"],
)
@dataclasses.dataclass(frozen=True)
class MacroAtomAux:
    """Continuum-list regroupings by upper/lower level for MA selection."""

    recomb_cont_of_upper: jax.Array  # (ncont,) cont indices sorted by upper level
    level_recomb_start: jax.Array  # (nlevels,)
    level_recomb_count: jax.Array
    ioncont_cont_of_lower: jax.Array  # (ncont,) cont indices sorted by lower level
    level_ioncont_start: jax.Array
    level_ioncont_count: jax.Array
    cont_emtype: jax.Array  # (ncont,) negative continuum emission-type codes
    ion_cont_start: jax.Array  # (nions,) offset into ioncont_cont_of_lower per ion
    ion_cont_count: jax.Array  # (nions,)
    max_ndowntrans: int
    max_nuptrans: int
    max_recomb: int
    max_ioncont: int
    max_ioncont_ion: int
    max_nlevels_ion: int


def build_aux(dad: DeviceAtomicData) -> MacroAtomAux:
    nlev = dad.nlevels_total
    ncont = dad.nbfcontinua
    upper = np.asarray(dad.cont_uniqueupper)
    lower = np.asarray(dad.cont_uniquelower)

    # min length 1: clipped gathers read index 0 even when no continua exist
    # (a bound-bound-only dataset; dad's continuum tables are padded likewise)
    order_u = np.argsort(upper, kind="stable") if ncont else np.zeros(1, np.int64)
    order_l = np.argsort(lower, kind="stable") if ncont else np.zeros(1, np.int64)
    count_u = np.bincount(upper, minlength=nlev) if ncont else np.zeros(nlev, np.int64)
    count_l = np.bincount(lower, minlength=nlev) if ncont else np.zeros(nlev, np.int64)
    start_u = np.concatenate([[0], np.cumsum(count_u)[:-1]])
    start_l = np.concatenate([[0], np.cumsum(count_l)[:-1]])

    # continuum emission type: -1 - cont_index(level) - phixstargetindex
    # (reference: atomic.h:444-448); cont_index increments over levels with
    # tables in level order, which equals position when sorted by lower level
    emtype = np.zeros(max(ncont, 1), np.int64)
    if ncont:
        # level_cont_index base per lower level: cumulative count in level order
        base = start_l  # == cont_index of the level's first target
        for k, ci in enumerate(order_l):
            lev = lower[ci]
            emtype[ci] = -1 - (base[lev] + (k - start_l[lev]))

    # per-ion grouping: sorting by lower level also groups by ion because a
    # given ion's levels are contiguous in the unique-level ordering
    lvl_ion = np.asarray(dad.level_ion)
    nions = dad.nions_total
    cont_ion_sorted = lvl_ion[lower[order_l]] if ncont else np.zeros(0, np.int64)
    ion_cont_count = np.bincount(cont_ion_sorted, minlength=nions) if ncont else np.zeros(nions, np.int64)
    ion_cont_start = np.concatenate([[0], np.cumsum(ion_cont_count)[:-1]])

    return MacroAtomAux(
        recomb_cont_of_upper=jnp.asarray(order_u.astype(np.int64)),
        level_recomb_start=jnp.asarray(start_u.astype(np.int64)),
        level_recomb_count=jnp.asarray(count_u.astype(np.int32)),
        ioncont_cont_of_lower=jnp.asarray(order_l.astype(np.int64)),
        level_ioncont_start=jnp.asarray(start_l.astype(np.int64)),
        level_ioncont_count=jnp.asarray(count_l.astype(np.int32)),
        cont_emtype=jnp.asarray(emtype),
        ion_cont_start=jnp.asarray(ion_cont_start.astype(np.int64)),
        ion_cont_count=jnp.asarray(ion_cont_count.astype(np.int32)),
        max_ndowntrans=int(np.asarray(dad.level_ndowntrans).max(initial=0)),
        max_nuptrans=int(np.asarray(dad.level_nuptrans).max(initial=0)),
        max_recomb=int(count_u.max(initial=0)),
        max_ioncont=int(count_l.max(initial=0)),
        max_ioncont_ion=int(ion_cont_count.max(initial=0)),
        max_nlevels_ion=int(np.asarray(dad.ion_nlevels).max(initial=1)),
    )


def _select_chunked(target, count, maxcount, value_at, chunk: int = 64):
    """Find the first index k in [0, count) where cumulative(value) > target.

    value_at(k_array) -> (npkts, chunk) values; masked walk shared by all
    macro-atom per-transition selections (reference upper_bound on cumulative
    arrays, macroatom.cc:163-168 etc.). Returns (npkts,) selected k (clipped to
    count-1 when rounding overshoots)."""
    npkts = target.shape[0]
    chunk = max(min(chunk, maxcount), 1)  # never pad a short block up to chunk
    nchunks = max(-(-maxcount // chunk), 1)

    def body(carry, c):
        cum, chosen = carry
        k = c * chunk + jnp.arange(chunk)
        vals = value_at(k)  # (npkts, chunk)
        vals = jnp.where((k[None, :] < count[:, None]), vals, 0.0)
        cumchunk = jnp.cumsum(vals, axis=1) + cum[:, None]
        hit = (cumchunk > target[:, None]) & (chosen[:, None] < 0) & (k[None, :] < count[:, None])
        anyhit = jnp.any(hit, axis=1)
        first = (jnp.argmax(hit, axis=1) + c * chunk).astype(jnp.int32)
        chosen = jnp.where((chosen < 0) & anyhit, first, chosen)
        return (cumchunk[:, -1], chosen), None

    (cum, chosen), _ = jax.lax.scan(
        body,
        (jnp.zeros_like(target), jnp.zeros_like(target, dtype=jnp.int32) - 1),
        jnp.arange(nchunks),
    )
    return jnp.clip(jnp.where(chosen < 0, count - 1, chosen), 0, jnp.maximum(count - 1, 0))


def do_macroatom_batch(
    key,
    dad: DeviceAtomicData,
    aux: MacroAtomAux,
    rc: RateCoeffTables,
    rates: ProcessRates,
    levelpops: jax.Array,
    cellidx: jax.Array,  # (npkts,) nonemptymgi (safe, >= 0)
    level_in: jax.Array,  # (npkts,) global unique level of activation
    active_in: jax.Array,  # (npkts,) packets in MA state
    t_e_c: jax.Array,  # (ncells,)
    t_r_c: jax.Array,
    w_c: jax.Array,
    nne_c: jax.Array,
    t_mid: float,
    max_jumps: int = 1024,
):
    """Run the macro-atom to deactivation for all flagged packets.

    Returns dict with: deactivation kind (0 none, 1 rad-bb, 2 rad-fb, 3 kpkt),
    nu_cmf for radiative deactivations, emissiontype, next_trans.
    """
    npkts = level_in.shape[0]
    dtype = t_e_c.dtype
    t_e = t_e_c[cellidx]
    t_r = jnp.maximum(t_r_c[cellidx], 1.0)
    w = w_c[cellidx]
    nne = nne_c[cellidx]

    nlev = dad.nlevels_total

    # Unified selection walk: all six per-jump transition choices gather from
    # ONE merged per-timestep value table (ncells, 2*ntrans + 3*ncont), with a
    # per-packet (base, count) window chosen by the sampled action. One
    # cumulative walk per jump instead of six (TPU gathers dominate this
    # kernel; reference: the per-action upper_bound searches of
    # macroatom.cc:163-320 on the cellcache arrays).
    T = max(dad.ntrans_total, 1)
    C = max(dad.nbfcontinua, 1)
    cont_rad_u = rates.cont_rad[:, aux.recomb_cont_of_upper]  # by upper level
    cont_down_u = rates.cont_tot_down[:, aux.recomb_cont_of_upper]
    cont_up_l = rates.cont_tot_up[:, aux.ioncont_cont_of_lower]  # by lower level
    # VIRTUAL concatenation: the unified walk addresses one logical
    # (ncells, 2T+3C) value table, but materialising it doubles-to-triples
    # HBM at production scale (a 100k-line atom makes each (ncells, ntrans)
    # table ~1.6 GB; the concatenated copy + its remat pair OOMed a 16 GB
    # chip). walk_values below routes each index to its source table with
    # masked gathers on the small (npkts, chunk) windows instead.
    off_rad, off_tot, off_crad, off_cdown, off_cup = 0, T, 2 * T, 2 * T + C, 2 * T + 2 * C
    vwidth = 2 * T + 3 * C
    maxblock = max(aux.max_ndowntrans, aux.max_nuptrans, aux.max_recomb, aux.max_ioncont, 1)

    zi = jnp.zeros_like(level_in, dtype=jnp.int32)
    state = dict(
        level=jnp.clip(level_in, 0, nlev - 1).astype(jnp.int32),
        active=active_in,
        kind=zi,  # 1 rad-bb, 2 rad-fb, 3 kpkt
        nu_cmf=jnp.zeros_like(t_e),
        emissiontype=zi,
        next_trans=zi,
        fb_cont=zi,
        it=jnp.int32(0),
    )

    def cond(s):
        return jnp.logical_and(jnp.any(s["active"]), s["it"] < max_jumps)

    def body(s):
        k = jax.random.fold_in(key, s["it"])
        level = s["level"]
        pr = rates.ma_rates[cellidx, level]  # (npkts, 9)
        cum = jnp.cumsum(pr, axis=1)
        total = jnp.maximum(cum[:, -1], 1e-300)
        zrand = jax.random.uniform(jax.random.fold_in(k, 1), (npkts,), dtype) * total
        action = jnp.sum((cum <= zrand[:, None]).astype(jnp.int32), axis=1)
        action = jnp.minimum(action, MA_ACTION_COUNT - 1)
        act = lambda a: s["active"] & (action == a)
        # dead-end guard: no rates at all -> kpkt (matches reference abort-free
        # handling of zero-rate levels, which cannot occur with valid data)
        stuck = s["active"] & (cum[:, -1] <= 0)

        u2 = jax.random.uniform(jax.random.fold_in(k, 2), (npkts,), dtype)

        # --- one unified selection walk for whichever action was sampled ---
        downstart = dad.level_alltrans_start[level]
        ndown = dad.level_ndowntrans[level]
        nup = dad.level_nuptrans[level]
        rstart = aux.level_recomb_start[level].astype(jnp.int32)
        rcount = aux.level_recomb_count[level]
        istart = aux.level_ioncont_start[level].astype(jnp.int32)
        icount = aux.level_ioncont_count[level]
        downstart = downstart.astype(jnp.int32)
        conds = [
            action == MA_ACTION_RADDEEXC,
            action == MA_ACTION_INTERNALDOWNSAME,
            action == MA_ACTION_INTERNALUPSAME,
            action == MA_ACTION_RADRECOMB,
            action == MA_ACTION_INTERNALDOWNLOWER,
            action == MA_ACTION_INTERNALUPHIGHER,
        ]
        base = jnp.select(conds, [
            off_rad + downstart,
            off_tot + downstart,
            off_tot + downstart + ndown,
            off_crad + rstart,
            off_cdown + rstart,
            off_cup + istart,
        ], jnp.int32(0))
        count = jnp.select(conds, [ndown, ndown, nup, rcount, rcount, icount], jnp.int32(0))
        pr_sel = jnp.take_along_axis(pr, jnp.minimum(action, MA_ACTION_COUNT - 1)[:, None], axis=1)[:, 0]
        tgt = u2 * pr_sel

        def walk_values(kk):
            idxv = jnp.clip(base[:, None] + kk[None, :], 0, vwidth - 1)
            rows = cellidx[:, None]
            # bound-bound regions recompute their values lazily for exactly
            # this (npkts, chunk) window (see trans_values_at): the dense
            # (ncells, ntrans) tables they replaced cost GBs at production
            # line counts
            ltr = jnp.where(idxv >= off_tot, idxv - off_tot, idxv)
            v_rad_k, v_tot_k, _ = trans_values_at(
                dad, levelpops, cellidx, jnp.clip(ltr, 0, T - 1),
                t_e, nne, t_r, w, t_mid, rates.jb_line, rates.jb_arr)
            v = jnp.where(idxv >= off_tot, v_tot_k, v_rad_k)
            v = jnp.where(idxv >= off_crad,
                          cont_rad_u[rows, jnp.clip(idxv - off_crad, 0, C - 1)], v)
            v = jnp.where(idxv >= off_cdown,
                          cont_down_u[rows, jnp.clip(idxv - off_cdown, 0, C - 1)], v)
            v = jnp.where(idxv >= off_cup,
                          cont_up_l[rows, jnp.clip(idxv - off_cup, 0, C - 1)], v)
            return v

        ksel = _select_chunked(tgt, count, maxblock, walk_values)

        # --- RADDEEXC: emit in the selected down transition's line ---
        m = act(MA_ACTION_RADDEEXC)
        tidx = jnp.clip(downstart + ksel, 0, dad.ntrans_total - 1)
        lineindex = dad.trans_lineindex[tidx].astype(jnp.int32)
        target_d = dad.ion_level_start[dad.level_ion[level]] + dad.trans_target[tidx]
        nu_line = (dad.level_energy[level] - dad.level_energy[target_d]) / H
        kind = jnp.where(m, 1, s["kind"])
        nu_cmf = jnp.where(m, nu_line, s["nu_cmf"])
        emissiontype = jnp.where(m, lineindex, s["emissiontype"])
        next_trans = jnp.where(m, lineindex + 1, s["next_trans"])
        done = m

        # --- COLDEEXC / COLRECOMB / NT-stuck: to kpkt ---
        m = act(MA_ACTION_COLDEEXC) | act(MA_ACTION_COLRECOMB) | stuck
        kind = jnp.where(m, 3, kind)
        done = done | m

        # --- INTERNALDOWNSAME ---
        m = act(MA_ACTION_INTERNALDOWNSAME) & ~stuck
        newlevel = jnp.where(m, target_d, level)

        # --- RADRECOMB: deactivate in the selected fb continuum ---
        m = act(MA_ACTION_RADRECOMB)
        bidx = jnp.clip(rstart + ksel, 0, max(dad.nbfcontinua - 1, 0))
        ci = aux.recomb_cont_of_upper[bidx].astype(jnp.int32)
        kind = jnp.where(m, 2, kind)
        fb_cont = jnp.where(m, ci, s["fb_cont"])
        emissiontype = jnp.where(m, aux.cont_emtype[ci].astype(jnp.int32), emissiontype)
        next_trans = jnp.where(m, -1, next_trans)
        done = done | m

        # --- INTERNALDOWNLOWER ---
        m = act(MA_ACTION_INTERNALDOWNLOWER) & ~stuck
        newlevel = jnp.where(m, dad.cont_uniquelower[ci], newlevel)

        # --- INTERNALUPSAME ---
        m = act(MA_ACTION_INTERNALUPSAME) & ~stuck
        tidx_u = jnp.clip(downstart + ndown + ksel, 0, dad.ntrans_total - 1)
        target_u = dad.ion_level_start[dad.level_ion[level]] + dad.trans_target[tidx_u]
        newlevel = jnp.where(m, target_u, newlevel)

        # --- INTERNALUPHIGHER ---
        m = act(MA_ACTION_INTERNALUPHIGHER) & ~stuck
        bidx_i = jnp.clip(istart + ksel, 0, max(dad.nbfcontinua - 1, 0))
        ci_i = aux.ioncont_cont_of_lower[bidx_i]
        newlevel = jnp.where(m, dad.cont_uniqueupper[ci_i], newlevel)

        # NT up-higher: disabled (NT_ON handled in the nonthermal stack)
        m = act(MA_ACTION_INTERNALUPHIGHERNT) & ~stuck
        kind = jnp.where(m, 3, kind)
        done = done | m

        return dict(
            level=newlevel.astype(jnp.int32),
            active=s["active"] & ~done,
            kind=kind,
            nu_cmf=nu_cmf,
            emissiontype=emissiontype,
            next_trans=next_trans,
            fb_cont=fb_cont,
            it=s["it"] + 1,
        )

    out = jax.lax.while_loop(cond, body, state)

    # sample fb emission frequency for radiative recombinations
    # (reference: ratecoeff.cc:896-950 via macroatom.cc:259)
    fb_mask = out["kind"] == 2
    nu_fb = select_continuum_nu_batch(
        jax.random.fold_in(key, 999), dad, out["fb_cont"], t_e, fb_mask
    )
    nu_cmf = jnp.where(fb_mask, nu_fb, out["nu_cmf"])

    return dict(
        kind=out["kind"],
        nu_cmf=nu_cmf,
        emissiontype=out["emissiontype"],
        next_trans=out["next_trans"],
        level=out["level"],
        unresolved=out["active"],
    )
