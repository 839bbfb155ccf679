"""The Sobolev line walk (`get_event`), batched and chunk-vectorised.

TPU-native rebuild of the reference event search (reference: rpkt.cc:77-197
get_event, rpkt.h:55-117 get_linedistance/closest_transition). The reference
walks the nu-descending linelist one line at a time per packet; here each
iteration processes a CHUNK of consecutive lines for the whole packet batch:
distances and Sobolev depths for all chunk lines are computed as one fused
vector op, the first terminal condition is located with a masked argmax, and
only packets with no terminal in their chunk iterate again. This converts the
reference's scalar early-exit loop into bounded-depth vector work — the TPU
answer to its cache-friendly linelist scan.

Closed forms used for in-chunk cumulative distances (both exactly match the
reference's per-line stepping):
- relativistic mode: nu is linear in distance (rpkt.cc:141-149), so
  D_k = (nu_k - nu_cur) / d_nu_on_d_l;
- first-order mode: t nu_cmf is conserved along the ray (rpkt.h:72), so
  t_k = t_cur nu_cur / nu_k and D_k = c t_cur (nu_cur/nu_k - 1).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..atomic import DeviceAtomicData
from ..constants import CLIGHT_PROP, HCLIGHTOVERFOURPI


class EventResult(NamedTuple):
    edist: jax.Array  # distance to event; +inf if none before abort
    next_trans: jax.Array  # updated linelist cursor
    is_boundbound: jax.Array  # bool
    activating_line: jax.Array  # lineindex for bb events, -99 otherwise


def build_tau_factor(dad: DeviceAtomicData, levelpops: jax.Array) -> jax.Array:
    """(ncells, nlines) Sobolev opacity factor (tau_sobolev / t).

    Precomputed once per timestep from the level populations — the TPU
    counterpart of the reference's per-cell cellcache of tau_sobolevs
    (update_grid.cc:62-110): the line walk then needs a single 2D gather per
    chunk instead of five (pops x2, B coefficients x2, line nu).
    """
    n_l = levelpops[:, dad.line_lowerunique]
    n_u = levelpops[:, dad.line_upperunique]
    return jnp.maximum(
        (dad.line_blu[None, :] * n_l - dad.line_bul[None, :] * n_u) * HCLIGHTOVERFOURPI, 0.0
    )


def closest_transition_initial(dad: DeviceAtomicData, nu_cmf, next_trans):
    """Resolve a fresh cursor (next_trans <= 0) by binary search
    (reference: rpkt.h:75-117). Returns cursor >= 0, or nlines (no lines)."""
    nlines = dad.nlines
    # first index with line_nu[idx] <= nu_cmf (descending list)
    searched = jnp.searchsorted(-dad.line_nu, -nu_cmf, side="left").astype(jnp.int32)
    cursor = jnp.where(next_trans > 0, next_trans, searched)
    # tagged past the end, or redder than the reddest line: no interactions
    no_lines = (next_trans > nlines - 1) | (nu_cmf < dad.line_nu[nlines - 1])
    return jnp.where(no_lines, nlines, jnp.minimum(cursor, nlines)).astype(jnp.int32)


def get_event_batch(
    dad: DeviceAtomicData,
    tau_factor: jax.Array,  # (ncells, nlines) from build_tau_factor
    cellidx: jax.Array,  # (npkts,) nonemptymgi
    nu_cmf0: jax.Array,  # (npkts,) at step start
    prop_time0: jax.Array,
    next_trans_in: jax.Array,
    chi_cont: jax.Array,  # (npkts,) continuum opacity in the cmf * doppler
    tau_rnd: jax.Array,
    abort_dist: jax.Array,
    nu_cmf_abort: jax.Array,
    d_nu_on_d_l: jax.Array,
    active: jax.Array,  # (npkts,) participate in the walk
    relativistic: bool,
    chunk: int = 256,
    max_iters: int | None = None,
    jblue: tuple | None = None,
) -> EventResult:
    """When ``jblue`` is given as (jblue_of_line, e_cmf0, jblue_acc,
    jblue_cnt), every line resonance a packet sweeps through (including the
    bb-activating line) contributes prop_time*CLIGHT*e_cmf/nu to its J_b_lu
    estimator (reference: rpkt.cc:151-167, radfield.cc:761-771), and the
    return value becomes (EventResult, jblue_acc, jblue_cnt)."""
    nlines = dad.nlines
    chunk = max(min(chunk, nlines), 1)  # never pad a walk chunk past the list
    if max_iters is None:
        # each non-terminal iteration advances the cursor by a full chunk, so
        # the walk is structurally bounded; an explicit cap also guarantees
        # termination if non-finite data ever corrupts the terminal tests
        # (an unbounded while_loop on TPU dies by watchdog, not by error)
        max_iters = -(-max(nlines, 1) // chunk) + 2
    npkts = nu_cmf0.shape[0]
    dtype = nu_cmf0.dtype
    big = jnp.inf

    cursor0 = closest_transition_initial(dad, nu_cmf0, next_trans_in)
    # packets with no reachable line at entry keep their original cursor on a
    # no-event outcome (reference: rpkt.cc:180-192 leaves next_trans untouched)
    fresh_nolines = cursor0 >= nlines

    nblocks = -(-nlines // chunk)
    pad = nblocks * chunk - nlines
    line_nu = dad.line_nu
    if pad:
        line_nu = jnp.concatenate([line_nu, jnp.zeros((pad,), line_nu.dtype)])
        tau_factor = jnp.concatenate(
            [tau_factor, jnp.zeros((tau_factor.shape[0], pad), tau_factor.dtype)], axis=1
        )
    if jblue is not None:
        from ..constants import CLIGHT

        jblue_of_line, e_cmf0, jblue_acc0, jblue_cnt0 = jblue
        njblue = jblue_acc0.shape[1]
        # out-of-selection lines route to the dropped index
        jb_map = jnp.where(jblue_of_line >= 0, jblue_of_line, njblue)
        if pad:
            jb_map = jnp.concatenate([jb_map, jnp.full((pad,), njblue, jb_map.dtype)])
        # e_cmf/nu_cmf is invariant along free flight (adiabatic redshift), so
        # the increment at each line is (t0 + D/c_prop) * CLIGHT * e0/nu0
        e_over_nu = CLIGHT * e_cmf0 / jnp.maximum(nu_cmf0, 1e-30)
    karange = jnp.arange(chunk, dtype=jnp.int32)
    row = jnp.arange(npkts)
    safe_chi = jnp.maximum(chi_cont, 1e-30)

    # packets starting past the whole list resolve analytically: continuum
    # event within the abort window or no event at all (matches the
    # invalid-index outcome of the per-line walk, rpkt.h:75-117)
    no_lines = cursor0 >= nlines
    nl_contdist = jnp.maximum(tau_rnd / safe_chi, 0.0)
    nl_cont = no_lines & active & (nl_contdist <= abort_dist)
    nl_noev = no_lines & active & ~nl_cont

    state = dict(
        b=jnp.min(jnp.where(active & ~no_lines, cursor0, jnp.int32(nlines))) // chunk,
        tau_cum=jnp.zeros_like(nu_cmf0),
        lastD=jnp.zeros_like(nu_cmf0),
        done=~active | no_lines,
        edist=jnp.where(nl_cont, nl_contdist, jnp.inf) + jnp.zeros_like(nu_cmf0),
        next_trans=jnp.where(
            nl_cont, jnp.int32(nlines + 1),
            jnp.where(nl_noev & ~fresh_nolines, jnp.int32(nlines),
                      next_trans_in.astype(jnp.int32)),
        ),
        is_bb=active & False,
        act_line=jnp.zeros_like(cursor0) - 99,
    )
    if jblue is not None:
        state["jb_acc"] = jblue_acc0
        state["jb_cnt"] = jblue_cnt0

    def cond(s):
        return jnp.logical_and(s["b"] < nblocks, ~jnp.all(s["done"]))

    def body(s):
        b = s["b"]
        l0 = b * chunk
        l_glob = l0 + karange[None, :]  # (1, chunk) broadcast with packets
        nu_k = jax.lax.dynamic_slice_in_dim(line_nu, l0, chunk)[None, :]
        # the only 2D load: a row gather of the per-timestep tau table block
        tau_blk = jax.lax.dynamic_slice_in_dim(tau_factor, l0, chunk, axis=1)[cellidx]

        below = l_glob < cursor0[:, None]  # before this packet's walk start
        beyond = l_glob > nlines - 1
        validk = ~below & ~beyond & ~s["done"][:, None]

        # global closed-form distances from the packet's event-step origin
        # (rpkt.cc:141-149 linear nu(d); rpkt.h:72 t*nu_cmf invariant)
        if relativistic:
            relD = (nu_k - nu_cmf0[:, None]) / d_nu_on_d_l[:, None]
        else:
            relD = CLIGHT_PROP * prop_time0[:, None] * (nu_cmf0[:, None] / nu_k - 1.0)
        # clamp: d_nu_on_d_l ~ -0 when abort_dist ~ 0 gives inf, and 0 * inf
        # then NaN-poisons the cumulative tau of the whole walk
        relD = jnp.clip(relD, 0.0, 1e30)
        relD = jnp.where(validk, relD, 0.0)

        # tau_sobolev is evaluated at the time of the previous line
        # (rpkt.cc:123); the first line of the walk anchors at t0
        relD_prev = jnp.concatenate([s["lastD"][:, None], relD[:, :-1]], axis=1)
        t_prev = prop_time0[:, None] + relD_prev / CLIGHT_PROP
        tau_line = jnp.where(validk, tau_blk * t_prev, 0.0)

        s_cum = jnp.cumsum(tau_line, axis=1) - tau_line + s["tau_cum"][:, None]
        # clamp: a -ulp rounding of the numerator over ~1e-30 opacity would
        # otherwise give a huge negative event distance
        contdist = jnp.maximum((tau_rnd[:, None] - s_cum) / safe_chi[:, None], 0.0)

        ev_cont = jnp.where(validk, contdist <= relD, contdist <= abort_dist[:, None])
        ev_abort = validk & (nu_k < nu_cmf_abort[:, None])
        ev_bb = validk & (
            tau_rnd[:, None] - s_cum <= safe_chi[:, None] * relD + tau_line
        )
        terminal = ~below & (ev_cont | ev_abort | ev_bb | beyond) & ~s["done"][:, None]

        any_term = jnp.any(terminal, axis=1)
        jj = jnp.clip(jnp.argmax(terminal, axis=1), 0, chunk - 1).astype(jnp.int32)

        j_valid = validk[row, jj]
        j_cont = ev_cont[row, jj]
        j_abort = ev_abort[row, jj] & ~j_cont
        j_bb = ev_bb[row, jj] & ~j_cont & ~j_abort & j_valid
        j_cont_invalid = ~j_valid & j_cont  # continuum event past all lines
        j_noevent = ~j_valid & ~j_cont

        lineindex_j = jnp.clip(l0 + jj, 0, nlines - 1).astype(jnp.int32)
        contdist_j = contdist[row, jj]
        relD_j = relD[row, jj]

        newly = any_term & ~s["done"]
        edist = jnp.where(newly & (j_cont | j_cont_invalid), contdist_j, s["edist"])
        edist = jnp.where(newly & j_bb, relD_j, edist)

        next_trans = s["next_trans"]
        next_trans = jnp.where(
            newly & j_valid & (j_cont | j_abort), lineindex_j, next_trans
        )
        next_trans = jnp.where(newly & j_bb, lineindex_j + 1, next_trans)
        next_trans = jnp.where(newly & j_cont_invalid, jnp.int32(nlines + 1), next_trans)
        next_trans = jnp.where(
            newly & j_noevent,
            jnp.where(fresh_nolines, s["next_trans"], jnp.int32(l0) + jj),
            next_trans,
        )

        is_bb = jnp.where(newly, j_bb, s["is_bb"])
        act_line = jnp.where(newly & j_bb, lineindex_j, s["act_line"])

        not_term = ~any_term & ~s["done"]
        tau_cum = jnp.where(
            not_term, s["tau_cum"] + jnp.sum(tau_line, axis=1), s["tau_cum"]
        )
        lastD = jnp.where(not_term, jnp.maximum(s["lastD"], jnp.max(relD, axis=1)), s["lastD"])

        out = dict(
            b=b + 1, tau_cum=tau_cum, lastD=lastD,
            done=s["done"] | any_term, edist=edist, next_trans=next_trans,
            is_bb=is_bb, act_line=act_line,
        )
        if jblue is not None:
            # lines swept before the terminal (plus the activating line on a
            # bound-bound event) feed the detailed J_b_lu estimators
            # (reference: rpkt.cc:151-167)
            kk = karange[None, :]
            passed = validk & (
                ~any_term[:, None] | (kk < jj[:, None])
                | ((kk == jj[:, None]) & j_bb[:, None])
            )
            t_line = prop_time0[:, None] + relD / CLIGHT_PROP
            inc = jnp.where(passed, t_line * e_over_nu[:, None], 0.0)
            jb_blk = jax.lax.dynamic_slice_in_dim(jb_map, l0, chunk)
            out["jb_acc"] = s["jb_acc"].at[
                cellidx[:, None], jb_blk[None, :]
            ].add(inc, mode="drop")
            out["jb_cnt"] = s["jb_cnt"].at[
                cellidx[:, None], jb_blk[None, :]
            ].add(passed.astype(inc.dtype), mode="drop")
        return out

    out = jax.lax.while_loop(cond, body, state)
    res = EventResult(
        edist=out["edist"],
        next_trans=out["next_trans"],
        is_boundbound=out["is_bb"],
        activating_line=out["act_line"],
    )
    if jblue is not None:
        return res, out["jb_acc"], out["jb_cnt"]
    return res
