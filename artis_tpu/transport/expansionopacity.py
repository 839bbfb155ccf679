"""Binned expansion opacities (EXPANSIONOPACITIES_ON mode).

TPU-native rebuild of the reference's binned line-opacity treatment
(reference: rpkt.cc:30-75 bin layout, 199-290 get_event_expansion_opacity,
calculate_expansion_opacities, 905-935 Planck-weighted bin sampling).

Per timestep, each cell's Sobolev line opacities collapse into wavelength
bins: kappa_bin = sum_{lines in bin} (lambda_line/delta_lambda)
(1 - exp(-tau)) / (c t_mid rho). Transport then walks bins of constant
opacity instead of individual lines — one vectorised pass, no line gathers.
Bound-bound events thermalise with a fixed probability (frequency resampled
from Planck x kappa) and scatter coherently otherwise, exactly the
RPKT_BOUNDBOUND_THERMALISATION_PROBABILITY >= 0 mode of the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import CLIGHT, CLIGHT_PROP

LAMBDA_MIN = 534.5  # Angstrom (rpkt.cc:32)
LAMBDA_MAX = 35000.0
DELTA_LAMBDA = 35.5
NBINS = int((LAMBDA_MAX - LAMBDA_MIN) / DELTA_LAMBDA)


def bin_nu_upper(binindex):
    return 1e8 * CLIGHT / (LAMBDA_MIN + binindex * DELTA_LAMBDA)


def bin_nu_lower(binindex):
    return 1e8 * CLIGHT / (LAMBDA_MIN + (binindex + 1) * DELTA_LAMBDA)


def build_expansion_opacities(tau_sob_factor, dad, rho, t_r, t_mid):
    """(ncells, NBINS) kappa [cm^2/g] + Planck-weighted cumulative
    (reference: calculate_expansion_opacities)."""
    from ..plasma.radfield import dbb

    lam = 1e8 * CLIGHT / dad.line_nu  # (nlines,) Angstrom
    binidx = jnp.floor((lam - LAMBDA_MIN) / DELTA_LAMBDA).astype(jnp.int32)
    binidx = jnp.where((binidx >= 0) & (binidx < NBINS), binidx, NBINS)  # OOB drop
    tau = tau_sob_factor * t_mid  # (ncells, nlines)
    w = (lam / DELTA_LAMBDA)[None, :].astype(tau.dtype) * -jnp.expm1(-tau)
    binsum = jnp.zeros((tau.shape[0], NBINS), tau.dtype).at[:, binidx].add(
        w, mode="drop"
    )
    kappa = binsum / (CLIGHT * t_mid * jnp.maximum(rho, 1e-300)[:, None])
    # Planck-weighted cumulative for thermalised re-emission sampling
    b = jnp.arange(NBINS)
    nu_lo = bin_nu_lower(b).astype(tau.dtype)
    nu_hi = bin_nu_upper(b).astype(tau.dtype)
    nu_mid = 0.5 * (nu_lo + nu_hi)
    planck = dbb(nu_mid[None, :], jnp.maximum(t_r, 1.0)[:, None], 1.0)
    pc = jnp.cumsum(kappa * planck * (nu_hi - nu_lo)[None, :], axis=1)
    return kappa, pc


def build_line_selection(tau_sob_factor, dad, t_mid):
    """Per-cell cumulative line weights for resolving WHICH line a
    bound-bound expansion-opacity event activates (reference with
    RPKT_BOUNDBOUND_THERMALISATION_PROBABILITY < 0 re-traces the hit bin
    line-by-line, rpkt.cc:238-262; we draw the line from its contribution
    (lambda/dlambda)(1-exp(-tau)) to the bin opacity — the same summand
    build_expansion_opacities bins, and the leading-order probability of
    the reference's in-bin walk).

    Returns (wcum, binoffsets): wcum is the (ncells, nlines) per-cell
    cumulative of the weights along the descending-frequency line list;
    binoffsets is (NBINS+1,) line-index offsets of each wavelength bin's
    contiguous segment in that list.
    """
    lam = 1e8 * CLIGHT / dad.line_nu  # ascending (line list is nu-descending)
    tau = tau_sob_factor * t_mid  # (ncells, nlines)
    in_range = (lam >= LAMBDA_MIN) & (lam < LAMBDA_MAX)
    w = jnp.where(
        in_range[None, :],
        (lam / DELTA_LAMBDA)[None, :].astype(tau.dtype) * -jnp.expm1(-tau),
        0.0,
    )
    wcum = jnp.cumsum(w, axis=1)
    edges = LAMBDA_MIN + DELTA_LAMBDA * jnp.arange(NBINS + 1, dtype=lam.dtype)
    binoffsets = jnp.searchsorted(lam, edges).astype(jnp.int32)
    return wcum, binoffsets


def sample_bb_line(key, wcum, binoffsets, cellidx, nu_cmf, mask, chunk=1024):
    """Draw the activating line for a bound-bound expansion-opacity event.

    The event's wavelength bin is recovered from the packet's comoving
    frequency at the event point; the line is drawn within that bin's
    contiguous line segment proportionally to its bin-opacity weight.
    Returns (lineidx, ok): ok=False when the bin holds no line weight
    (caller falls back to coherent scatter)."""
    n = cellidx.shape[0]
    dtype = wcum.dtype
    nlines = wcum.shape[1]
    lam_ev = 1e8 * CLIGHT / jnp.maximum(nu_cmf, 1.0)
    b = jnp.clip(
        jnp.floor((lam_ev - LAMBDA_MIN) / DELTA_LAMBDA).astype(jnp.int32),
        0, NBINS - 1,
    )
    start = binoffsets[b]
    end = binoffsets[b + 1]
    cellc = jnp.maximum(cellidx, 0)
    w_lo = jnp.where(start > 0, wcum[cellc, jnp.maximum(start - 1, 0)], 0.0)
    w_hi = jnp.where(end > 0, wcum[cellc, jnp.maximum(end - 1, 0)], 0.0)
    ok = mask & (w_hi > w_lo)
    u = jax.random.uniform(key, (n,), dtype)
    target = w_lo + u * (w_hi - w_lo)

    # wcum rows are monotone: the selected line is start + #(entries in the
    # segment with wcum <= target); chunked so no (npkts, nlines) buffer
    nblocks = -(-nlines // chunk)

    def body(i, acc):
        l0 = i * chunk
        blk = jax.lax.dynamic_slice_in_dim(wcum, l0, chunk, axis=1)[cellc]
        gidx = (l0 + jnp.arange(chunk)[None, :]).astype(jnp.int32)
        inseg = (gidx >= start[:, None]) & (gidx < end[:, None])
        return (acc + jnp.sum(
            (inseg & (blk <= target[:, None])).astype(jnp.int32), axis=1,
        )).astype(jnp.int32)

    if nblocks * chunk == nlines:
        cnt = jax.lax.fori_loop(0, nblocks, body, jnp.zeros((n,), jnp.int32))
    else:
        pad = nblocks * chunk - nlines
        wcum = jnp.pad(wcum, ((0, 0), (0, pad)), constant_values=jnp.inf)
        cnt = jax.lax.fori_loop(0, nblocks, body, jnp.zeros((n,), jnp.int32))
    lineidx = jnp.clip(start + cnt, 0, nlines - 1)
    return lineidx, ok


def get_event_expansion_batch(
    kappa_rho_dop,  # (npkts, NBINS): kappa[cell] * rho * doppler, precomputed
    nu_cmf0, prop_time0, chi_cont, tau_rnd, abort_dist, nu_cmf_abort,
    d_nu_on_d_l, active, relativistic: bool,
):
    """Vectorised bin walk (reference: rpkt.cc:199-290, thermalisation-mode).

    Returns (edist, is_boundbound): the distance to the next event and whether
    the random split chi_bb/(chi_cont+chi_bb) must be drawn by the caller via
    the returned chi ratio at the event bin.
    """
    dtype = nu_cmf0.dtype
    b = jnp.arange(NBINS)
    nu_lo_edges = bin_nu_lower(b).astype(dtype)[None, :]  # (1, NBINS) descending per bin

    # distance from the packet origin to each bin's LOWER-nu edge (global
    # closed form, same as the line walk)
    if relativistic:
        d_edge = (nu_lo_edges - nu_cmf0[:, None]) / d_nu_on_d_l[:, None]
    else:
        d_edge = CLIGHT_PROP * prop_time0[:, None] * (nu_cmf0[:, None] / nu_lo_edges - 1.0)
    # clamp: when the d_nu_on_d_l secant degenerates (guarded to -1e-300 at
    # abort_dist ~ 0, or an inconsistent nu_cmf), d_edge overflows to +inf and
    # seg/cum then produce inf-inf = NaN, silently dropping the event; a large
    # finite cap keeps the whole remaining tau budget in the current bin
    # instead (the Pallas kernel clips identically)
    d_edge = jnp.clip(d_edge, 0.0, 1e30)  # edges already passed contribute zero
    d_prev = jnp.concatenate([jnp.zeros_like(d_edge[:, :1]), d_edge[:, :-1]], axis=1)
    seg = jnp.maximum(d_edge - d_prev, 0.0)  # path length inside each bin

    chi_tot = chi_cont[:, None] + kappa_rho_dop  # (npkts, NBINS)
    dtau = chi_tot * seg
    cum = jnp.cumsum(dtau, axis=1) - dtau  # exclusive prefix
    hit = (cum + dtau >= tau_rnd[:, None]) & (seg > 0)
    anyhit = jnp.any(hit, axis=1)
    j = jnp.clip(jnp.argmax(hit, axis=1), 0, NBINS - 1)
    row = jnp.arange(nu_cmf0.shape[0])
    # solve within the bin
    edist = d_prev[row, j] + (tau_rnd - cum[row, j]) / jnp.maximum(chi_tot[row, j], 1e-30)
    edist = jnp.where(anyhit & active, jnp.maximum(edist, 0.0), jnp.inf)
    bb_frac = jnp.where(
        anyhit, kappa_rho_dop[row, j] / jnp.maximum(chi_tot[row, j], 1e-30), 0.0
    )
    return edist, bb_frac


def sample_planck_times_expansion_opacity(key, planck_cum, cellidx, mask):
    """Thermalised re-emission frequency (reference: rpkt.cc:918-935)."""
    rows = planck_cum[cellidx]  # (npkts, NBINS)
    total = jnp.maximum(rows[:, -1], 1e-300)
    u = jax.random.uniform(key, cellidx.shape, rows.dtype) * total
    binindex = jnp.minimum(
        jnp.sum((rows <= u[:, None]).astype(jnp.int32), axis=1), NBINS - 1
    )
    nu_lo = bin_nu_lower(binindex).astype(rows.dtype)
    nu_hi = bin_nu_upper(binindex).astype(rows.dtype)
    u2 = jax.random.uniform(jax.random.fold_in(key, 1), cellidx.shape, rows.dtype)
    nu = nu_lo + u2 * (nu_hi - nu_lo)
    return jnp.where(mask, nu, 0.0)
