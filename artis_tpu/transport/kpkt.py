"""k-packet (thermal pool) destruction: cooling-channel sampling.

TPU-native rebuild of the reference k-packet machinery (reference:
kpkt.cc:405-645 do_kpkt, kpkt.cc:262-291 calculate_cooling_rates). The
reference samples one flat cumulative cooling list per cell; here the choice
is hierarchical — ion by per-ion totals, then process type, then the specific
level/continuum by chunked cumulative walks — which is distribution-identical
and maps onto gathers over the precomputed ProcessRates tables.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..atomic import DeviceAtomicData
from ..constants import H, KB
from ..options import Options
from ..packets import EMTYPE_FREEFREE, EMTYPE_NOTSET, PacketState, TYPE_KPKT, TYPE_MA, TYPE_RPKT
from ..plasma.ratecoeff import RateCoeffTables, select_continuum_nu_batch
from ..plasma.transitionrates import ProcessRates, trans_values_at
from .macroatom import MacroAtomAux, _select_chunked


def do_kpkt_batch(
    key,
    dad: DeviceAtomicData,
    aux: MacroAtomAux,
    rc: RateCoeffTables,
    rates: ProcessRates,
    levelpops: jax.Array,
    st: PacketState,
    mask: jax.Array,  # k-packets in non-thick cells to process
    cellidx: jax.Array,  # (npkts,) safe nonemptymgi
    t_e_c: jax.Array,
    nne_c: jax.Array,
    t2: float,
    ts_width: float,
    kpktdiffusion_timescale: float,
    apply_diffusion: bool,
):
    """Select the cooling process for each k-packet.

    Returns (st, ma_mask, ma_level): packets converting to macro-atoms are
    flagged for the caller's do_macroatom_batch pass.
    """
    npkts = st.npkts
    dtype = st.pos.dtype
    t_e = t_e_c[cellidx]
    nne = nne_c[cellidx]

    # kpkt diffusion time (reference: kpkt.cc:412-425)
    deltat = kpktdiffusion_timescale * ts_width if apply_diffusion else 0.0
    t1 = st.prop_time
    t_current = t1 + deltat
    defer = mask & (t_current > t2)
    proceed = mask & ~defer
    scale = jnp.where(defer, t2 / t1, jnp.where(proceed, t_current / t1, 1.0))
    st = st.replace(
        pos=st.pos * scale[:, None],
        prop_time=jnp.where(defer, t2, jnp.where(proceed, t_current, st.prop_time)),
    )

    # --- select the cooling ion (reference: kpkt.cc:434-470) ---
    ion_cool = rates.ion_cooling[cellidx]  # (npkts, nions)
    cum_ion = jnp.cumsum(ion_cool, axis=1)
    total = jnp.maximum(cum_ion[:, -1], 1e-300)
    u_ion = jax.random.uniform(jax.random.fold_in(key, 1), (npkts,), dtype) * total
    ion = jnp.minimum(
        jnp.sum((cum_ion <= u_ion[:, None]).astype(jnp.int32), axis=1), dad.nions_total - 1
    )

    # --- select the process type within the ion ---
    c_ff = rates.cool_ff_ion[cellidx, ion]
    c_exc = rates.cool_exc_ion[cellidx, ion]
    c_ionz = rates.cool_ion_ion[cellidx, ion]
    c_fb = rates.cool_fb_ion[cellidx, ion]
    ctot = jnp.maximum(c_ff + c_exc + c_ionz + c_fb, 1e-300)
    u_t = jax.random.uniform(jax.random.fold_in(key, 2), (npkts,), dtype) * ctot
    # a cell with zero total cooling (possible only in degenerate test
    # scenes, e.g. nne=0 with a bound-bound-only atom) must not fall
    # through to the residual fb branch and sample a padded continuum:
    # send it out as an ff photon at the local T_e instead
    zero_cool = (c_ff + c_exc + c_ionz + c_fb) <= 0.0
    is_ff = proceed & ((u_t < c_ff) | zero_cool)
    is_exc = proceed & ~is_ff & (u_t < c_ff + c_exc)
    is_ionz = proceed & ~is_ff & ~is_exc & (u_t < c_ff + c_exc + c_ionz)
    is_fb = proceed & ~is_ff & ~is_exc & ~is_ionz

    # --- free-free: emit rpkt with nu = -kT/h ln(u) (kpkt.cc:512-536) ---
    u_ff = jax.random.uniform(
        jax.random.fold_in(key, 3), (npkts,), dtype, minval=jnp.finfo(dtype).tiny, maxval=1.0
    )
    nu_ff = -KB * t_e / H * jnp.log(u_ff)

    # --- free-bound: select the continuum within the ion (kpkt.cc:538-576) ---
    def fb_value_at(k):
        bidx = jnp.clip(aux.ion_cont_start[ion][:, None] + k[None, :], 0,
                        max(dad.nbfcontinua - 1, 0))
        ci = aux.ioncont_cont_of_lower[bidx]
        return rates.cool_fb_cont[cellidx[:, None], ci]

    u_fb = jax.random.uniform(jax.random.fold_in(key, 4), (npkts,), dtype) * jnp.maximum(c_fb, 1e-300)
    kfb = _select_chunked(u_fb, aux.ion_cont_count[ion], max(aux.max_ioncont_ion, 1), fb_value_at)
    fb_bidx = jnp.clip(aux.ion_cont_start[ion] + kfb, 0, max(dad.nbfcontinua - 1, 0))
    fb_cont = aux.ioncont_cont_of_lower[fb_bidx].astype(jnp.int32)
    nu_fb = select_continuum_nu_batch(jax.random.fold_in(key, 5), dad, fb_cont, t_e, is_fb)

    # --- collisional ionisation: MA activation at the continuum target
    # (kpkt.cc:622-639) ---
    def ionz_value_at(k):
        bidx = jnp.clip(aux.ion_cont_start[ion][:, None] + k[None, :], 0,
                        max(dad.nbfcontinua - 1, 0))
        ci = aux.ioncont_cont_of_lower[bidx]
        return rates.cool_ion_cont[cellidx[:, None], ci]

    u_iz = jax.random.uniform(jax.random.fold_in(key, 6), (npkts,), dtype) * jnp.maximum(c_ionz, 1e-300)
    kiz = _select_chunked(u_iz, aux.ion_cont_count[ion], max(aux.max_ioncont_ion, 1), ionz_value_at)
    iz_bidx = jnp.clip(aux.ion_cont_start[ion] + kiz, 0, max(dad.nbfcontinua - 1, 0))
    iz_cont = aux.ioncont_cont_of_lower[iz_bidx]
    ma_level_ionz = dad.cont_uniqueupper[iz_cont]

    # --- collisional excitation: select level then upper (kpkt.cc:577-621) ---
    def exc_level_value_at(k):
        lvl = jnp.clip(dad.ion_level_start[ion][:, None] + k[None, :], 0, dad.nlevels_total - 1)
        return rates.cool_exc_level[cellidx[:, None], lvl]

    u_ex = jax.random.uniform(jax.random.fold_in(key, 7), (npkts,), dtype) * jnp.maximum(c_exc, 1e-300)
    kex = _select_chunked(u_ex, dad.ion_nlevels[ion], max(aux.max_nlevels_ion, 1),
                          exc_level_value_at)
    exc_level = jnp.clip(dad.ion_level_start[ion] + kex, 0, dad.nlevels_total - 1)

    def exc_upper_value_at(k):
        # n_l * C * eps_trans per up transition, computed lazily for this
        # (npkts, chunk) window (transitionrates.trans_values_at — the
        # collisional rate needs no radiation field, so tr/w are dummies)
        base = dad.level_alltrans_start[exc_level] + dad.level_ndowntrans[exc_level]
        tidx = jnp.clip(base[:, None] + k[None, :], 0, dad.ntrans_total - 1)
        _, _, v_coolexc = trans_values_at(
            dad, levelpops, cellidx, tidx, t_e, nne,
            jnp.ones_like(t_e), jnp.zeros_like(t_e), 1.0,  # t_mid only
            rates.jb_line, rates.jb_arr)  # enters via beta: radiative-only
        return v_coolexc

    u_ex2 = jax.random.uniform(jax.random.fold_in(key, 8), (npkts,), dtype)
    lvl_cool = rates.cool_exc_level[cellidx, exc_level]
    kup = _select_chunked(u_ex2 * jnp.maximum(lvl_cool, 1e-300),
                          dad.level_nuptrans[exc_level], max(aux.max_nuptrans, 1),
                          exc_upper_value_at)
    base = dad.level_alltrans_start[exc_level] + dad.level_ndowntrans[exc_level]
    tidx = jnp.clip(base + kup, 0, dad.ntrans_total - 1)
    ma_level_exc = dad.ion_level_start[dad.level_ion[exc_level]] + dad.trans_target[tidx]

    # --- apply outcomes ---
    # radiative channels (ff, fb): become r-packets; caller re-emits direction
    rad_mask = is_ff | is_fb
    nu_new = jnp.where(is_ff, nu_ff, jnp.where(is_fb, nu_fb, st.nu_cmf))
    emtype = jnp.where(
        is_ff, EMTYPE_FREEFREE,
        jnp.where(is_fb, aux.cont_emtype[fb_cont].astype(jnp.int32), st.emissiontype),
    )
    st = st.replace(
        nu_cmf=jnp.where(rad_mask, nu_new, st.nu_cmf),
        emissiontype=jnp.where(rad_mask, emtype, st.emissiontype),
        next_trans=jnp.where(rad_mask, -1, st.next_trans),
        # both radiative exits stamp the true emission type
        # (reference: kpkt.cc:569)
        trueemissiontype=jnp.where(rad_mask, emtype, st.trueemissiontype),
    )

    ma_mask = is_exc | is_ionz
    ma_level = jnp.where(is_exc, ma_level_exc, ma_level_ionz).astype(jnp.int32)
    st = st.replace(
        ptype=jnp.where(ma_mask, TYPE_MA, st.ptype),
        trueemissiontype=jnp.where(ma_mask, EMTYPE_NOTSET, st.trueemissiontype),
        trueemissionvelocity=jnp.where(ma_mask, -1.0, st.trueemissionvelocity),
    )
    return st, rad_mask, ma_mask, ma_level
