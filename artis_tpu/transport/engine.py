"""The batched packet-transport engine: one timestep = a while_loop of masked
"advance one action" micro-steps over the whole packet batch.

TPU-native rebuild of the reference per-packet drivers (reference:
update_packets.cc:361-437 update_packets / 213-279 do_packet,
rpkt.cc:604-737 do_rpkt_step, gammapkt.cc:719-817 transport_gamma,
gammapkt.cc:380-458 compton_scatter, gammapkt.cc:983-1024
pellet_gamma_decay, kpkt.cc:377-402 do_kpkt_blackbody,
update_packets.cc:30-211 pellet/nonthermal handling).

Instead of recursing per packet until t2, every iteration advances EVERY
active packet by one action (pellet decay / gamma flight step / r-packet
event step / type conversion), with lax masking. The reference's
sort-by-cell cellcache is replaced by dense per-timestep (ncells, nlevels)
population tables that turn all plasma lookups into gathers.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial

import jax
import jax.numpy as jnp

from .. import geometry
from ..atomic import DeviceAtomicData
from ..constants import CLIGHT_PROP, H, ME_C2, MEV, PI, SIGMA_T, THOMSON_LIMIT
from ..estimators import Estimators, cell_add
from .. import stats
from ..grid import BOUNDARY_ESCAPE, GridData, boundary_distance
from ..options import Options, ThermalisationScheme
from ..packets import (
    EMTYPE_FREEFREE, EMTYPE_NOTSET, PacketState, TYPE_ESCAPE, TYPE_GAMMA,
    TYPE_KPKT, TYPE_MA, TYPE_NONTHERMAL_PREDEPOSIT_ALPHA,
    TYPE_NONTHERMAL_PREDEPOSIT_BETAMINUS, TYPE_NONTHERMAL_PREDEPOSIT_BETAPLUS,
    TYPE_NTALPHA_DEPOSITED, TYPE_NTLEPTON_DEPOSITED, TYPE_PRE_KPKT,
    TYPE_RADIOACTIVE_PELLET, TYPE_RPKT,
)
from ..plasma.radfield import sample_planck_montecarlo
from . import opacity
from .linewalk import get_event_batch
from . import vpkt as vpkt_mod
from ..decay import (
    DECAYTYPE_ALPHA, DECAYTYPE_BETAMINUS, DECAYTYPE_BETAPLUS,
)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "levelpops", "nnion", "chi_ff_nnionpart", "tau_sob_factor",
        "bf_a", "bf_dep", "expopac_kappa", "expopac_planck_cum",
        "expopac_wcum", "expopac_binoffsets",
        "elem_numberdens", "xcom_energy", "xcom_sigma",
        "vpkt_cum_tau", "vpkt_cum_taunu", "vpkt_cfg",
        "nt_frac_ion_by_ion", "nt_frac_ionization", "nt_ionenfrac_auger",
        "nt_frac_excitation", "nt_exc_fracdep_cum", "nt_exc_upper",
        "jblue_of_line",
        "barnes_t_ineff", "barnes_tau_ineff_lepton",
        "barnes_tau_ineff_alpha", "rho_t_mgi", "rho_tmin_mgi",
        "tmin", "gammaline_energy",
        "gammaline_cumfrac", "gammaline_nlines", "nuc_engamma",
        "ts", "t2", "t_mid", "is_first_timestep",
    ],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class StepContext:
    """Per-timestep data prepared by the driver before transport."""

    levelpops: jax.Array  # (ncells, nlevels_total)
    nnion: jax.Array  # (ncells, nions_total)
    chi_ff_nnionpart: jax.Array  # (ncells,)
    tau_sob_factor: jax.Array  # (ncells, nlines) linewalk.build_tau_factor
    bf_a: jax.Array  # (ncells, nbfcontinua) opacity.build_bf_tables
    bf_dep: jax.Array  # (ncells, nbfcontinua) LOG departure (f32-safe form)
    expopac_kappa: jax.Array  # (ncells, NBINS) expansion opacities [cm2/g]
    expopac_planck_cum: jax.Array  # (ncells, NBINS) Planck-weighted cumulative
    expopac_wcum: jax.Array  # (ncells, nlines) cumulative bb-line weights
    expopac_binoffsets: jax.Array  # (NBINS+1,) line segment offsets per bin
    elem_numberdens: jax.Array  # (ncells, nelements) for XCOM gamma photoion
    xcom_energy: jax.Array  # (nelements, L) [MeV]
    xcom_sigma: jax.Array  # (nelements, L) [barn]
    vpkt_cum_tau: jax.Array  # (ncells, nlines+1) vpkt closed-form line tau
    vpkt_cum_taunu: jax.Array
    vpkt_cfg: object  # VpktConfig pytree or None
    nt_frac_ion_by_ion: jax.Array  # (ncells, nions) Spencer-Fano split
    nt_frac_ionization: jax.Array  # (ncells,)
    nt_ionenfrac_auger: jax.Array  # (ncells, nions, naug) energy-weighted
    # Auger upper-ion probabilities (nonthermal.cc:2157-2203)
    nt_frac_excitation: jax.Array  # (ncells,)
    # NT excitation channel (nonthermal.cc:2353-2380): per-cell cumulative
    # frac_deposition over the stored excitation transitions + upper levels
    nt_exc_fracdep_cum: jax.Array  # (ncells, nexc)
    nt_exc_upper: jax.Array  # (nexc,)
    jblue_of_line: jax.Array  # (nlines,) detailed-line index or -1
    gammaline_energy: jax.Array  # (nnuc, maxlines) [erg]
    gammaline_cumfrac: jax.Array  # (nnuc, maxlines)
    gammaline_nlines: jax.Array  # (nnuc,)
    nuc_engamma: jax.Array  # (nnuc,)
    barnes_t_ineff: jax.Array  # scalar [s] (Barnes gamma thermalisation)
    barnes_tau_ineff_lepton: jax.Array  # scalar [s] (Barnes particle scheme)
    barnes_tau_ineff_alpha: jax.Array  # scalar [s]
    rho_t_mgi: jax.Array  # (npts_model+1,) density at t_mid (analytic schemes)
    rho_tmin_mgi: jax.Array  # (npts_model+1,)
    tmin: jax.Array  # scalar [s]
    ts: jax.Array  # scalar: timestep start [s]
    t2: jax.Array  # scalar: timestep end [s]
    t_mid: jax.Array  # scalar
    is_first_timestep: jax.Array  # scalar bool


def _uniform(key, tag: int, n: int, dtype):
    return jax.random.uniform(jax.random.fold_in(key, tag), (n,), dtype)


def _isotropic(key, tag: int, n: int, dtype):
    return geometry.rand_isotropic_unitvec(jax.random.fold_in(key, tag), (n,), dtype)


def emit_rpkt_batch(key, tag, st: PacketState, mask, opts: Options) -> PacketState:
    """Isotropic cmf re-emission (reference: rpkt.cc:945-970)."""
    n = st.npkts
    dir_cmf = _isotropic(key, tag, n, st.pos.dtype)
    vel_rev = st.pos / (-st.prop_time)[:, None]
    new_dir = geometry.angle_ab(dir_cmf, vel_rev)
    doppler = geometry.doppler_nucmf_on_nurf(
        st.pos, new_dir, st.prop_time, opts.use_relativistic_doppler_shift
    )
    m = mask
    return st.replace(
        ptype=jnp.where(m, TYPE_RPKT, st.ptype),
        dir=jnp.where(m[:, None], new_dir, st.dir),
        nu_rf=jnp.where(m, st.nu_cmf / doppler, st.nu_rf),
        e_rf=jnp.where(m, st.e_cmf / doppler, st.e_rf),
        stokes=jnp.where(
            m[:, None],
            jnp.concatenate(
                [jnp.ones((n, 1), st.stokes.dtype), jnp.zeros((n, 2), st.stokes.dtype)], axis=1
            ),
            st.stokes,
        ),
    )


def electron_scatter_batch(key, tag, st: PacketState, mask, opts: Options) -> PacketState:
    """Thomson scattering with optional dipole angular sampling and full
    Stokes-vector transport (reference: rpkt.cc:292-409 electron_scatter_rpkt).

    The scattering angles are drawn in the comoving frame; Stokes Q,U ride
    along through RF->CMF transform, rotation into the scattering plane (i1),
    the Rayleigh scattering matrix, rotation back to the meridian frame (i2),
    and the CMF->RF transform.
    """
    n = st.npkts
    dtype = st.pos.dtype
    vel = st.pos / st.prop_time[:, None]
    qi, ui = st.stokes[:, 1], st.stokes[:, 2]
    old_dir_cmf, qi, ui = geometry.frame_transform(st.dir, qi, ui, vel)

    k = jax.random.fold_in(key, tag)
    z0 = jax.random.uniform(jax.random.fold_in(k, 0), (2, n), dtype)
    m_ang = 2.0 * z0[0] - 1.0
    phisc = 2.0 * PI * z0[1]
    if opts.dipole:
        # batched rejection sampling of the dipole phase function
        # p(mu,phi) = (mu^2+1) + (mu^2-1)(Q cos2phi + U sin2phi), max 2
        # (Code & Whitney 1995).  Mean acceptance is 2/3, so 48 fixed
        # trials leave < 1e-8 unconverged lanes (which keep the last draw).
        def body(i, carry):
            accepted, m_acc, ph_acc = carry
            z = jax.random.uniform(jax.random.fold_in(k, i + 1), (3, n), dtype)
            m_try = 2.0 * z[0] - 1.0
            mu2 = m_try * m_try
            ph_try = 2.0 * PI * z[1]
            p = (mu2 + 1.0) + (mu2 - 1.0) * (
                jnp.cos(2.0 * ph_try) * qi + jnp.sin(2.0 * ph_try) * ui
            )
            take = ~accepted & (2.0 * z[2] <= p)
            return (
                accepted | take,
                jnp.where(take, m_try, m_acc),
                jnp.where(take, ph_try, ph_acc),
            )

        _, m_ang, phisc = jax.lax.fori_loop(
            0, 48, body, (jnp.zeros(n, bool), m_ang, phisc)
        )

    # rotate old_dir_cmf by (theta_sc, phi_sc) (rpkt.cc:343-357)
    cos_t = m_ang
    sin_t = jnp.sqrt(jnp.maximum(1.0 - m_ang * m_ang, 0.0))
    odx, ody, odz = old_dir_cmf[:, 0], old_dir_cmf[:, 1], old_dir_cmf[:, 2]
    general = jnp.abs(odz) < 0.99999
    root = jnp.sqrt(jnp.maximum(1.0 - odz * odz, 1e-30))
    cphi, sphi = jnp.cos(phisc), jnp.sin(phisc)
    gx = sin_t / root * (ody * sphi - odx * odz * cphi) + odx * cos_t
    gy = sin_t / root * (-odx * sphi - ody * odz * cphi) + ody * cos_t
    gz = sin_t * cphi * root + odz * cos_t
    px = sin_t * cphi
    py = sin_t * sphi
    pz = jnp.where(odz > 0, cos_t, -cos_t)
    new_dir_cmf = jnp.where(
        general[:, None],
        jnp.stack([gx, gy, gz], axis=-1),
        jnp.stack([px, py, pz], axis=-1),
    )

    # rotate Stokes into the scattering plane (angle i1, Bulla+2015)
    ref1_o, ref2_o = geometry.meridian(old_dir_cmf)
    i1 = geometry.get_rot_angle(old_dir_cmf, new_dir_cmf, ref1_o, ref2_o)
    cos2i1, sin2i1 = jnp.cos(2.0 * i1), jnp.sin(2.0 * i1)
    q_old = qi * cos2i1 - ui * sin2i1
    u_old = qi * sin2i1 + ui * cos2i1

    # Rayleigh scattering matrix
    mu = geometry.dot(old_dir_cmf, new_dir_cmf)
    i_new = 0.75 * ((mu * mu + 1.0) + q_old * (mu * mu - 1.0))
    q_new = 0.75 * ((mu * mu - 1.0) + q_old * (mu * mu + 1.0)) / i_new
    u_new = 1.5 * mu * u_old / i_new

    # rotate back to the meridian frame of the new direction (angle i2)
    ref1_n, ref2_n = geometry.meridian(new_dir_cmf)
    i2 = PI + geometry.get_rot_angle(new_dir_cmf, old_dir_cmf, ref1_n, ref2_n)
    cos2i2, sin2i2 = jnp.cos(2.0 * i2), jnp.sin(2.0 * i2)
    q_f = q_new * cos2i2 + u_new * sin2i2
    u_f = -q_new * sin2i2 + u_new * cos2i2

    new_dir_rf, q_f, u_f = geometry.frame_transform(new_dir_cmf, q_f, u_f, -vel)
    # degenerate geometry (dir ~ polar axis / zero-length scattering plane)
    # can NaN the rotation angles; fall back to unpolarised there
    bad = ~(jnp.isfinite(q_f) & jnp.isfinite(u_f))
    q_f = jnp.where(bad, 0.0, q_f)
    u_f = jnp.where(bad, 0.0, u_f)
    doppler = geometry.doppler_nucmf_on_nurf(
        st.pos, new_dir_rf, st.prop_time, opts.use_relativistic_doppler_shift
    )
    stokes_new = jnp.stack([jnp.ones(n, dtype), q_f, u_f], axis=-1)
    m = mask
    return st.replace(
        ptype=jnp.where(m, TYPE_RPKT, st.ptype),
        dir=jnp.where(m[:, None], new_dir_rf, st.dir),
        nu_rf=jnp.where(m, st.nu_cmf / doppler, st.nu_rf),
        e_rf=jnp.where(m, st.e_cmf / doppler, st.e_rf),
        stokes=jnp.where(m[:, None], stokes_new, st.stokes),
    )


# ---------------------------------------------------------------------------
# pellets (reference: update_packets.cc:149-211 update_pellet)
# ---------------------------------------------------------------------------


def pellet_step(key, st: PacketState, est: Estimators, ctx: StepContext, opts: Options):
    n = st.npkts
    is_pellet = (st.ptype == TYPE_RADIOACTIVE_PELLET) & (st.prop_time < ctx.t2)
    ts = st.prop_time
    tdecay = st.tdecay

    no_decay = is_pellet & (tdecay > ctx.t2)
    decays_now = is_pellet & (tdecay <= ctx.t2) & (tdecay > ts)
    early_decay = is_pellet & (tdecay <= ts) & (tdecay > 0) & ctx.is_first_timestep

    # move with the flow
    scale_nodecay = jnp.where(no_decay, ctx.t2 / ts, 1.0)
    scale_decay = jnp.where(decays_now, tdecay / ts, 1.0)
    pos = st.pos * (scale_nodecay * scale_decay)[:, None]
    prop_time = jnp.where(no_decay, ctx.t2, jnp.where(decays_now, tdecay, st.prop_time))

    est = est.replace(
        pellet_decays=est.pellet_decays + jnp.sum(decays_now).astype(est.pellet_decays.dtype)
    )

    # particle-origin pellets become predeposit particles
    to_particle = decays_now & st.originated_from_particlenotgamma
    dt = st.pellet_decaytype
    newtype = st.ptype
    newtype = jnp.where(
        to_particle & (dt == DECAYTYPE_BETAPLUS), TYPE_NONTHERMAL_PREDEPOSIT_BETAPLUS, newtype
    )
    newtype = jnp.where(
        to_particle & (dt == DECAYTYPE_BETAMINUS), TYPE_NONTHERMAL_PREDEPOSIT_BETAMINUS, newtype
    )
    newtype = jnp.where(
        to_particle & (dt == DECAYTYPE_ALPHA), TYPE_NONTHERMAL_PREDEPOSIT_ALPHA, newtype
    )
    est = est.replace(
        positron_emission=est.positron_emission
        + jnp.sum(jnp.where(to_particle & (dt == DECAYTYPE_BETAPLUS), st.e_cmf, 0.0)),
        electron_emission=est.electron_emission
        + jnp.sum(jnp.where(to_particle & (dt == DECAYTYPE_BETAMINUS), st.e_cmf, 0.0)),
        alpha_emission=est.alpha_emission
        + jnp.sum(jnp.where(to_particle & (dt == DECAYTYPE_ALPHA), st.e_cmf, 0.0)),
    )
    em_time = jnp.where(to_particle, prop_time, st.em_time)
    absorptiontype = jnp.where(to_particle, -10, st.absorptiontype)

    # gamma-origin pellets decay to gamma rays (gammapkt.cc:983-1024)
    to_gamma = decays_now & ~st.originated_from_particlenotgamma
    nuc = jnp.clip(st.pellet_nucindex, 0, ctx.gammaline_nlines.shape[0] - 1)
    has_spec = ctx.gammaline_nlines[nuc] > 0
    # no known gamma spectrum: straight to k-packets (gammapkt.cc:987-992)
    to_kpkt_nospec = to_gamma & ~has_spec
    newtype = jnp.where(to_kpkt_nospec, TYPE_KPKT, newtype)
    absorptiontype = jnp.where(to_kpkt_nospec, -6, absorptiontype)

    to_gamma = to_gamma & has_spec
    dir_cmf = _isotropic(key, 11, n, st.pos.dtype)
    vel_rev = pos / (-jnp.where(tdecay > 0, tdecay, 1.0))[:, None]
    gdir = geometry.angle_ab(dir_cmf, vel_rev)
    # sample the gamma line (gammapkt.cc:239-256 choose_gamma_ray)
    zrand = _uniform(key, 12, n, st.pos.dtype)
    cumrows = ctx.gammaline_cumfrac[nuc]  # (n, maxlines)
    lineidx = jnp.sum((zrand[:, None] > cumrows).astype(jnp.int32), axis=1)
    lineidx = jnp.clip(lineidx, 0, ctx.gammaline_energy.shape[1] - 1)
    nu_gamma = ctx.gammaline_energy[nuc, lineidx] / H
    doppler = geometry.doppler_nucmf_on_nurf(
        pos, gdir, jnp.maximum(prop_time, 1e-30), opts.use_relativistic_doppler_shift
    )
    est = est.replace(
        gamma_emission=est.gamma_emission + jnp.sum(jnp.where(decays_now & ~st.originated_from_particlenotgamma, st.e_cmf, 0.0))
    )
    newtype = jnp.where(to_gamma, TYPE_GAMMA, newtype)

    # pellets that decayed before tmin: Lucy 2004 pre-kpkts
    # (update_packets.cc:192-204)
    e_cmf = jnp.where(early_decay, st.e_cmf * tdecay / prop_time, st.e_cmf)
    newtype = jnp.where(early_decay, TYPE_PRE_KPKT, newtype)
    absorptiontype = jnp.where(early_decay, -7, absorptiontype)

    return st.replace(
        ptype=newtype,
        pos=pos,
        prop_time=prop_time,
        e_cmf=e_cmf,
        em_time=em_time,
        absorptiontype=absorptiontype,
        dir=jnp.where(to_gamma[:, None], gdir, st.dir),
        nu_cmf=jnp.where(to_gamma, nu_gamma, st.nu_cmf),
        nu_rf=jnp.where(to_gamma, nu_gamma / doppler, st.nu_rf),
        e_rf=jnp.where(to_gamma, e_cmf / doppler, st.e_rf),
        stokes=jnp.where(
            to_gamma[:, None],
            jnp.concatenate([jnp.ones((n, 1), st.stokes.dtype), jnp.zeros((n, 2), st.stokes.dtype)], axis=1),
            st.stokes,
        ),
    ), est


# ---------------------------------------------------------------------------
# non-thermal particle predeposit (reference: update_packets.cc:30-143)
# ---------------------------------------------------------------------------


def nonthermal_predeposit_step(
    key, st: PacketState, est: Estimators, ctx: StepContext, grid: GridData,
    cells_rho, opts: Options,
):
    n = st.npkts
    is_beta_minus = st.ptype == TYPE_NONTHERMAL_PREDEPOSIT_BETAMINUS
    is_beta_plus = st.ptype == TYPE_NONTHERMAL_PREDEPOSIT_BETAPLUS
    is_alpha = st.ptype == TYPE_NONTHERMAL_PREDEPOSIT_ALPHA
    mask = (is_beta_minus | is_beta_plus | is_alpha) & (st.prop_time < ctx.t2)

    deposit_type = jnp.where(is_alpha, TYPE_NTALPHA_DEPOSITED, TYPE_NTLEPTON_DEPOSITED)
    nonemptymgi = jnp.take(grid.nonemptymgi_of_cell, st.where)
    ts = st.prop_time

    scheme = opts.particle_thermalisation_scheme
    if scheme == ThermalisationScheme.INSTANT:
        en_deposited = jnp.where(mask, st.e_cmf, 0.0)
        newtype = jnp.where(mask, deposit_type, st.ptype)
        newpos, newtime, new_nucmf = st.pos, st.prop_time, st.nu_cmf
        deposited_now = mask
    elif scheme in (ThermalisationScheme.DETAILED, ThermalisationScheme.DETAILEDWITHGAMMAPRODUCTS):
        # Shingles+2023 local deposition (update_packets.cc:75-113)
        rho = jnp.where(nonemptymgi >= 0, cells_rho[jnp.maximum(nonemptymgi, 0)], 0.0)
        endot = jnp.where(is_alpha, 5.0e11 * MEV * rho, 4.0e10 * MEV * rho)
        endot = jnp.maximum(endot, 1e-300)
        particle_en = H * st.nu_cmf
        t_enzero = ts + particle_en / endot
        en_deposited = jnp.where(
            mask,
            st.e_cmf * (jnp.minimum(ctx.t2, t_enzero) - ts) / (particle_en / endot),
            0.0,
        )
        rnd_en_absorb = _uniform(key, 21, n, st.pos.dtype) * particle_en
        t_absorb = ts + rnd_en_absorb / endot
        t_new = jnp.minimum(t_absorb, ctx.t2)
        absorbed = mask & (t_absorb <= ctx.t2)
        newtype = jnp.where(absorbed, deposit_type, st.ptype)
        new_nucmf = jnp.where(
            mask & ~absorbed, (particle_en - endot * (t_new - ts)) / H, st.nu_cmf
        )
        newpos = jnp.where(mask[:, None], st.pos * (t_new / ts)[:, None], st.pos)
        newtime = jnp.where(mask, t_new, st.prop_time)
        deposited_now = absorbed
    elif scheme == ThermalisationScheme.BARNES:
        # Barnes et al. 2016 analytic particle thermalisation
        # (update_packets.cc:42-57)
        tau_ineff = jnp.where(is_alpha, ctx.barnes_tau_ineff_alpha,
                              ctx.barnes_tau_ineff_lepton)
        x = 2.0 * ts * ts / jnp.maximum(tau_ineff * tau_ineff, 1e-300)
        f_p = jnp.log1p(x) / jnp.maximum(x, 1e-300)
        absorbed = mask & (_uniform(key, 22, n, st.pos.dtype) < f_p)
        en_deposited = jnp.where(absorbed, st.e_cmf, 0.0)
        newtype = jnp.where(absorbed, deposit_type,
                            jnp.where(mask, TYPE_ESCAPE, st.ptype))
        newpos, newtime, new_nucmf = st.pos, st.prop_time, st.nu_cmf
        deposited_now = absorbed
    elif scheme == ThermalisationScheme.WOLLAEGER:
        # Wollaeger+2018 local particle thermalisation
        # (update_packets.cc:59-75)
        rho = jnp.where(nonemptymgi >= 0, cells_rho[jnp.maximum(nonemptymgi, 0)], 1e-300)
        a_const = jnp.where(is_alpha, 1.2e-11, 1.3e-11)
        aux = 2.0 * a_const / jnp.maximum(ts * rho, 1e-300)
        f_p = jnp.log1p(aux) / jnp.maximum(aux, 1e-300)
        absorbed = mask & (_uniform(key, 22, n, st.pos.dtype) < f_p)
        en_deposited = jnp.where(absorbed, st.e_cmf, 0.0)
        newtype = jnp.where(absorbed, deposit_type,
                            jnp.where(mask, TYPE_ESCAPE, st.ptype))
        newpos, newtime, new_nucmf = st.pos, st.prop_time, st.nu_cmf
        deposited_now = absorbed
    else:
        raise NotImplementedError(f"thermalisation scheme {scheme}")

    # deposition estimators (update_packets.cc:115-142)
    frompart = st.originated_from_particlenotgamma
    est = est.replace(
        dep_electron=cell_add(est.dep_electron, nonemptymgi, en_deposited, mask & is_beta_minus & frompart),
        dep_positron=cell_add(est.dep_positron, nonemptymgi, en_deposited, mask & is_beta_plus & frompart),
        dep_alpha=cell_add(est.dep_alpha, nonemptymgi, en_deposited, mask & is_alpha & frompart),
        electron_dep_discrete=est.electron_dep_discrete
        + jnp.sum(jnp.where(deposited_now & is_beta_minus & frompart, st.e_cmf, 0.0)),
        positron_dep_discrete=est.positron_dep_discrete
        + jnp.sum(jnp.where(deposited_now & is_beta_plus & frompart, st.e_cmf, 0.0)),
        alpha_dep_discrete=est.alpha_dep_discrete
        + jnp.sum(jnp.where(deposited_now & is_alpha & frompart, st.e_cmf, 0.0)),
    )
    return st.replace(ptype=newtype, pos=newpos, prop_time=newtime, nu_cmf=new_nucmf), est


# ---------------------------------------------------------------------------
# k-packets (grey / blackbody path) (reference: kpkt.cc:377-402)
# ---------------------------------------------------------------------------


def kpkt_blackbody_step(key, st: PacketState, ctx: StepContext, grid: GridData,
                        cells_te, cells_thick, opts: Options):
    """Emit k-packets as blackbody r-packets (thick cells and pre-kpkts)
    (reference: kpkt.cc:377-402, update_packets.cc:253-268)."""
    nonemptymgi = jnp.take(grid.nonemptymgi_of_cell, st.where)
    safe_mgi = jnp.maximum(nonemptymgi, 0)
    te = cells_te[safe_mgi]
    thick = nonemptymgi >= 0
    thick = thick & (cells_thick[safe_mgi] == 1)
    mask = (st.ptype == TYPE_PRE_KPKT) | ((st.ptype == TYPE_KPKT) & thick)
    mask = mask & (st.prop_time < ctx.t2) & (nonemptymgi >= 0)
    nu_planck = sample_planck_montecarlo(
        jax.random.fold_in(key, 31), jnp.maximum(te, 1.0), opts.nu_min_r, opts.nu_max_r
    )
    st = st.replace(nu_cmf=jnp.where(mask, nu_planck, st.nu_cmf))
    st = emit_rpkt_batch(key, 32, st, mask, opts)
    return st.replace(
        next_trans=jnp.where(mask, -1, st.next_trans),
        emissiontype=jnp.where(mask, EMTYPE_FREEFREE, st.emissiontype),
        em_pos=jnp.where(mask[:, None], st.pos, st.em_pos),
        em_time=jnp.where(mask, st.prop_time, st.em_time),
        nscatterings=jnp.where(mask, 0, st.nscatterings),
        trueemissiontype=jnp.where(mask, EMTYPE_FREEFREE, st.trueemissiontype),
        trueem_time=jnp.where(mask, st.prop_time, st.trueem_time),
        trueemissionvelocity=jnp.where(
            mask, geometry.vec_len(st.pos) / st.prop_time, st.trueemissionvelocity
        ),
    ), mask


# ---------------------------------------------------------------------------
# gamma transport (reference: gammapkt.cc:719-817)
# ---------------------------------------------------------------------------


def _sigma_compton_partial(x, f):
    """(reference: gammapkt.cc:258-268)"""
    term1 = (x * x - 2 * x - 2) * jnp.log(f) / x / x
    term2 = ((f * f - 1) / (f * f)) / 2
    term3 = ((f - 1) / x) * ((1 / x) + (2 / f) + (1 / (x * f)))
    return 3 * SIGMA_T * (term1 + term2 + term3) / (8 * x)


def _choose_f(xx, zrand):
    """Bisect sigma_compton_partial(x, f) = zrand*sigma(x, fmax)
    (reference: gammapkt.cc:296-327)."""
    f_max = 1.0 + 2.0 * xx
    f_min = jnp.ones_like(xx)
    norm = zrand * _sigma_compton_partial(xx, f_max)

    def body(_, carry):
        fmin, fmax = carry
        ftry = 0.5 * (fmin + fmax)
        stry = _sigma_compton_partial(xx, ftry)
        high = stry > norm
        return jnp.where(high, fmin, ftry), jnp.where(high, ftry, fmax)

    f_min, f_max = jax.lax.fori_loop(0, 60, body, (f_min, f_max))
    return 0.5 * (f_min + f_max)


def _thomson_angle(u):
    """(reference: gammapkt.cc:330-340)"""
    b = 8.0 * u - 4.0
    t = jnp.cbrt((jnp.sqrt(b * b + 4.0) - b) / 2.0)
    return 1.0 / t - t


def _scatter_dir(key, tag, dir_in, cos_theta):
    """Rotate dir_in by scattering angle (reference: gammapkt.cc:343-378)."""
    n = dir_in.shape[0]
    phi = _uniform(key, tag, n, dir_in.dtype) * 2.0 * PI
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta**2, 0.0))
    xprime = sin_theta * jnp.cos(phi)
    yprime = sin_theta * jnp.sin(phi)
    zprime = cos_theta

    xylen = jnp.sqrt(dir_in[:, 0] ** 2 + dir_in[:, 1] ** 2)
    safe = jnp.maximum(xylen, 1e-300)
    norm1 = 1.0 / safe
    norm2 = 1.0 / geometry.vec_len(dir_in)
    r11 = dir_in[:, 1] * norm1
    r12 = -dir_in[:, 0] * norm1
    r21 = dir_in[:, 0] * dir_in[:, 2] * norm1 * norm2
    r22 = dir_in[:, 1] * dir_in[:, 2] * norm1 * norm2
    r23 = -norm2 / norm1
    r31 = dir_in[:, 0] * norm2
    r32 = dir_in[:, 1] * norm2
    r33 = dir_in[:, 2] * norm2
    out = jnp.stack(
        [
            r11 * xprime + r21 * yprime + r31 * zprime,
            r12 * xprime + r22 * yprime + r32 * zprime,
            r23 * yprime + r33 * zprime,
        ],
        axis=-1,
    )
    # polar-axis fallback (dir along z): scattering frame is degenerate
    polar = xylen < 1e-12
    sgn = jnp.where(dir_in[:, 2] >= 0, 1.0, -1.0)
    fallback = jnp.stack([xprime, yprime, sgn * zprime], axis=-1)
    return jnp.where(polar[:, None], fallback, out)


def _meanf_sigma(x):
    """(reference: gammapkt.cc:625-637)"""
    f = 1 + 2 * x
    term0 = 2 / x
    term1 = (1 - 2 / x - 3 / (x * x)) * jnp.log(f)
    term2 = (4 / x + 3 / (x * x) - 1) * 2 * x / f
    term3 = (1 - 2 / x - 1 / (x * x)) * 2 * x * (1 + x) / f / f
    term4 = -2.0 * x * (4 * x * x + 6 * x + 3) / 3 / f / f / f
    return 3 * SIGMA_T * (term0 + term1 + term2 + term3 + term4) / (8 * x)


def gamma_analytic_step(key, st: PacketState, est: Estimators, ctx: StepContext,
                        grid: GridData, opts: Options):
    """Analytic thermalisation: absorb-or-escape per gamma packet
    (reference: gammapkt.cc:819-971 barnes/wollaeger/guttman)."""
    from . import thermalisation as th

    mask = (st.ptype == TYPE_GAMMA) & (st.prop_time < ctx.t2)
    scheme = opts.gamma_thermalisation_scheme
    if scheme == ThermalisationScheme.BARNES:
        f = th.barnes_f_gamma(jnp.maximum(st.prop_time, 1.0), ctx.barnes_t_ineff)
    elif scheme == ThermalisationScheme.WOLLAEGER:
        f = th.wollaeger_f_gamma(grid, st.pos, st.prop_time, st.where, ctx.rho_t_mgi)
    else:  # GUTTMAN
        f = th.guttman_f_gamma(
            jax.random.fold_in(key, 61), grid, st.pos, st.prop_time, st.where,
            ctx.rho_tmin_mgi, ctx.tmin,
        )
    absorbed = mask & (_uniform(key, 62, st.npkts, st.pos.dtype) < f)
    escaping = mask & ~absorbed
    nonemptymgi = jnp.take(grid.nonemptymgi_of_cell, st.where)
    est = est.replace(
        dep_gamma=cell_add(est.dep_gamma, nonemptymgi, st.e_cmf, absorbed & (nonemptymgi >= 0)),
        nesc=est.nesc + jnp.sum(escaping).astype(est.nesc.dtype),
    )
    st = st.replace(
        ptype=jnp.where(absorbed, TYPE_KPKT,
                        jnp.where(escaping, TYPE_ESCAPE, st.ptype)),
        absorptiontype=jnp.where(absorbed, -4, st.absorptiontype),
        escape_type=jnp.where(escaping, TYPE_GAMMA, st.escape_type),
        escape_time=jnp.where(escaping, st.prop_time, st.escape_time),
    )
    return st, est


def gamma_step(
    key, st: PacketState, est: Estimators, ctx: StepContext, grid: GridData,
    cells_rho, cells_nnetot, cells_ffegrp, gamma_kappagrey: float, opts: Options,
):
    """One flight step of all gamma packets (reference: gammapkt.cc:719-817)."""
    if opts.gamma_thermalisation_scheme in (
        ThermalisationScheme.BARNES, ThermalisationScheme.WOLLAEGER,
        ThermalisationScheme.GUTTMAN,
    ):
        return gamma_analytic_step(key, st, est, ctx, grid, opts)
    n = st.npkts
    mask = (st.ptype == TYPE_GAMMA) & (st.prop_time < ctx.t2)
    nonemptymgi = jnp.take(grid.nonemptymgi_of_cell, st.where)
    nonempty = nonemptymgi >= 0
    safe_mgi = jnp.maximum(nonemptymgi, 0)
    rho = jnp.where(nonempty, cells_rho[safe_mgi], 0.0)
    nnetot = jnp.where(nonempty, cells_nnetot[safe_mgi], 0.0)
    ffegrp = jnp.where(nonempty, cells_ffegrp[safe_mgi], 0.0)

    doppler = geometry.doppler_nucmf_on_nurf(
        st.pos, st.dir, st.prop_time, opts.use_relativistic_doppler_shift
    )
    xx = H * st.nu_cmf / ME_C2
    detailed = gamma_kappagrey < 0

    if detailed:
        sigma_c = jnp.where(
            xx < THOMSON_LIMIT, SIGMA_T, _sigma_compton_partial(jnp.maximum(xx, 1e-10), 1 + 2 * xx)
        )
        chi_compton = sigma_c * nnetot * doppler
        # photoelectric: Si/Fe fits (gammapkt.cc:474-498)
        hnu_over_100kev = st.nu_cmf / 2.41326e19
        if opts.use_xcom_gammaphotoion:
            # XCOM tabulated photoionisation, log-log interpolated per element
            # (reference: gammapkt.cc:499-545; the interpolation here uses
            # log sigma endpoints — the snapshot's log10_E_smaller anchor
            # appears to be a typo)
            hnu_mev = st.nu_cmf / 2.41326e20
            loge = jnp.log10(jnp.maximum(hnu_mev, 1e-30))[:, None]  # (n,1)
            nelem_x = ctx.xcom_energy.shape[0]
            loge_tab = jnp.log10(ctx.xcom_energy)  # (nelem, L)
            logsig_tab = jnp.log10(ctx.xcom_sigma)
            nd = ctx.elem_numberdens[safe_mgi]  # (n, nelem)
            chi_pe_cmf = jnp.zeros_like(st.nu_cmf)
            for el in range(nelem_x):
                idx = jnp.searchsorted(ctx.xcom_energy[el], hnu_mev).astype(jnp.int32)
                llen = ctx.xcom_energy.shape[1]
                hi = jnp.clip(idx, 1, llen - 1)
                lo = hi - 1
                x0 = loge_tab[el, lo]
                x1 = loge_tab[el, hi]
                y0 = logsig_tab[el, lo]
                y1 = logsig_tab[el, hi]
                logsig = y0 + (y1 - y0) / jnp.maximum(x1 - x0, 1e-30) * (loge[:, 0] - x0)
                # clamp outside the table to the end values (gammapkt.cc:522-529)
                logsig = jnp.where(idx <= 0, logsig_tab[el, 0], logsig)
                logsig = jnp.where(idx >= llen, logsig_tab[el, llen - 1], logsig)
                sigma = 10.0 ** logsig * 1e-24
                chi_pe_cmf = chi_pe_cmf + sigma * nd[:, el]
        else:
            sigma_si = 1.16e-24 * hnu_over_100kev**-3.13
            sigma_fe = 25.7e-24 * hnu_over_100kev**-3.0
            chi_pe_cmf = sigma_fe * (rho / (56 * 1.67352e-24)) * ffegrp + sigma_si * (
                rho / (28 * 1.67352e-24)
            ) * (1.0 - ffegrp)
        chi_pe = chi_pe_cmf * doppler
        # pair production (gammapkt.cc:557-622)
        hnu_over_mev = st.nu_cmf / 2.41326e20
        above_thresh = st.nu_cmf > 2.46636e20
        high = st.nu_cmf > 3.6199e20
        sigma_pair_si = jnp.where(
            high, (0.0481 + 0.301 * (hnu_over_mev - 1.5)) * 196e-27,
            1.0063 * (hnu_over_mev - 1.022) * 196e-27,
        )
        sigma_pair_fe = jnp.where(
            high, (0.0481 + 0.301 * (hnu_over_mev - 1.5)) * 784e-27,
            1.0063 * (hnu_over_mev - 1.022) * 784e-27,
        )
        chi_pp_cmf = sigma_pair_fe * (rho / (56 * 1.67352e-24)) * ffegrp + sigma_pair_si * (
            rho / (28 * 1.67352e-24)
        ) * (1.0 - ffegrp)
        chi_pp = jnp.where(above_thresh, jnp.maximum(chi_pp_cmf * doppler, 0.0), 0.0)
    else:
        chi_compton = jnp.zeros_like(rho)
        chi_pe = gamma_kappagrey * rho * doppler
        chi_pp = jnp.zeros_like(rho)

    chi_tot = chi_compton + chi_pe + chi_pp

    tau_next = -jnp.log(jnp.maximum(_uniform(key, 41, n, st.pos.dtype), 1e-300))
    sdist, snext = boundary_distance(grid, st.dir, st.pos, st.prop_time, st.where)
    tdist = jnp.maximum((ctx.t2 - st.prop_time) * CLIGHT_PROP, 0.0)
    edist = jnp.where(chi_tot > 0, tau_next / jnp.maximum(chi_tot, 1e-300), jnp.inf)

    dist = jnp.minimum(jnp.minimum(sdist, tdist), edist)
    take_boundary = mask & (sdist <= tdist) & (sdist <= edist)
    take_tlimit = mask & (tdist < sdist) & (tdist < edist)
    take_event = mask & (edist < sdist) & (edist < tdist)

    # move in two halves; path-based gamma deposition at midpoint
    # (gammapkt.cc:640-667, 761-791)
    pos1, t1, nucmf1, ecmf1, _ = geometry.move_pkt(
        st.pos, st.dir, st.prop_time, st.nu_rf, st.nu_cmf, st.e_rf, dist / 2.0,
        opts.use_relativistic_doppler_shift,
    )
    dop_sq = geometry.doppler_squared_nucmf_on_nurf(
        pos1, st.dir, t1, opts.use_relativistic_doppler_shift
    )
    xx_mid = jnp.maximum(H * nucmf1 / ME_C2, 1e-10)
    if detailed:
        heating = (
            _meanf_sigma(xx_mid) * nnetot
            + chi_pe / doppler
            + (chi_pp / doppler) * jnp.maximum(1.0 - 2.46636e20 / nucmf1, 0.0)
        )
    else:
        heating = chi_pe / doppler
    heating_cont = heating * st.e_rf * dist * dop_sq
    est = est.replace(
        dep_gamma=cell_add(est.dep_gamma, nonemptymgi, heating_cont, mask & nonempty & (chi_tot > 0))
    )
    pos2, t2_, nucmf2, ecmf2, _ = geometry.move_pkt(
        pos1, st.dir, t1, st.nu_rf, nucmf1, st.e_rf, dist / 2.0,
        opts.use_relativistic_doppler_shift,
    )
    newpos = jnp.where(mask[:, None], pos2, st.pos)
    newtime = jnp.where(take_tlimit, ctx.t2, jnp.where(mask, t2_, st.prop_time))
    new_nucmf = jnp.where(mask, nucmf2, st.nu_cmf)
    new_ecmf = jnp.where(mask, ecmf2, st.e_cmf)

    st = st.replace(pos=newpos, prop_time=newtime, nu_cmf=new_nucmf, e_cmf=new_ecmf)

    # boundary crossing / escape (grid.h:113-129)
    escaping = take_boundary & (snext == BOUNDARY_ESCAPE)
    crossing = take_boundary & (snext >= 0)
    st = st.replace(
        where=jnp.where(crossing, snext, st.where),
        escape_type=jnp.where(escaping, st.ptype, st.escape_type),
        escape_time=jnp.where(escaping, st.prop_time, st.escape_time),
        ptype=jnp.where(escaping, TYPE_ESCAPE, st.ptype),
    )
    est = est.replace(nesc=est.nesc + jnp.sum(escaping).astype(est.nesc.dtype))

    # physical event (gammapkt.cc:793-813)
    chi_rnd = _uniform(key, 42, n, st.pos.dtype) * chi_tot
    ev_compton = take_event & (chi_compton > chi_rnd)
    ev_pe = take_event & ~ev_compton & ((chi_compton + chi_pe) > chi_rnd)
    ev_pp = take_event & ~ev_compton & ~ev_pe

    # --- Compton scattering (gammapkt.cc:380-458) ---
    xx_e = jnp.maximum(H * st.nu_cmf / ME_C2, 1e-10)
    f = jnp.where(
        xx_e < THOMSON_LIMIT, 1.0, _choose_f(xx_e, _uniform(key, 43, n, st.pos.dtype))
    )
    prob_gamma = 1.0 / f
    stay_gamma = (xx_e < THOMSON_LIMIT) | (_uniform(key, 44, n, st.pos.dtype) < prob_gamma)
    scatters = ev_compton & stay_gamma
    absorbs_compton = ev_compton & ~stay_gamma

    vel = geometry.get_velocity(st.pos, st.prop_time)
    cmf_dir = geometry.angle_ab(st.dir, vel)
    cos_theta = jnp.where(
        xx_e < THOMSON_LIMIT, _thomson_angle(_uniform(key, 45, n, st.pos.dtype)), 1.0 - (f - 1.0) / xx_e
    )
    new_cmf_dir = _scatter_dir(key, 46, cmf_dir, cos_theta)
    new_rf_dir = geometry.angle_ab(new_cmf_dir, -vel)
    nu_cmf_scat = st.nu_cmf / f
    dop_new = geometry.doppler_nucmf_on_nurf(
        st.pos, new_rf_dir, st.prop_time, opts.use_relativistic_doppler_shift
    )
    st = st.replace(
        nu_cmf=jnp.where(scatters, nu_cmf_scat, st.nu_cmf),
        dir=jnp.where(scatters[:, None], new_rf_dir, st.dir),
        nu_rf=jnp.where(scatters, nu_cmf_scat / dop_new, st.nu_rf),
        e_rf=jnp.where(scatters, st.e_cmf / dop_new, st.e_rf),
        ptype=jnp.where(absorbs_compton, TYPE_NTLEPTON_DEPOSITED, st.ptype),
        absorptiontype=jnp.where(absorbs_compton, -3, st.absorptiontype),
    )

    # --- photoelectric (gammapkt.cc:798-809) ---
    st = st.replace(
        ptype=jnp.where(ev_pe, TYPE_NTLEPTON_DEPOSITED, st.ptype),
        absorptiontype=jnp.where(ev_pe, -4, st.absorptiontype),
    )

    # --- pair production (gammapkt.cc:676-716) ---
    prob_g = jnp.clip(1.022 * MEV / (H * jnp.maximum(st.nu_cmf, 1e-30)), 0.0, 1.0)
    to_lepton = ev_pp & (_uniform(key, 47, n, st.pos.dtype) > prob_g)
    to_511 = ev_pp & ~to_lepton
    dir_cmf_pp = _isotropic(key, 48, n, st.pos.dtype)
    vel_rev = st.pos / (-st.prop_time)[:, None]
    dir_rf_pp = geometry.angle_ab(dir_cmf_pp, vel_rev)
    nu_511 = 0.511 * MEV / H
    dop_pp = geometry.doppler_nucmf_on_nurf(
        st.pos, dir_rf_pp, st.prop_time, opts.use_relativistic_doppler_shift
    )
    st = st.replace(
        ptype=jnp.where(to_lepton, TYPE_NTLEPTON_DEPOSITED, st.ptype),
        absorptiontype=jnp.where(to_lepton, -5, st.absorptiontype),
        nu_cmf=jnp.where(to_511, nu_511, st.nu_cmf),
        dir=jnp.where(to_511[:, None], dir_rf_pp, st.dir),
        nu_rf=jnp.where(to_511, nu_511 / dop_pp, st.nu_rf),
        e_rf=jnp.where(to_511, st.e_cmf / dop_pp, st.e_rf),
    )

    # discrete gamma deposition counter for converted packets
    # (gammapkt.cc:1039-1051)
    converted = mask & (st.ptype != TYPE_GAMMA) & (st.ptype != TYPE_ESCAPE)
    est = est.replace(
        gamma_dep_discrete=est.gamma_dep_discrete + jnp.sum(jnp.where(converted, st.e_cmf, 0.0))
    )
    return st, est


# ---------------------------------------------------------------------------
# r-packet transport (reference: rpkt.cc:604-737 do_rpkt_step)
# ---------------------------------------------------------------------------


def _vpkt_spawn(key, st, est, ctx, grid, dad, cells, opts, mask, is_scatter,
                nu_cmf, opacity_case: int):
    """Launch virtual packets from interacting real packets
    (reference: vpkt.cc:899-962 vpkt_call_estimators); gated to skip when the
    iteration has no interactions."""
    cfg = ctx.vpkt_cfg

    def run(vspec, vgrid):
        return vpkt_mod.trace_vpkts(
            cfg, vspec, dad, grid, cells, ctx, ctx.vpkt_cum_tau,
            ctx.vpkt_cum_taunu, st.pos, st.dir, st.prop_time, st.where,
            nu_cmf, st.e_cmf, st.stokes[:, 1:3],
            jnp.broadcast_to(jnp.asarray(is_scatter), mask.shape), mask,
            opacity_case,
            vgrid_acc=vgrid if cfg.vgrid_on else None,
        )

    def run2(vspec, vgrid):
        vs, vg = run(vspec, vgrid)
        return vs, (vg if vg is not None else vgrid)

    vspec, vgrid = jax.lax.cond(
        jnp.any(mask), run2, lambda v, g: (v, g), est.vspec, est.vgrid
    )
    return est.replace(vspec=vspec, vgrid=vgrid)


def rpkt_step(
    key, st: PacketState, est: Estimators, ctx: StepContext, grid: GridData,
    dad: DeviceAtomicData, cells, opts: Options, opacity_case: int,
):
    """One full r-packet advance: an inner while_loop of cheap
    propagation-only steps (boundary crossings dominate, reference
    rpkt.cc:604-737 loops the same way) followed by ONE event-application
    pass for the lanes whose optical-depth target was reached.

    Cell crossings outnumber physical events ~10:1, so deferring the event
    machinery (Stokes scattering, macro-atom dispatch, vpkt spawning) out of
    the crossing loop removes it from ~90% of the iterations."""
    n = st.npkts

    evctx0 = dict(
        take_event=jnp.zeros(n, bool),
        thick=jnp.zeros(n, bool),
        is_bb=jnp.zeros(n, bool),
        chi_escat=jnp.zeros(n, st.pos.dtype),
        chi_ff=jnp.zeros(n, st.pos.dtype),
        chi_bf=jnp.zeros(n, st.pos.dtype),
        chi_cont_cmf=jnp.zeros(n, st.pos.dtype),
        bf_contindex=jnp.zeros(n, jnp.int32),
        act_line=jnp.zeros(n, jnp.int32) - 99,
        nonemptymgi=jnp.zeros(n, jnp.int32),
    )
    max_cross = max(opts.rpkt_crossings_per_dispatch, 1)

    nadv0 = jnp.zeros((), jnp.int32)

    def cond(c):
        st, est, ev, it, nadv = c
        moving = (st.ptype == TYPE_RPKT) & (st.prop_time < ctx.t2) & ~ev["take_event"]
        return jnp.logical_and(it < max_cross, jnp.any(moving))

    def body(c):
        st, est, ev, it, nadv = c
        moving = (st.ptype == TYPE_RPKT) & (st.prop_time < ctx.t2) & ~ev["take_event"]
        nadv = nadv + jnp.sum(moving.astype(jnp.int32), dtype=jnp.int32)
        st, est, ev = _rpkt_propagate_once(
            jax.random.fold_in(key, 7300 + it), st, est, ev, ctx, grid, dad,
            cells, opts, opacity_case,
        )
        return st, est, ev, it + 1, nadv

    st, est, ev, _, nadv = jax.lax.while_loop(
        cond, body, (st, est, evctx0, jnp.int32(0), nadv0)
    )

    def _apply(st, est):
        return _rpkt_apply_events(
            key, st, est, ctx, grid, dad, cells, opts, opacity_case,
            ev["take_event"], ev["thick"], ev["is_bb"], ev["chi_escat"],
            ev["chi_ff"], ev["chi_bf"], ev["chi_cont_cmf"],
            ev["bf_contindex"], ev["act_line"], ev["nonemptymgi"],
        )

    def _none(st, est):
        return (st, est, jnp.zeros(n, bool), jnp.zeros(n, jnp.int32),
                jnp.zeros(n, jnp.int32) - 99)

    if "eventpass" in opts.phase_ablate:  # profiling only
        out = _none(st, est)
    else:
        out = jax.lax.cond(jnp.any(ev["take_event"]), _apply, _none, st, est)
    return out + (nadv,)


# test hook: (tau_minuslogu, sel_u) arrays injected into the Pallas kernel
_PALLAS_TEST_INJECT = None

_ABLATE_WARNED = False


def _ablate_sections() -> tuple:
    """ARTIS_PALLAS_ABLATE kernel-section ablations (profiling only).

    A leftover exported env var would silently disable physics sections
    (RNG, bound-free, line walk, estimators), so a non-empty tuple logs a
    loud warning once per process."""
    global _ABLATE_WARNED
    sections = tuple(
        t for t in os.environ.get("ARTIS_PALLAS_ABLATE", "").split(",") if t)
    if sections and not _ABLATE_WARNED:
        _ABLATE_WARNED = True
        import sys
        print(
            "WARNING: ARTIS_PALLAS_ABLATE is set "
            f"({','.join(sections)}) — kernel physics sections are DISABLED; "
            "results are for profiling only",
            file=sys.stderr, flush=True,
        )
    return sections

from .expansionopacity import NBINS as _EXPO_NBINS


def _expo_kappa_padded(ctx, ncells: int, f32, opts):
    """(ncells, NBINS padded to 128) binned expansion opacities for the
    kernel; a (ncells, 128) zero placeholder when the mode is off."""
    if not opts.expansionopacities_on:
        return jnp.zeros((ncells, 128), f32)
    nb = ctx.expopac_kappa.shape[1]
    nbpad = -(-nb // 128) * 128
    k = ctx.expopac_kappa.astype(f32)
    if nbpad > nb:
        k = jnp.pad(k, ((0, 0), (0, nbpad - nb)))
    return k


def rpkt_step_pallas(
    key, st: PacketState, est: Estimators, ctx: StepContext, grid: GridData,
    dad: DeviceAtomicData, cells, opts: Options, opacity_case: int,
):
    """rpkt_step via the fused Pallas multi-crossing kernel
    (transport/pallas_rpkt.py); same contract as rpkt_step."""
    from . import pallas_rpkt as pk

    n = st.npkts
    # narrow tail buffers use proportionally narrow kernel blocks (kernel
    # wall time scales with block width; f32 min tile is (8, 128)); big cell
    # tables force narrow blocks so (block, ncells) one-hots fit VMEM
    _ncells_blk = cells.Te.shape[0]
    from ..grid import GridType as _GT0
    if grid.grid_type == _GT0.CARTESIAN3D:
        _nprop_blk = int(grid.npts_model) + 1
    elif grid.grid_type == _GT0.CYLINDRICAL2D:
        _nprop_blk = int(grid.ncoordgrid[0]) * int(grid.ncoordgrid[1])
    else:
        _nprop_blk = int(grid.ncoordgrid[0])
    # tile-sorted dispatch for O(100^3) 3D models: lanes sorted by cell-tile,
    # tile-homogeneous blocks, per-tile table slices + revisited accumulators
    # (the TPU answer to the reference's per-cell 3D recursion,
    # grid.cc:1048-1096; design PERF.md)
    tiled = pk.use_tiled(opts, dad, grid, _ncells_blk)
    if tiled:
        tile = pk.pick_tile(opts)
        mpad = pk.tiled_mpad(opts)
        block = pk.pick_block(opts, mpad, tile)
    else:
        tile = mpad = 0
        block = pk.pick_block(opts, _ncells_blk, _nprop_blk)
    npad = -(-n // block) * block
    f32 = jnp.float32

    def padf(x, fill=0.0):
        x = x.astype(f32)
        return jnp.concatenate([x, jnp.full((npad - n,), fill, f32)]) if npad > n else x

    def padi(x, fill=0):
        x = x.astype(jnp.int32)
        return (jnp.concatenate([x, jnp.full((npad - n,), fill, jnp.int32)])
                if npad > n else x)

    moving0 = (st.ptype == TYPE_RPKT) & (st.prop_time < ctx.t2)
    lane_f32 = dict(
        posx=padf(st.pos[:, 0]), posy=padf(st.pos[:, 1]), posz=padf(st.pos[:, 2]),
        dirx=padf(st.dir[:, 0]), diry=padf(st.dir[:, 1]), dirz=padf(st.dir[:, 2]),
        nu_rf=padf(st.nu_rf, 1.0), nu_cmf=padf(st.nu_cmf, 1.0),
        e_rf=padf(st.e_rf), e_cmf=padf(st.e_cmf),
        prop_time=padf(st.prop_time, 1.0),
    )
    lane_i32 = dict(
        where=padi(st.where), next_trans=padi(st.next_trans),
        moving=padi(moving0.astype(jnp.int32)),
    )

    # static table geometry
    ncells = cells.Te.shape[0]
    # dipole electron scattering and vpkt spawning need the full XLA event
    # machinery: defer every event instead of redirecting in-kernel
    inkernel_scatter = not (opts.dipole or opts.vpkt_on)
    from ..grid import GridType as _GT
    cart3d = grid.grid_type == _GT.CARTESIAN3D
    cyl2d = grid.grid_type == _GT.CYLINDRICAL2D
    if cart3d:
        # the 3D kernel derives cell geometry from the index; the prop-table
        # slots carry the 1D-model shell tables for the radial mgi mapping
        nprop = int(grid.npts_model) + 1
    elif cyl2d:
        # cylindrical geometry derives from the cell index; the prop table
        # carries the per-prop-cell mgi map (prop cell == model cell)
        nprop = int(grid.ncoordgrid[0]) * int(grid.ncoordgrid[1])
    else:
        nprop = int(grid.ncoordgrid[0])
    nlines = dad.nlines
    ncont = max(dad.nbfcontinua, 1)
    ngc = max(dad.nbfcontinua_ground, 1)
    nphixs = dad.nphixspoints
    # (block, chunk) walk temporaries live in VMEM; the chunk formula is
    # shared with vmem_estimate_bytes so the eligibility gate sizes VMEM for
    # the chunk the kernel actually uses
    line_chunk = pk.pick_line_chunk(opts, nlines)
    lpad = -(-max(nlines, 1) // line_chunk) * line_chunk

    def padL(x, fill=0.0):
        x = x.astype(f32)
        if x.shape[-1] < lpad:
            padw = [(0, 0)] * (x.ndim - 1) + [(0, lpad - x.shape[-1])]
            return jnp.pad(x, padw, constant_values=fill)
        return x

    cont_phixs = dad.allphixs[jnp.clip(dad.cont_phixsrow, 0, dad.allphixs.shape[0] - 1)]
    gidx = dad.cont_groundindex
    cont_gmap = (
        (gidx[:, None] == jnp.arange(ngc)[None, :]) & (gidx[:, None] >= 0)
    ).astype(f32)
    if cart3d:
        # cellmin0 slot: vout_model padded +inf; cellmax0 slot:
        # nonemptymgi_of_mgi (same assignment order as grid_init)
        npts = int(grid.npts_model)
        isne = (grid.numpropcells_mgi[:npts] > 0) & (grid.rho_tmin_mgi[:npts] > 0)
        ne_idx = jnp.cumsum(isne.astype(jnp.int32)) - 1
        ne_of_mgi = jnp.where(isne, ne_idx, -1).astype(f32)
        t_mgi = jnp.zeros((nprop,), f32)
        t_cmin = jnp.concatenate(
            [grid.vout_model[:npts].astype(f32), jnp.full((nprop - npts,), jnp.inf, f32)]
        )
        t_cmax = jnp.concatenate(
            [ne_of_mgi, jnp.full((nprop - npts,), -1.0, f32)]
        )
        if tiled:
            # per-tile 8-aligned offset into the nonemptymgi row space:
            # slab DMAs and tile-local one-hots address rows relative to it
            ntiles = -(-nprop // tile)
            nef = jnp.concatenate(
                [ne_of_mgi, jnp.full((ntiles * tile - npts,), -1.0, f32)]
            ).reshape(ntiles, tile)
            ne_min = jnp.min(jnp.where(nef >= 0, nef, jnp.float32(3e38)),
                             axis=1)
            ne_min = jnp.where(ne_min > jnp.float32(1e38), 0.0, ne_min)
            tile_ne0 = (ne_min.astype(jnp.int32) // 8) * 8
    else:
        t_mgi = grid.nonemptymgi_of_cell[:nprop].astype(f32)
        t_cmin = grid.cell_pos_min[:nprop, 0].astype(f32)
        t_cmax = grid.cell_pos_max[:nprop, 0].astype(f32)
    tables = dict(
        mgi_of_cell=t_mgi,
        cellmin0=t_cmin,
        cellmax0=t_cmax,
        nne=cells.nne.astype(f32), Te=cells.Te.astype(f32),
        kappagrey=cells.kappagrey.astype(f32), rho=cells.rho.astype(f32),
        thick=cells.thick.astype(f32),
        chiffpart=ctx.chi_ff_nnionpart.astype(f32),
        # expansion-opacity mode never walks the line list in-kernel: pass
        # dummy slabs so production-size tau tables don't occupy VMEM
        line_nu=(padL(dad.line_nu) if not opts.expansionopacities_on
                 else jnp.zeros((128,), f32)),
        tau_factor=(padL(ctx.tau_sob_factor)
                    if not opts.expansionopacities_on
                    else jnp.zeros((ncells, 128), f32)),
        # detailed-line estimator column per line (njblue = dropped); float
        # values are exact for any realistic selection size
        jb_map=(padL(jnp.where(ctx.jblue_of_line >= 0, ctx.jblue_of_line,
                               est.jblue_raw.shape[1]).astype(f32),
                     fill=float(est.jblue_raw.shape[1]))
                if (opts.detailed_line_estimators_on
                    and not opts.expansionopacities_on)
                else jnp.zeros((128,), f32)),
        cont_nu_edge=dad.cont_nu_edge.astype(f32) if dad.nbfcontinua
        else jnp.full((1,), jnp.inf, f32),
        bf_a=ctx.bf_a.astype(f32) if dad.nbfcontinua
        else jnp.zeros((ncells, 1), f32),
        bf_dep=ctx.bf_dep.astype(f32) if dad.nbfcontinua
        else jnp.zeros((ncells, 1), f32),
        cont_phixs=cont_phixs.astype(f32) if dad.nbfcontinua
        else jnp.zeros((1, nphixs), f32),
        cont_gmap=cont_gmap if dad.nbfcontinua else jnp.zeros((1, ngc), f32),
        gc_nu_edge=dad.groundcont_nu_edge.astype(f32)
        if dad.nbfcontinua_ground else jnp.zeros((1,), f32),
        cont_prob=dad.cont_probability.astype(f32) if dad.nbfcontinua
        else jnp.zeros((1,), f32),
        expo_kappa=_expo_kappa_padded(ctx, ncells, f32, opts),
    )

    seed = jax.random.randint(jax.random.fold_in(key, 7777), (), 0, 2**31 - 1,
                              dtype=jnp.int32)
    test_mode = _PALLAS_TEST_INJECT is not None
    if test_mode:
        tt, ts_ = _PALLAS_TEST_INJECT
        test_tau = padf(tt, 1.0)
        test_sel = padf(ts_, 0.5)
    else:
        test_tau = test_sel = jnp.zeros((npad,), f32)

    inv_perm = block_tile = block_ne0 = None
    if not tiled and opts.pallas_compact_moving and npad > block:
        # moving lanes first (stable, so determinism is preserved): trailing
        # blocks see no moving lane and early-exit their crossing loop, so
        # kernel wall time tracks the moving count, not the buffer width —
        # the in-kernel counterpart of the reference's sort-escaped-packets
        # pass (update_packets.cc:281-332)
        perm = jnp.argsort((lane_i32["moving"] == 0).astype(jnp.int32))
        lane_f32 = {k: v[perm] for k, v in lane_f32.items()}
        lane_i32 = {k: v[perm] for k, v in lane_i32.items()}
        test_tau = test_tau[perm]
        test_sel = test_sel[perm]
        inv_perm = jnp.argsort(perm)
    if tiled:
        # sort lanes by cell-tile (inactive lanes key past every real tile,
        # so the per-block tile sequence is monotone and tile runs are
        # consecutive — the revisited-accumulator contract of the kernel);
        # each block takes its FIRST lane's tile and stragglers at tile
        # boundaries pause one dispatch (re-sorted into their tile next time)
        keys = jnp.where(lane_i32["moving"] > 0,
                         lane_i32["where"] // tile, ntiles)
        perm = jnp.argsort(keys)
        keys_s = keys[perm]
        lane_f32 = {k: v[perm] for k, v in lane_f32.items()}
        lane_i32 = {k: v[perm] for k, v in lane_i32.items()}
        test_tau = test_tau[perm]
        test_sel = test_sel[perm]
        block_tile = jnp.minimum(keys_s[::block], ntiles - 1).astype(
            jnp.int32)
        lane_i32["moving"] = jnp.where(
            keys_s == jnp.repeat(block_tile, block), lane_i32["moving"], 0)
        # tile_ne0 is 8-aligned (built as //8*8 above), but Mosaic cannot
        # prove that through a scalar-prefetch read — ship ne0/8 and let the
        # kernel multiply, which makes the DMA row offset provably aligned
        block_ne0 = tile_ne0[block_tile] // 8
        inv_perm = jnp.argsort(perm)
    outs = pk.propagate_blocked(
        seed, lane_f32, lane_i32, tables, test_tau, test_sel,
        ctx.t2.astype(f32), jnp.asarray(ctx.tmin, f32),
        jnp.asarray(grid.max_path_step, f32),
        nlines=nlines, ncont=ncont, nprop=nprop, ncells=ncells, ngc=ngc,
        nphixs=nphixs, line_chunk=line_chunk,
        max_inner=max(opts.rpkt_crossings_per_dispatch, 1),
        relativistic=opts.use_relativistic_doppler_shift,
        phixs_dnu=float(dad.nphixsnuincrement),
        last_nuovernuedge=float(dad.last_phixs_nuovernuedge),
        want_gamma=opts.use_lut_photoion, want_bfheat=opts.use_lut_bfheating,
        test_mode=test_mode, block=block,
        expansion_mode=opts.expansionopacities_on,
        nbins_expo=_EXPO_NBINS if opts.expansionopacities_on else 0,
        cart3d=cart3d, cyl2d=cyl2d,
        nx=int(grid.ncoordgrid[0]), ny=int(grid.ncoordgrid[1]),
        nz=int(grid.ncoordgrid[2]), rmax=float(grid.rmax),
        stream_lines=(tiled
                      or ncells * lpad > opts.pallas_stream_threshold),
        stream_bf=((tiled and dad.nbfcontinua > 0)
                   or dad.nbfcontinua > opts.pallas_bf_stream_threshold),
        tiled=tiled, tile=tile,
        block_tile=block_tile, block_ne0=block_ne0,
        bf_chunk=pk.pick_bf_chunk(opts),
        inkernel_scatter=inkernel_scatter,
        multibin=opts.multibin_radfield,
        nradbins=opts.radfieldbincount if opts.multibin_radfield else 0,
        want_bfrate=(opts.detailed_bf_estimators_on and dad.nbfcontinua > 0),
        want_jblue=(opts.detailed_line_estimators_on
                    and not opts.expansionopacities_on),
        njblue=int(est.jblue_raw.shape[1]),
        model_dim=int(getattr(grid, "model_dim", 1) or 1),
        n_rcyl_m=(int(grid.model_ncoord[0])
                  if getattr(grid, "model_dim", 1) == 2 else 1),
        n_z_m=(int(grid.model_ncoord[1])
               if getattr(grid, "model_dim", 1) == 2 else 1),
        # profiling-only section ablation (e.g. "nobf,nowalk"); never set in
        # production — physics is wrong with any section off
        ablate=_ablate_sections(),
    )
    (opx, opy, opz, odx, ody, odz, onurf, onucmf, oerf, oecmf, otime,
     owhere, ontr, oevented, oescaped, othick, oisbb, oact, obfidx,
     ochiesc, ochiff, ochibf, ochicont, omgi,
     oemx, oemy, oemz, oemt, onsc, oinkscat,
     oest, ogamma, obfheat, orb, obfr, ojb, omisc) = outs

    if tiled:
        # lane outputs come back tile-sorted: undo the sort, then strip pad
        sl = lambda x: x.reshape(-1)[inv_perm][:n]
        # per-TILE accumulators scatter back into global nonemptymgi rows at
        # each tile's ne0 offset; tiles no block visited hold unwritten HBM
        # and are masked out (padded rows carry exact zeros and fold onto
        # the clip row harmlessly)
        visited = jnp.zeros((ntiles,), bool).at[block_tile].set(True)
        _rows = jnp.clip(
            tile_ne0[:, None] + jnp.arange(mpad, dtype=jnp.int32)[None, :],
            0, ncells - 1).reshape(-1)

        def fold(o):  # (ntiles, mpad, k) -> (ncells, k)
            a = jnp.where(visited[:, None, None], o, 0.0)
            return jnp.zeros((ncells, o.shape[2]), o.dtype).at[_rows].add(
                a.reshape(-1, o.shape[2]))
    else:
        if inv_perm is not None:  # undo the moving-compaction sort
            sl = lambda x: x.reshape(-1)[inv_perm][:n]
        else:
            sl = lambda x: x.reshape(-1)[:n]  # outputs are (nblocks, block)

        def fold(o):  # (nblocks, ncells, k) -> (ncells, k)
            return jnp.sum(o, axis=0)
    dtype = st.pos.dtype
    touched = sl(oevented) > 0
    escaped = sl(oescaped) > 0
    moved = moving0  # every initially-moving lane may have advanced

    pos_new = jnp.stack([sl(opx), sl(opy), sl(opz)], axis=-1).astype(dtype)
    dir_new = jnp.stack([sl(odx), sl(ody), sl(odz)], axis=-1).astype(dtype)
    scat = sl(oinkscat) > 0
    em_new = jnp.stack([sl(oemx), sl(oemy), sl(oemz)], axis=-1).astype(dtype)
    stokes_reset = jnp.concatenate(
        [jnp.ones((n, 1), st.stokes.dtype), jnp.zeros((n, 2), st.stokes.dtype)],
        axis=1,
    )
    st = st.replace(
        pos=jnp.where(moved[:, None], pos_new, st.pos),
        dir=jnp.where(moved[:, None], dir_new, st.dir),
        nu_rf=jnp.where(moved, sl(onurf).astype(dtype), st.nu_rf),
        e_rf=jnp.where(moved, sl(oerf).astype(dtype), st.e_rf),
        prop_time=jnp.where(moved, sl(otime).astype(dtype), st.prop_time),
        nu_cmf=jnp.where(moved, sl(onucmf).astype(dtype), st.nu_cmf),
        e_cmf=jnp.where(moved, sl(oecmf).astype(dtype), st.e_cmf),
        where=jnp.where(moved, sl(owhere), st.where),
        next_trans=jnp.where(moved, sl(ontr), st.next_trans),
        escape_type=jnp.where(escaped, st.ptype, st.escape_type),
        escape_time=jnp.where(escaped, sl(otime).astype(dtype), st.escape_time),
        ptype=jnp.where(escaped, TYPE_ESCAPE, st.ptype),
        # in-kernel isotropic scatters (escat + thick-grey redirects)
        em_pos=jnp.where(scat[:, None], em_new, st.em_pos),
        em_time=jnp.where(scat, sl(oemt).astype(dtype), st.em_time),
        nscatterings=st.nscatterings + sl(onsc),
        stokes=jnp.where(scat[:, None], stokes_reset, st.stokes),
    )

    est_sum = fold(oest)  # (ncells, 8)
    misc = jnp.sum(omisc, axis=0)[:, 0]  # (8,)
    cnt = est.counters.at[stats.CELLCROSSINGS].add(
        est_sum[:, 3].sum().astype(est.counters.dtype))
    cnt = cnt.at[stats.ESCOUNTER].add(misc[5].astype(cnt.dtype))
    cnt = cnt.at[stats.INTERACTIONS].add(
        (misc[5] + misc[6]).astype(cnt.dtype))
    est = est.replace(
        j=est.j + est_sum[:, 0].astype(est.j.dtype),
        nuj=est.nuj + est_sum[:, 1].astype(est.nuj.dtype),
        ffheating=est.ffheating + est_sum[:, 2].astype(est.ffheating.dtype),
        nesc=est.nesc + misc[1].astype(est.nesc.dtype),
        cmf_lum=est.cmf_lum + misc[2].astype(est.cmf_lum.dtype),
        counters=cnt,
    )
    if opts.use_lut_photoion:
        gsum = fold(ogamma)[:, : dad.nbfcontinua_ground]
        est = est.replace(
            gammaestimator=est.gammaestimator + gsum.astype(est.gammaestimator.dtype))
    if opts.use_lut_bfheating:
        bsum = fold(obfheat)[:, : dad.nbfcontinua_ground]
        est = est.replace(
            bfheatingestimator=est.bfheatingestimator
            + bsum.astype(est.bfheatingestimator.dtype))
    if opts.detailed_bf_estimators_on and dad.nbfcontinua > 0:
        bfrsum = fold(obfr)[:, : dad.nbfcontinua]
        est = est.replace(bfrate=est.bfrate + bfrsum.astype(est.bfrate.dtype))
    if opts.detailed_line_estimators_on and not opts.expansionopacities_on:
        jbsum = fold(ojb)
        njbp = ojb.shape[2] // 2
        njb = est.jblue_raw.shape[1]
        est = est.replace(
            jblue_raw=est.jblue_raw
            + jbsum[:, :njb].astype(est.jblue_raw.dtype),
            jblue_count=est.jblue_count
            + jbsum[:, njbp:njbp + njb].astype(est.jblue_count.dtype),
        )
    if opts.multibin_radfield:
        rbsum = fold(orb)  # (ncells, 3*nbpad)
        nbp = orb.shape[2] // 3
        nb = est.radfieldbin_j.shape[1]
        est = est.replace(
            radfieldbin_j=est.radfieldbin_j
            + rbsum[:, :nb].astype(est.radfieldbin_j.dtype),
            radfieldbin_nuj=est.radfieldbin_nuj
            + rbsum[:, nbp:nbp + nb].astype(est.radfieldbin_nuj.dtype),
            radfieldbin_count=est.radfieldbin_count
            + rbsum[:, 2 * nbp:2 * nbp + nb].astype(
                est.radfieldbin_count.dtype),
        )

    nadv = misc[0].astype(jnp.int32)

    def _apply(st, est):
        return _rpkt_apply_events(
            key, st, est, ctx, grid, dad, cells, opts, opacity_case,
            touched, sl(othick) > 0, sl(oisbb) > 0,
            sl(ochiesc).astype(dtype), sl(ochiff).astype(dtype),
            sl(ochibf).astype(dtype), sl(ochicont).astype(dtype),
            sl(obfidx), sl(oact), sl(omgi),
            no_escat=inkernel_scatter,
        )

    def _none(st, est):
        return (st, est, jnp.zeros(n, bool), jnp.zeros(n, jnp.int32),
                jnp.zeros(n, jnp.int32) - 99)

    if "eventpass" in opts.phase_ablate:  # profiling only
        out = _none(st, est)
    else:
        out = jax.lax.cond(jnp.any(touched), _apply, _none, st, est)
    return out + (nadv,)


def _rpkt_propagate_once(
    key, st: PacketState, est: Estimators, evctx, ctx: StepContext,
    grid: GridData, dad: DeviceAtomicData, cells, opts: Options,
    opacity_case: int,
):
    n = st.npkts
    dtype = st.pos.dtype
    mask = (
        (st.ptype == TYPE_RPKT) & (st.prop_time < ctx.t2)
        & ~evctx["take_event"]
    )
    nonemptymgi = jnp.take(grid.nonemptymgi_of_cell, st.where)
    nonempty = nonemptymgi >= 0
    safe_mgi = jnp.maximum(nonemptymgi, 0)
    thick = nonempty & (cells.thick[safe_mgi] == 1)

    tau_next = -jnp.log(jnp.maximum(_uniform(key, 51, n, dtype), 1e-300))
    sdist, snext = boundary_distance(grid, st.dir, st.pos, st.prop_time, st.where)
    tdist = jnp.maximum((ctx.t2 - st.prop_time) * CLIGHT_PROP, 0.0)
    abort_dist = jnp.minimum(sdist, tdist)

    doppler = geometry.doppler_nucmf_on_nurf(
        st.pos, st.dir, st.prop_time, opts.use_relativistic_doppler_shift
    )

    # frequency at the abort point, linearised (rpkt.cc:49-61)
    abort_pos = st.pos + st.dir * abort_dist[:, None]
    abort_time = st.prop_time + abort_dist / CLIGHT_PROP
    nu_cmf_abort = st.nu_rf * geometry.doppler_nucmf_on_nurf(
        abort_pos, st.dir, abort_time, opts.use_relativistic_doppler_shift
    )
    d_nu_on_d_l = (nu_cmf_abort - st.nu_cmf) / jnp.maximum(abort_dist, 1e-300)
    d_nu_on_d_l = jnp.where(d_nu_on_d_l < 0, d_nu_on_d_l, -1e-300)

    # continuum opacities in the cmf at the current frequency; the whole
    # line/bf machinery is gated off when every active r-packet is in a grey
    # (thick) cell, which is the entire bulk of early grey-approximation
    # timesteps (reference: rpkt.cc:647-654 takes the grey branch per packet)
    need_chi = mask & nonempty & ~thick

    want_gc = opts.use_lut_photoion or opts.use_lut_bfheating
    ngc = max(dad.nbfcontinua_ground, 1)

    def nongrey_machinery(st_nu_cmf, st_next_trans):
        (chi_escat, chi_ff, chi_bf, select_continuum, gamma_contr) = (
            opacity.calculate_chi_rpkt_cont(
                dad, jnp.where(need_chi, st_nu_cmf, 1e15), safe_mgi, need_chi,
                ctx.bf_a, ctx.bf_dep, ctx.chi_ff_nnionpart, cells.nne,
                cells.Te, opacity_case, want_gamma_contr=True,
            )
            if want_gc else
            opacity.calculate_chi_rpkt_cont(
                dad, jnp.where(need_chi, st_nu_cmf, 1e15), safe_mgi, need_chi,
                ctx.bf_a, ctx.bf_dep, ctx.chi_ff_nnionpart, cells.nne,
                cells.Te, opacity_case,
            ) + (jnp.zeros_like(st_nu_cmf)[:, None] + jnp.zeros((ngc,), st_nu_cmf.dtype),)
        )
        from ..devutil import assert_testmodeonly
        # reference: rpkt.cc:777 isfinite(chi_ff), 782-788 chi >= 0
        assert_testmodeonly(
            jnp.isfinite(chi_ff) & (chi_ff >= 0.0)
            & jnp.isfinite(chi_bf) & (chi_bf >= 0.0)
            & jnp.isfinite(chi_escat) & (chi_escat >= 0.0),
            "continuum opacities finite and non-negative", mask=need_chi)
        chi_cont_cmf = chi_escat + chi_ff + chi_bf
        chi_cont = chi_cont_cmf * doppler
        if opts.expansionopacities_on:
            # binned expansion opacities instead of the per-line walk
            # (reference: rpkt.cc:199-290)
            from . import expansionopacity as expo
            from .linewalk import EventResult

            rho_p = jnp.where(nonempty, cells.rho[safe_mgi], 0.0)
            krd = ctx.expopac_kappa[safe_mgi] * (rho_p * doppler)[:, None]
            edist_x, bb_frac = expo.get_event_expansion_batch(
                krd, st_nu_cmf, st.prop_time, chi_cont, tau_next, abort_dist,
                nu_cmf_abort, d_nu_on_d_l, need_chi,
                opts.use_relativistic_doppler_shift,
            )
            is_bb_x = _uniform(key, 59, n, st_nu_cmf.dtype) <= bb_frac
            ev = EventResult(
                edist=edist_x,
                next_trans=jnp.zeros_like(st.ptype) - 1,
                is_boundbound=is_bb_x & jnp.isfinite(edist_x),
                activating_line=jnp.zeros_like(st.ptype) - 99,
            )
            jb_acc, jb_cnt = est.jblue_raw, est.jblue_count
        else:
            if opts.detailed_line_estimators_on:
                ev, jb_acc, jb_cnt = get_event_batch(
                    dad, ctx.tau_sob_factor, safe_mgi, st_nu_cmf, st.prop_time,
                    st_next_trans, chi_cont, tau_next, abort_dist,
                    nu_cmf_abort, d_nu_on_d_l, need_chi,
                    opts.use_relativistic_doppler_shift,
                    chunk=opts.linewalk_chunk,
                    jblue=(ctx.jblue_of_line, st.e_cmf, est.jblue_raw,
                           est.jblue_count),
                )
            else:
                ev = get_event_batch(
                    dad, ctx.tau_sob_factor, safe_mgi, st_nu_cmf, st.prop_time, st_next_trans,
                    chi_cont, tau_next, abort_dist, nu_cmf_abort, d_nu_on_d_l,
                    need_chi, opts.use_relativistic_doppler_shift, chunk=opts.linewalk_chunk,
                )
                jb_acc, jb_cnt = est.jblue_raw, est.jblue_count
        if select_continuum is not None:
            contindex = select_continuum(jax.random.fold_in(key, 54)).astype(jnp.int32)
        else:
            contindex = jnp.zeros_like(st.ptype)
        return (chi_escat, chi_ff, chi_bf, chi_cont_cmf, ev.edist,
                ev.next_trans, ev.is_boundbound, ev.activating_line, contindex,
                gamma_contr, jb_acc, jb_cnt)

    def grey_only(st_nu_cmf, st_next_trans):
        z = jnp.zeros_like(st_nu_cmf)
        zi = jnp.zeros_like(st.ptype)
        return (z, z, z, z, z + jnp.inf, st_next_trans.astype(jnp.int32),
                jnp.zeros_like(mask), zi - 99, zi,
                z[:, None] + jnp.zeros((ngc,), st_nu_cmf.dtype),
                est.jblue_raw, est.jblue_count)

    (chi_escat, chi_ff, chi_bf, chi_cont_cmf, ev_edist, ev_next_trans,
     ev_is_bb, ev_act_line, bf_contindex, gamma_contr,
     jblue_raw_new, jblue_count_new) = jax.lax.cond(
        jnp.any(need_chi), nongrey_machinery, grey_only, st.nu_cmf, st.next_trans
    )
    if opts.detailed_line_estimators_on:
        est = est.replace(jblue_raw=jblue_raw_new, jblue_count=jblue_count_new)

    # thick cells: grey opacity (rpkt.cc:647-654)
    chi_grey = cells.kappagrey[safe_mgi] * cells.rho[safe_mgi] * doppler
    edist_thick = tau_next / jnp.maximum(chi_grey, 1e-300)

    edist = jnp.where(thick, edist_thick, jnp.where(nonempty, ev_edist, jnp.inf))
    next_trans = jnp.where(
        thick, -1, jnp.where(nonempty, ev_next_trans, -1)
    )
    is_bb = ~thick & nonempty & ev_is_bb

    take_boundary = mask & (sdist <= tdist) & (sdist <= edist)
    take_event = mask & ~take_boundary & (edist <= tdist)
    take_tlimit = mask & ~take_boundary & ~take_event

    # float32 runs overshoot boundary crossings by a few ulps of the radius
    # so the packet lands firmly inside the next cell (see pallas_rpkt)
    overshoot = (
        3e-6 * jnp.sqrt(jnp.sum(st.pos * st.pos, axis=-1))
        if st.pos.dtype == jnp.float32 else 0.0
    )
    dist = jnp.where(
        take_boundary, sdist + overshoot, jnp.where(take_event, edist, tdist)
    )
    dist = jnp.maximum(dist, 0.0)

    # two half-moves with estimator update at the midpoint (rpkt.cc:676-727)
    pos1, t1, nucmf1, ecmf1, dop_mid = geometry.move_pkt(
        st.pos, st.dir, st.prop_time, st.nu_rf, st.nu_cmf, st.e_rf, dist / 2.0,
        opts.use_relativistic_doppler_shift,
    )
    contrib = jnp.where(mask & nonempty, dist * ecmf1, 0.0)
    est = est.replace(
        j=cell_add(est.j, nonemptymgi, contrib, mask & nonempty),
        nuj=cell_add(est.nuj, nonemptymgi, contrib * nucmf1, mask & nonempty),
        ffheating=cell_add(
            est.ffheating, nonemptymgi, contrib * chi_ff, mask & nonempty & ~thick
        ),
    )
    if opts.use_lut_photoion or opts.use_lut_bfheating:
        # LUT photoionisation/bf-heating estimators (reference: rpkt.cc:580-599)
        nu_edge_g = dad.groundcont_nu_edge[None, :].astype(st.pos.dtype)
        seg_ok = mask & nonempty & ~thick
        # negative mgi would wrap: route invalid rows out of bounds instead
        mgi_safe_scatter = jnp.where(seg_ok, nonemptymgi, est.gammaestimator.shape[0])
        de = contrib[:, None] * gamma_contr
        if opts.use_lut_photoion:
            gadd = de / jnp.maximum(nucmf1, 1e-30)[:, None]
            est = est.replace(
                gammaestimator=est.gammaestimator.at[mgi_safe_scatter, :].add(gadd, mode="drop")
            )
        if opts.use_lut_bfheating:
            badd = de * jnp.maximum(1.0 - nu_edge_g / jnp.maximum(nucmf1, 1e-30)[:, None], 0.0)
            est = est.replace(
                bfheatingestimator=est.bfheatingestimator.at[mgi_safe_scatter, :].add(badd, mode="drop")
            )

    if opts.detailed_bf_estimators_on and dad.nbfcontinua > 0:
        # detailed per-continuum photoionisation-rate estimators
        # (reference: radfield.cc:204-233, rpkt.cc:560-599)
        seg_ok = mask & nonempty & ~thick
        weight = jnp.where(
            seg_ok, contrib / jnp.maximum(nucmf1, 1e-30) * doppler, 0.0
        )
        est = est.replace(
            bfrate=opacity.accumulate_bf_estimators(
                dad, jnp.where(seg_ok, st.nu_cmf, 1e15), safe_mgi, seg_ok,
                ctx.bf_dep, cells.Te, weight, est.bfrate,
                chunk=opts.linewalk_chunk,
            )
        )

    if opts.multibin_radfield:
        # per-bin J/nuJ estimators (reference: radfield.cc:731-759)
        from ..plasma import radfield as radfield_mod
        b = radfield_mod.select_bin(nucmf1, opts.radfieldbincount)
        # out-of-range (high) indices are dropped; negative would wrap
        b = jnp.where((mask & nonempty) & (b >= 0), b, opts.radfieldbincount)
        est = est.replace(
            radfieldbin_j=est.radfieldbin_j.at[nonemptymgi, b].add(contrib, mode="drop"),
            radfieldbin_nuj=est.radfieldbin_nuj.at[nonemptymgi, b].add(
                contrib * nucmf1, mode="drop"
            ),
            radfieldbin_count=est.radfieldbin_count.at[nonemptymgi, b].add(
                1.0, mode="drop"
            ),
        )
    pos2, t2_, nucmf2, ecmf2, _ = geometry.move_pkt(
        pos1, st.dir, t1, st.nu_rf, nucmf1, st.e_rf, dist / 2.0,
        opts.use_relativistic_doppler_shift,
    )
    st = st.replace(
        pos=jnp.where(mask[:, None], pos2, st.pos),
        prop_time=jnp.where(take_tlimit, ctx.t2, jnp.where(mask, t2_, st.prop_time)),
        nu_cmf=jnp.where(mask, nucmf2, st.nu_cmf),
        e_cmf=jnp.where(mask, ecmf2, st.e_cmf),
        next_trans=jnp.where(mask & ~thick & nonempty, next_trans, st.next_trans),
    )
    # empty cells: skip line search on re-entry (rpkt.cc:643-646)
    st = st.replace(next_trans=jnp.where(mask & ~nonempty, -1, st.next_trans))

    # boundary crossing / escape
    escaping = take_boundary & (snext == BOUNDARY_ESCAPE)
    crossing = take_boundary & (snext >= 0)
    st = st.replace(
        where=jnp.where(crossing, snext, st.where),
        escape_type=jnp.where(escaping, st.ptype, st.escape_type),
        escape_time=jnp.where(escaping, st.prop_time, st.escape_time),
        ptype=jnp.where(escaping, TYPE_ESCAPE, st.ptype),
    )
    est = est.replace(
        nesc=est.nesc + jnp.sum(escaping).astype(est.nesc.dtype),
        cmf_lum=est.cmf_lum + jnp.sum(jnp.where(escaping, st.e_cmf, 0.0)),
        counters=stats.bump(est.counters, stats.CELLCROSSINGS, crossing),
    )

    # record the event context for the deferred application pass; evented
    # lanes freeze (mask excludes them from further crossing iterations)
    upd = lambda name, val: jnp.where(take_event, val, evctx[name])
    evctx = dict(
        take_event=evctx["take_event"] | take_event,
        thick=upd("thick", thick),
        is_bb=upd("is_bb", is_bb),
        chi_escat=upd("chi_escat", chi_escat),
        chi_ff=upd("chi_ff", chi_ff),
        chi_bf=upd("chi_bf", chi_bf),
        chi_cont_cmf=upd("chi_cont_cmf", chi_cont_cmf),
        bf_contindex=upd("bf_contindex", bf_contindex.astype(jnp.int32)),
        act_line=upd("act_line", ev_act_line.astype(jnp.int32)),
        nonemptymgi=upd("nonemptymgi", nonemptymgi.astype(jnp.int32)),
    )
    return st, est, evctx


def _rpkt_apply_events(
    key, st, est, ctx, grid, dad, cells, opts, opacity_case,
    take_event, thick, is_bb, chi_escat, chi_ff, chi_bf, chi_cont_cmf,
    bf_contindex, ev_act_line, nonemptymgi,
    no_escat: bool = False,
):
    """Apply the physical-event outcomes to the packets that had one this
    iteration (reference: rpkt.cc:411-557 rpkt_event_*)."""
    n = st.npkts
    dtype = st.pos.dtype
    ev_thick = take_event & thick
    ev_bb = take_event & ~thick & is_bb
    ev_cont = take_event & ~thick & ~is_bb

    # continuum event split (rpkt.cc:411-513); events arriving from the
    # Pallas kernel already handled the electron-scattering branch, so the
    # split is drawn from the conditional distribution over [chi_es, chi_tot]
    u52 = _uniform(key, 52, n, dtype)
    if no_escat:
        chi_rnd = chi_escat + u52 * jnp.maximum(chi_cont_cmf - chi_escat, 0.0)
    else:
        chi_rnd = u52 * chi_cont_cmf
    ev_escat = ev_cont & (chi_rnd < chi_escat)
    ev_ff = ev_cont & ~ev_escat & (chi_rnd < chi_escat + chi_ff)
    ev_bf = ev_cont & ~ev_escat & ~ev_ff

    if opts.vpkt_on:
        est = _vpkt_spawn(
            jax.random.fold_in(key, 58), st, est, ctx, grid, dad, cells, opts,
            ev_escat, True, st.nu_cmf, opacity_case,
        )
    counters = stats.bump(est.counters, stats.INTERACTIONS, take_event)
    counters = stats.bump(counters, stats.ESCOUNTER, ev_escat)
    counters = stats.bump(counters, stats.K_STAT_FROM_FF, ev_ff)
    counters = stats.bump(counters, stats.MA_STAT_ACTIVATION_BB, ev_bb)
    est = est.replace(counters=counters)

    # thick-cell grey scatter + electron scatter: coherent isotropic re-emission
    if opts.expansionopacities_on:
        from . import expansionopacity as expo
        p_therm = opts.rpkt_boundbound_thermalisation_probability
        if p_therm >= 0.0:
            # bound-bound interactions scatter coherently or thermalise with
            # a fixed probability (reference: rpkt.cc:706-713)
            thermalise = ev_bb & (
                _uniform(key, 56, n, dtype) < jnp.asarray(p_therm, dtype)
            )
            nu_resample = expo.sample_planck_times_expansion_opacity(
                jax.random.fold_in(key, 57), ctx.expopac_planck_cum,
                jnp.maximum(nonemptymgi, 0), thermalise,
            )
            st = st.replace(
                nu_cmf=jnp.where(thermalise, nu_resample, st.nu_cmf),
                emissiontype=jnp.where(thermalise, EMTYPE_FREEFREE, st.emissiontype),
            )
            iso_mask = ev_thick | ev_bb
            ev_bb = jnp.zeros_like(ev_bb)  # no macro-atom activations
        else:
            # THERMALISATION_PROBABILITY < 0 (all reference presets): the
            # bb event activates the macro-atom on a line resolved within
            # the hit wavelength bin (reference re-traces the bin
            # line-by-line, rpkt.cc:238-262 + 703-705; we draw the line by
            # its contribution to the bin opacity). Without this, a packet
            # in a high-kappa bin coherent-scatters ~tau^2 times and never
            # escapes (the "immortal packet" failure mode).
            sel_line, sel_ok = expo.sample_bb_line(
                jax.random.fold_in(key, 56), ctx.expopac_wcum,
                ctx.expopac_binoffsets, jnp.maximum(nonemptymgi, 0),
                st.nu_cmf, ev_bb, chunk=min(opts.linewalk_chunk, dad.nlines),
            )
            ev_act_line = jnp.where(ev_bb & sel_ok, sel_line, ev_act_line)
            # zero-weight bin (pure continuum drift into the bin edge):
            # coherent scatter keeps the packet moving
            iso_mask = ev_thick | (ev_bb & ~sel_ok)
            ev_bb = ev_bb & sel_ok
    else:
        iso_mask = ev_thick
    scatter_mask = iso_mask | ev_escat
    st_scattered = emit_rpkt_batch(key, 53, st, iso_mask, opts)
    # electron scattering keeps coherence but redirects by the (dipole or
    # isotropic) Thomson phase function with Stokes transport (rpkt.cc:292-409)
    st_scattered = electron_scatter_batch(key, 59, st_scattered, ev_escat, opts)
    st = st_scattered.replace(
        nscatterings=jnp.where(scatter_mask, st.nscatterings + 1, st.nscatterings),
        em_pos=jnp.where(scatter_mask[:, None], st.pos, st.em_pos),
        em_time=jnp.where(scatter_mask, st.prop_time, st.em_time),
        # thick-cell scatter resets emission type via emit; es keeps it:
        emissiontype=jnp.where(scatter_mask, st.emissiontype, st_scattered.emissiontype),
    )

    # ff absorption -> kpkt (rpkt.cc:450-456)
    st = st.replace(
        ptype=jnp.where(ev_ff, TYPE_KPKT, st.ptype),
        absorptiontype=jnp.where(ev_ff, -1, st.absorptiontype),
    )

    # bf absorption (rpkt.cc:457-510); the continuum was pre-selected inside
    # the gated non-grey branch
    if dad.nbfcontinua > 0:
        contindex = bf_contindex
        nu_edge_sel = dad.cont_nu_edge[contindex]
        goes_macroatom = ev_bf & (
            _uniform(key, 55, n, dtype) < nu_edge_sel / jnp.maximum(st.nu_cmf, 1e-30)
        )
        st = st.replace(
            absorptiontype=jnp.where(ev_bf, -2, st.absorptiontype),
            ptype=jnp.where(ev_bf & ~goes_macroatom, TYPE_KPKT, st.ptype),
        )
        # macro-atom activation at the photoionisation target level
        ma_level = dad.cont_uniqueupper[contindex]
        st = st.replace(ptype=jnp.where(goes_macroatom, TYPE_MA, st.ptype))
        cnt = stats.bump(est.counters, stats.K_STAT_FROM_BF, ev_bf & ~goes_macroatom)
        est = est.replace(counters=stats.bump(cnt, stats.MA_STAT_ACTIVATION_BF, goes_macroatom))
        ma_from_bf = goes_macroatom
        ma_level_bf = ma_level
    else:
        st = st.replace(
            absorptiontype=jnp.where(ev_bf, -2, st.absorptiontype),
            ptype=jnp.where(ev_bf, TYPE_KPKT, st.ptype),
        )
        ma_from_bf = jnp.zeros(n, bool)
        ma_level_bf = jnp.zeros_like(st.ptype)

    # bound-bound absorption -> macro-atom (rpkt.cc:517-543)
    act_line = ev_act_line
    st = st.replace(
        ptype=jnp.where(ev_bb, TYPE_MA, st.ptype),
        absorptiontype=jnp.where(ev_bb, act_line, st.absorptiontype),
        absorptionfreq=jnp.where(ev_bb, st.nu_rf, st.absorptionfreq),
    )
    ma_level_bb = dad.line_upperunique[jnp.clip(act_line, 0, dad.nlines - 1)]
    ma_level = jnp.where(ev_bb, ma_level_bb, ma_level_bf).astype(jnp.int32)
    ma_mask = ev_bb | ma_from_bf
    ma_activating_line = jnp.where(ev_bb, act_line, -99)

    if opts.record_linestat:
        # per-line absorption counters (reference: RECORD_LINESTAT,
        # rpkt.cc:530-535 acounter)
        la = est.line_absorbcount.at[
            jnp.where(ev_bb, ev_act_line, est.line_absorbcount.shape[0])
        ].add(1, mode="drop")
        est = est.replace(line_absorbcount=la)
    if opts.track_ion_stats:
        # per-ion absorption statistics (reference: rpkt.cc:487-535,
        # stats.cc:36-154)
        e = st.e_cmf
        ion_bb = dad.line_ion[jnp.clip(ev_act_line, 0, dad.nlines - 1)].astype(jnp.int32)
        ist = stats.ion_add(
            est.ion_stats, nonemptymgi, ion_bb,
            stats.ION_MACROATOM_ENERGYIN_RADEXC, e, ev_bb,
        )
        emt = st.emissiontype
        ion_em = dad.line_ion[jnp.clip(emt, 0, dad.nlines - 1)].astype(jnp.int32)
        ist = stats.ion_add(
            ist, nonemptymgi, ion_em, stats.ION_BOUNDBOUND_ABSORBED, e,
            ev_bb & (emt >= 0),
        )
        if dad.nbfcontinua > 0:
            ion_bf = dad.cont_ion[bf_contindex].astype(jnp.int32)
            ion_bf_up = jnp.minimum(ion_bf + 1, dad.nions_total - 1)
            eps = (H * dad.cont_nu_edge[bf_contindex]).astype(e.dtype)
            ist = stats.ion_add(
                ist, nonemptymgi, ion_bf, stats.ION_PHOTOION,
                e / jnp.maximum(eps, 1e-300), ev_bf,
            )
            ist = stats.ion_add(
                ist, nonemptymgi, ion_bf, stats.ION_RADRECOMB_ABSORBED, e, ev_bf,
            )
            ist = stats.ion_add(
                ist, nonemptymgi, ion_bf_up,
                stats.ION_MACROATOM_ENERGYIN_PHOTOION, e, ma_from_bf,
            )
        est = est.replace(ion_stats=ist)

    return st, est, ma_mask, ma_level, ma_activating_line


# ---------------------------------------------------------------------------
# full-timestep wavefront (reference: update_packets.cc:361-437)
# ---------------------------------------------------------------------------


def apply_macroatom_results(key, tag, st: PacketState, ma_res, ma_mask, opts: Options):
    """Apply macro-atom deactivation outcomes (reference: macroatom.cc:398-628)."""
    kind = jnp.where(ma_mask, ma_res["kind"], 0)
    rad = (kind == 1) | (kind == 2)
    to_kpkt = kind == 3

    st = st.replace(nu_cmf=jnp.where(rad, ma_res["nu_cmf"], st.nu_cmf))
    st_emitted = emit_rpkt_batch(key, tag, st, rad, opts)
    st = st_emitted.replace(
        emissiontype=jnp.where(rad, ma_res["emissiontype"], st.emissiontype),
        next_trans=jnp.where(rad, ma_res["next_trans"], st.next_trans),
        em_pos=jnp.where(rad[:, None], st.pos, st.em_pos),
        em_time=jnp.where(rad, st.prop_time, st.em_time),
        nscatterings=jnp.where(rad, 0, st.nscatterings),
        ptype=jnp.where(to_kpkt, TYPE_KPKT, st_emitted.ptype),
    )
    # first thermal-emission bookkeeping (macroatom.cc:617-621)
    notset = st.trueemissiontype == EMTYPE_NOTSET
    st = st.replace(
        trueemissiontype=jnp.where(ma_mask & notset & rad, st.emissiontype, st.trueemissiontype),
        trueem_time=jnp.where(ma_mask & notset & rad, st.em_time, st.trueem_time),
        trueemissionvelocity=jnp.where(
            ma_mask & notset & rad,
            geometry.vec_len(st.em_pos) / jnp.maximum(st.em_time, 1e-30),
            st.trueemissionvelocity,
        ),
    )
    return st


def transport_timestep(
    key,
    st: PacketState,
    est: Estimators,
    grid: GridData,
    dad: DeviceAtomicData,
    aux,
    rc,
    rates,
    cells,
    ctx: StepContext,
    opts: Options,
    gamma_kappagrey: float,
    opacity_case: int,
    kpktdiffusion_timescale: float,
    apply_kpkt_diffusion: bool,
    max_iters: int = 4096,
):
    """Advance every packet to the end of the timestep (or escape).

    One while_loop iteration performs: pellet decays, nonthermal predeposits,
    NT-deposit conversions, k-packet destruction, a gamma flight step, an
    r-packet event step, and macro-atom resolution — each as a masked batched
    pass, replacing the reference's per-packet recursion + sort-by-cell passes
    (update_packets.cc:374-425).
    """
    from .kpkt import do_kpkt_batch
    from .macroatom import do_macroatom_batch

    # trace-time selection of the fused Pallas propagation kernel
    # (ARTIS_FORCE_PALLAS=1 runs it in interpret mode off-TPU so tests can
    # exercise the kernel composed with shard_map on a virtual mesh)
    use_pallas = False
    if opts.use_pallas_rpkt and st.pos.dtype == jnp.float32:
        from . import pallas_rpkt as _pk
        use_pallas = (
            (jax.default_backend() == "tpu"
             or os.environ.get("ARTIS_FORCE_PALLAS") == "1")
            and _pk.supported(opts, dad, grid, cells.Te.shape[0])
            and opacity_case >= 4
        )
    rpkt_step_fn = rpkt_step_pallas if use_pallas else rpkt_step

    def is_active(st):
        return (st.ptype != TYPE_ESCAPE) & (st.prop_time < ctx.t2)

    def cond(carry):
        st, est, it, nsteps = carry
        n_active = jnp.sum(is_active(st).astype(jnp.int32))
        go = jnp.logical_and(n_active > 0, it < max_iters)
        if opts.exit_below > 0:
            # hand the stragglers back to the driver for a narrower buffer
            # (device-side counterpart of the tail-width ladder switch)
            go = jnp.logical_and(
                go, jnp.logical_or(it < 1, n_active > opts.exit_below))
        return go

    def body_inner(st, est, k, nsteps):
        active = st.prop_time < ctx.t2

        # Each phase is gated by lax.cond on whether any packet needs it, so
        # wavefront-tail iterations (a few straggler packets) skip the cost of
        # every other phase — the TPU counterpart of the reference's
        # sort-escaped-to-the-end pass structure (update_packets.cc:281-332).
        def gated(pred, fn, operands):
            return jax.lax.cond(pred, fn, lambda *ops: ops, *operands)

        # 1+2+3: pellets, NT predeposit, NT-deposit conversion (cheap, fused)
        def conversions(st, est):
            st, est = pellet_step(jax.random.fold_in(k, 101), st, est, ctx, opts)
            st, est = nonthermal_predeposit_step(
                jax.random.fold_in(k, 102), st, est, ctx, grid, cells.rho, opts
            )
            nt_dep = (st.ptype == TYPE_NTLEPTON_DEPOSITED) | (st.ptype == TYPE_NTALPHA_DEPOSITED)
            nt_dep = nt_dep & (st.prop_time < ctx.t2)
            if opts.nt_on and opts.nt_solve_spencerfano:
                # Spencer-Fano deposition split: ionisation -> macro-atom at
                # the upper ion's ground state, else heating -> k-packet
                # (reference: nonthermal.cc:2308-2387 do_ntlepton_deposit;
                # NT excitation channel handled as heating while
                # NT_EXCITATION_ON is off)
                mgi_c = jnp.maximum(jnp.take(grid.nonemptymgi_of_cell, st.where), 0)
                thick_c = cells.thick[mgi_c] == 1
                u = _uniform(k, 121, st.npkts, st.pos.dtype)
                frac_ion = ctx.nt_frac_ionization[mgi_c]
                to_ion = nt_dep & ~thick_c & (u < frac_ion)
                rows = ctx.nt_frac_ion_by_ion[mgi_c]  # (npkts, nions)
                cum = jnp.cumsum(rows, axis=1)
                tot = jnp.maximum(cum[:, -1], 1e-300)
                u2 = _uniform(k, 122, st.npkts, st.pos.dtype) * tot
                lowerion = jnp.sum((cum <= u2[:, None]).astype(jnp.int32), axis=1)
                nions = rows.shape[1]
                lowerion = jnp.minimum(lowerion, nions - 1)
                # Auger electrons can skip ion stages: sample the upper ion
                # with the energy-weighted probabilities
                # (nonthermal.cc:2218-2243 nt_random_upperion energyweighted)
                enfrac = ctx.nt_ionenfrac_auger[mgi_c, lowerion, :]  # (npkts, naug)
                cum_a = jnp.cumsum(enfrac, axis=1)
                u3 = _uniform(k, 123, st.npkts, st.pos.dtype) * jnp.maximum(
                    cum_a[:, -1], 1e-300
                )
                n_auger = jnp.sum((cum_a <= u3[:, None]).astype(jnp.int32), axis=1)
                n_auger = jnp.minimum(n_auger, enfrac.shape[1] - 1)
                # clamp to the element's top ion (nt_ionisation_maxupperion)
                ion_idx_arr = jnp.arange(nions, dtype=jnp.int32)
                elem_arr = dad.ion_element[:nions]
                is_top = jnp.concatenate(
                    [elem_arr[:-1] != elem_arr[1:], jnp.ones((1,), bool)]
                )
                topion = jax.lax.associative_scan(
                    lambda a, b: jnp.where(b >= 0, b, a),
                    jnp.where(is_top, ion_idx_arr, -1)[::-1],
                )[::-1]
                upperion = jnp.minimum(
                    lowerion + 1 + n_auger.astype(jnp.int32), topion[lowerion]
                )
                upper_ground = dad.ion_level_start[upperion].astype(jnp.int32)
                # NT excitation channel: activate the macro-atom at the
                # excitation transition's upper level, selected by the
                # frac_deposition distribution; shortfall of the stored list
                # falls through to k-packet (nonthermal.cc:2353-2385)
                if opts.nt_excitation_on:
                    frac_exc = ctx.nt_frac_excitation[mgi_c]
                    rows_e = ctx.nt_exc_fracdep_cum[mgi_c]  # (npkts, nexc)
                    u_rel = u - frac_ion
                    maybe_exc = (
                        nt_dep & ~thick_c & ~to_ion & (u < frac_ion + frac_exc)
                    )
                    tsel = jnp.sum(
                        (rows_e <= u_rel[:, None]).astype(jnp.int32), axis=1
                    )
                    in_list = (tsel < rows_e.shape[1]) & (
                        u_rel < rows_e[:, -1]
                    )
                    to_exc = maybe_exc & in_list
                    exc_level = ctx.nt_exc_upper[
                        jnp.minimum(tsel, rows_e.shape[1] - 1)
                    ].astype(jnp.int32)
                else:
                    to_exc = jnp.zeros_like(to_ion)
                    exc_level = jnp.zeros_like(st.ma_level)
                to_ma = to_ion | to_exc
                st = st.replace(
                    ptype=jnp.where(to_ma, TYPE_MA,
                                    jnp.where(nt_dep, TYPE_KPKT, st.ptype)),
                    ma_level=jnp.where(
                        to_ion, upper_ground,
                        jnp.where(to_exc, exc_level, st.ma_level)),
                    trueemissiontype=jnp.where(
                        to_ma, EMTYPE_NOTSET, st.trueemissiontype
                    ),
                )
                cnt = stats.bump(est.counters, stats.NT_STAT_TO_IONIZATION, to_ion)
                cnt = stats.bump(cnt, stats.MA_STAT_ACTIVATION_NTCOLLION, to_ion)
                cnt = stats.bump(cnt, stats.NT_STAT_TO_EXCITATION, to_exc)
                cnt = stats.bump(cnt, stats.MA_STAT_ACTIVATION_NTCOLLEXC, to_exc)
                cnt = stats.bump(cnt, stats.NT_STAT_TO_KPKT, nt_dep & ~to_ma)
                est = est.replace(counters=cnt)
                if opts.track_ion_stats:
                    # reference: nonthermal.cc:2340-2347 TRACK_ION_STATS
                    mgi_s = jnp.take(grid.nonemptymgi_of_cell, st.where)
                    eps_ion = (
                        dad.ion_eps0[upperion] - dad.ion_eps0[lowerion]
                    ).astype(st.e_cmf.dtype)
                    ist = stats.ion_add(
                        est.ion_stats, mgi_s, lowerion, stats.ION_NTION,
                        st.e_cmf / jnp.maximum(eps_ion, 1e-300), to_ion,
                    )
                    ist = stats.ion_add(
                        ist, mgi_s, upperion,
                        stats.ION_MACROATOM_ENERGYIN_NTCOLLION, st.e_cmf, to_ion,
                    )
                    est = est.replace(ion_stats=ist)
            else:
                st = st.replace(ptype=jnp.where(nt_dep, TYPE_KPKT, st.ptype))
            return st, est

        if "conv" not in opts.phase_ablate:
            any_convertible = jnp.any(
                active & (
                    (st.ptype == TYPE_RADIOACTIVE_PELLET)
                    | (st.ptype == TYPE_NONTHERMAL_PREDEPOSIT_BETAMINUS)
                    | (st.ptype == TYPE_NONTHERMAL_PREDEPOSIT_BETAPLUS)
                    | (st.ptype == TYPE_NONTHERMAL_PREDEPOSIT_ALPHA)
                    | (st.ptype == TYPE_NTLEPTON_DEPOSITED)
                    | (st.ptype == TYPE_NTALPHA_DEPOSITED)
                )
            )
            st, est = gated(any_convertible, conversions, (st, est))

        # 4. k-packets
        nonemptymgi = jnp.take(grid.nonemptymgi_of_cell, st.where)
        safe_mgi = jnp.maximum(nonemptymgi, 0)
        nonthick = (nonemptymgi >= 0) & (cells.thick[safe_mgi] != 1)
        active = st.prop_time < ctx.t2
        any_kpkt = jnp.any(
            active & ((st.ptype == TYPE_KPKT) | (st.ptype == TYPE_PRE_KPKT))
        )

        def kpkt_phase(st, est):
            st, _bbmask = kpkt_blackbody_step(
                jax.random.fold_in(k, 103), st, ctx, grid, cells.Te, cells.thick, opts
            )
            kpkt_mask = (st.ptype == TYPE_KPKT) & (st.prop_time < ctx.t2) & nonthick
            # compact the (sparse) k-packet set into K2 lanes: the cooling
            # channel selection does per-lane cumulative sums over ions plus
            # chunked continuum/level/transition selects, so its cost scales
            # with the buffer width, not the k-packet count.  Overflow lanes
            # stay TYPE_KPKT and process next iteration.
            npk = st.npkts
            K2 = max(min(npk // max(opts.kpkt_compact_divisor, 1), npk), 1)
            (kidx,) = jnp.nonzero(kpkt_mask, size=K2, fill_value=npk)
            ksel_valid = kidx < npk
            kidxc = jnp.minimum(kidx, npk - 1)
            st_n = jax.tree_util.tree_map(lambda x: x[kidxc], st)
            st_n, rad_n, ma_mask_n, ma_level_n = do_kpkt_batch(
                jax.random.fold_in(k, 104), dad, aux, rc, rates, ctx.levelpops,
                st_n, ksel_valid, safe_mgi[kidxc], cells.Te, cells.nne,
                ctx.t2, ctx.t2 - ctx.ts,
                kpktdiffusion_timescale, apply_kpkt_diffusion,
            )
            kscatter = jnp.where(ksel_valid, kidx, npk)
            st = jax.tree_util.tree_map(
                lambda full, part: full.at[kscatter].set(part, mode="drop"),
                st, st_n,
            )

            def kexpand(x, fill):
                full = jnp.full((npk,), fill, x.dtype)
                return full.at[kscatter].set(
                    jnp.where(ksel_valid, x, fill), mode="drop")

            kpkt_rad = kexpand(rad_n, False)
            ma_mask_k = kexpand(ma_mask_n, False)
            ma_level_k = kexpand(ma_level_n, jnp.int32(0))
            if opts.vpkt_on:
                est = _vpkt_spawn(
                    jax.random.fold_in(k, 112), st, est, ctx, grid, dad, cells,
                    opts, kpkt_rad, False, st.nu_cmf, opacity_case,
                )
            st = emit_rpkt_batch(jax.random.fold_in(k, 105), 0, st, kpkt_rad, opts)
            st = st.replace(
                em_pos=jnp.where(kpkt_rad[:, None], st.pos, st.em_pos),
                em_time=jnp.where(kpkt_rad, st.prop_time, st.em_time),
                nscatterings=jnp.where(kpkt_rad, 0, st.nscatterings),
            )
            cnt = stats.bump(est.counters, stats.K_STAT_TO_R_FF, kpkt_rad)
            cnt = stats.bump(cnt, stats.K_STAT_TO_MA_COLLEXC, ma_mask_k)
            est = est.replace(counters=cnt)
            if opts.track_ion_stats:
                ion_k = dad.level_ion[
                    jnp.clip(ma_level_k, 0, dad.nlevels_total - 1)
                ].astype(jnp.int32)
                est = est.replace(ion_stats=stats.ion_add(
                    est.ion_stats, nonemptymgi, ion_k,
                    stats.ION_MACROATOM_ENERGYIN_COLLEXC, st.e_cmf, ma_mask_k,
                ))
            return st, est, ma_mask_k, ma_level_k

        if "kpkt" not in opts.phase_ablate:
            st, est, ma_mask_k, ma_level_k = jax.lax.cond(
                any_kpkt, kpkt_phase,
                lambda st, est: (st, est, jnp.zeros_like(st.ptype, dtype=bool),
                                 jnp.zeros_like(st.ptype, dtype=jnp.int32)),
                st, est,
            )
        else:
            ma_mask_k = jnp.zeros_like(st.ptype, dtype=bool)
            ma_level_k = jnp.zeros_like(st.ptype, dtype=jnp.int32)

        # 5. gamma packets
        if "gamma" not in opts.phase_ablate:
            any_gamma = jnp.any(active & (st.ptype == TYPE_GAMMA))
            st, est = gated(
                any_gamma,
                lambda st, est: gamma_step(
                    jax.random.fold_in(k, 106), st, est, ctx, grid, cells.rho,
                    cells.nnetot, cells.ffegrp, gamma_kappagrey, opts,
                ),
                (st, est),
            )

        # 6. r-packets (single instantiation: host-level chunk-width selection
        # in the driver replaces the old in-program full/compact duality,
        # which quadrupled XLA+Mosaic compile time)
        rpkt_active = (st.prop_time < ctx.t2) & (st.ptype == TYPE_RPKT)
        n_rpkt = jnp.sum(rpkt_active.astype(jnp.int32))

        def rpkt_phase(st, est):
            return rpkt_step_fn(
                jax.random.fold_in(k, 107), st, est, ctx, grid, dad, cells, opts,
                opacity_case,
            )

        if "rpkt" not in opts.phase_ablate:
            st, est, ma_mask_r, ma_level_r, ma_act_line, nadv_r = jax.lax.cond(
                n_rpkt > 0, rpkt_phase,
                lambda st, est: (st, est, jnp.zeros_like(st.ptype, dtype=bool),
                                 jnp.zeros_like(st.ptype, dtype=jnp.int32),
                                 jnp.zeros_like(st.ptype, dtype=jnp.int32) - 99,
                                 jnp.zeros((), jnp.int32)),
                st, est,
            )
        else:
            ma_mask_r = jnp.zeros_like(st.ptype, dtype=bool)
            ma_level_r = jnp.zeros_like(st.ptype, dtype=jnp.int32)
            nadv_r = jnp.zeros((), jnp.int32)
        # rpkt crossing-step counter (the headline throughput metric)
        nsteps = nsteps + nadv_r.astype(nsteps.dtype)

        # 7. macro-atoms (from kpkt collisions, rpkt bb/bf absorptions, and
        # unresolved macro atoms carried from previous iterations). At most
        # ma_max_jumps_per_iter jumps resolve per iteration; stragglers keep
        # their level in st.ma_level and continue next iteration, so a single
        # device dispatch never runs an unbounded jump chain.
        ma_carried = (st.ptype == TYPE_MA) & (st.prop_time < ctx.t2)
        ma_mask = ma_mask_k | ma_mask_r | ma_carried
        ma_level = jnp.where(
            ma_mask_k, ma_level_k, jnp.where(ma_mask_r, ma_level_r, st.ma_level)
        )

        def ma_phase(st, est):
            # compact the (usually sparse) macro-atom set into K lanes so the
            # jump loop's gathers scale with the macro-atom count
            npk = st.npkts
            K = max(min(npk // max(opts.ma_compact_divisor, 1), npk), 1)
            (idx,) = jnp.nonzero(ma_mask, size=K, fill_value=npk)
            sel_valid = idx < npk
            idxc = jnp.minimum(idx, npk - 1)
            ma_res_c = do_macroatom_batch(
                jax.random.fold_in(k, 108), dad, aux, rc, rates, ctx.levelpops,
                safe_mgi[idxc], ma_level[idxc], sel_valid,
                cells.Te, cells.TR, cells.W, cells.nne,
                ctx.t_mid, max_jumps=opts.ma_max_jumps_per_iter,
            )
            scatter_idx = jnp.where(sel_valid, idx, npk)

            def expand(x, fill):
                full = jnp.full((npk,), fill, x.dtype)
                return full.at[scatter_idx].set(x, mode="drop")

            ma_res = {
                "kind": expand(ma_res_c["kind"], jnp.int32(0)),
                "nu_cmf": expand(ma_res_c["nu_cmf"], jnp.asarray(0.0, st.nu_cmf.dtype)),
                "emissiontype": expand(ma_res_c["emissiontype"], jnp.int32(0)),
                "next_trans": expand(ma_res_c["next_trans"], jnp.int32(0)),
            }
            selected = expand(sel_valid, False)
            resolved_mask = ma_mask & selected
            st2 = apply_macroatom_results(
                jax.random.fold_in(k, 109), 110, st, ma_res, resolved_mask, opts
            )
            kindf = jnp.where(resolved_mask, ma_res["kind"], 0)
            if opts.vpkt_on:
                rad_m = (kindf == 1) | (kindf == 2)
                est = _vpkt_spawn(
                    jax.random.fold_in(k, 111), st, est, ctx, grid, dad, cells,
                    opts, rad_m, False, ma_res["nu_cmf"], opacity_case,
                )
            if opts.record_linestat:
                # per-line emission counters (macroatom.cc:404-410 ecounter)
                emline_ls = jnp.where(
                    resolved_mask & (kindf == 1), ma_res["emissiontype"],
                    est.line_emisscount.shape[0],
                )
                est = est.replace(line_emisscount=est.line_emisscount.at[
                    emline_ls
                ].add(1, mode="drop"))
            cnt = stats.bump(est.counters, stats.MA_STAT_DEACTIVATION_BB, kindf == 1)
            cnt = stats.bump(cnt, stats.MA_STAT_DEACTIVATION_FB, kindf == 2)
            cnt = stats.bump(cnt, stats.MA_STAT_DEACTIVATION_COLLDEEXC, kindf == 3)
            est = est.replace(counters=cnt)
            if opts.log_macroatom:
                # bounded per-interaction log rows at bb radiative
                # deactivation (reference: LOG_MACROATOM macroatom.cc:413-421)
                logm = sel_valid & (ma_res_c["kind"] == 1)
                cap = est.malog.shape[0]
                pos = est.malog_n + jnp.cumsum(logm.astype(jnp.int32)) - 1
                pos = jnp.where(logm & (pos < cap), pos, cap)  # drop overflow
                fdt = est.malog.dtype
                rows = jnp.stack(
                    [
                        safe_mgi[idxc].astype(fdt),
                        ma_level[idxc].astype(fdt),
                        ma_res_c["level"].astype(fdt),
                        ma_res_c["emissiontype"].astype(fdt),
                        st.nu_cmf[idxc].astype(fdt),
                        ma_res_c["nu_cmf"].astype(fdt),
                        st.nu_rf[idxc].astype(fdt),
                        st2.nu_rf[idxc].astype(fdt),
                    ],
                    axis=1,
                )
                est = est.replace(
                    malog=est.malog.at[pos].set(rows, mode="drop"),
                    malog_n=(est.malog_n
                             + jnp.sum(logm.astype(jnp.int32))
                             ).astype(jnp.int32),
                )
            if opts.track_ion_stats:
                # reference: macroatom.cc:341 energy-in at activation,
                # 405-433 energy-out by deactivation channel
                mgi_s = jnp.take(grid.nonemptymgi_of_cell, st.where)
                e = st.e_cmf
                ion_act = dad.level_ion[
                    jnp.clip(ma_level, 0, dad.nlevels_total - 1)
                ].astype(jnp.int32)
                ist = stats.ion_add(
                    est.ion_stats, mgi_s, ion_act,
                    stats.ION_MACROATOM_ENERGYIN_TOTAL, e, resolved_mask,
                )
                level_out = expand(ma_res_c["level"], jnp.int32(0))
                ion_out = dad.level_ion[
                    jnp.clip(level_out, 0, dad.nlevels_total - 1)
                ].astype(jnp.int32)
                is_bb_d = resolved_mask & (kindf == 1)
                is_fb_d = resolved_mask & (kindf == 2)
                is_cd_d = resolved_mask & (kindf == 3)
                ist = stats.ion_add(
                    ist, mgi_s, ion_out,
                    stats.ION_MACROATOM_ENERGYOUT_RADDEEXC, e, is_bb_d,
                )
                emline = ma_res["emissiontype"]
                eps_line = (H * dad.line_nu[
                    jnp.clip(emline, 0, dad.nlines - 1)
                ]).astype(e.dtype)
                ist = stats.ion_add(
                    ist, mgi_s, ion_out, stats.ION_BOUNDBOUND_MACROATOM,
                    e / jnp.maximum(eps_line, 1e-300), is_bb_d & (emline >= 0),
                )
                ion_up_fb = jnp.minimum(ion_out + 1, dad.nions_total - 1)
                ist = stats.ion_add(
                    ist, mgi_s, ion_up_fb,
                    stats.ION_RADRECOMB_MACROATOM, e, is_fb_d,
                )
                ist = stats.ion_add(
                    ist, mgi_s, ion_out,
                    stats.ION_MACROATOM_ENERGYOUT_COLLDEEXC, e, is_cd_d,
                )
                ist = stats.ion_add(
                    ist, mgi_s, ion_out,
                    stats.ION_MACROATOM_ENERGYOUT_TOTAL, e,
                    is_bb_d | is_fb_d | is_cd_d,
                )
                est = est.replace(ion_stats=ist)
            # unresolved (jump cap) and unselected (buffer overflow) macro
            # atoms persist in the packet state for the next iteration
            level_full = expand(ma_res_c["level"], jnp.int32(0))
            unresolved_full = expand(ma_res_c["unresolved"], False)
            pending = ma_mask & ((selected & unresolved_full) | ~selected)
            pend_level = jnp.where(selected, level_full, ma_level)
            st2 = st2.replace(
                ptype=jnp.where(pending, TYPE_MA, st2.ptype),
                ma_level=jnp.where(pending, pend_level, st2.ma_level).astype(jnp.int32),
            )
            return st2, est

        if "ma" not in opts.phase_ablate:
            st, est = jax.lax.cond(
                jnp.any(ma_mask), ma_phase, lambda st, est: (st, est), st, est
            )

        return st, est, nsteps

    def body(carry):
        st, est, it, nsteps = carry
        k = jax.random.fold_in(key, it)
        st, est, nsteps = body_inner(st, est, k, nsteps)
        return st, est, it + 1, nsteps

    nsteps_dtype = jnp.int64 if st.pos.dtype == jnp.float64 else jnp.int32
    nsteps0 = jnp.sum(jnp.zeros_like(st.ptype, dtype=nsteps_dtype))
    st, est, iters, nsteps = jax.lax.while_loop(
        cond, body, (st, est, jnp.int32(0), nsteps0)
    )
    return st, est, iters, nsteps
