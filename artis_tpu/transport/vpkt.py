"""Virtual packets: observer-direction spectra with polarisation.

TPU-native rebuild of the reference vpkt subsystem (reference: vpkt.cc:899-962
vpkt_call_estimators, 162-420 rlc_emiss_vpkt, 33-111 binned Stokes spectra,
611-790 vpkt.txt configuration; Bulla, Sim & Kromer 2015).

At every real-packet interaction (electron scatter, macro-atom or k-packet
emission) a virtual packet is launched toward each observer direction: the
direction-dependent emission weight comes from the Rayleigh dipole phase
matrix (scatters) or 1/4pi (thermal emission), the optical depth along the
ray to escape is integrated, and e_rf * pn * exp(-tau) is accumulated into
time/frequency-binned Stokes (I, Q, U) spectra per opacity-exclusion channel.

TPU design notes:
- the interacting packets of one wavefront iteration are compacted to a small
  buffer, flattened over (packets x observers), and traced together;
- the reference's per-line opacity walk inside each cell crossing collapses
  into closed form: with nu linear in distance, sum_l tau_l * (t + D(nu_l)/c)
  over the lines crossed in a segment is expressible through two per-timestep
  cumulative tables sum(tau_factor) and sum(tau_factor * nu) -- one gather
  instead of a line loop, and exact.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import geometry
from ..constants import CLIGHT_PROP, DAY, PI
from ..grid import BOUNDARY_ESCAPE, GridData, boundary_distance
from . import opacity


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["obsdirs", "numin", "numax", "vgrid_numin", "vgrid_numax"],
    meta_fields=["nobs", "nspectra", "exclude", "tmin", "tmax", "tau_max",
                 "vmtbins", "vmnubins", "specnumin", "specnumax",
                 "vgrid_on", "vgrid_tmin", "vgrid_tmax", "vgrid_ny",
                 "vgrid_nz", "thick_vpkt"],
)
@dataclasses.dataclass(frozen=True)
class VpktConfig:
    obsdirs: jax.Array  # (nobs, 3) unit vectors
    numin: jax.Array  # (nranges,) frequency selection windows
    numax: jax.Array
    nobs: int
    nspectra: int
    exclude: tuple  # per spectrum: 0 all, -1 no-bb, -2 no-bf, -3 no-ff, -4 no-es, Z>0 exclude element
    tmin: float  # arrival-time window [s]
    tmax: float
    tau_max: float
    vmtbins: int
    vmnubins: int
    specnumin: float  # spectral grid (log-nu bins)
    specnumax: float
    # velocity-grid polarisation maps (reference: vpkt.cc:66-160)
    vgrid_numin: jax.Array = None  # (nwlbins,) frequency selection per map
    vgrid_numax: jax.Array = None
    vgrid_on: bool = False
    vgrid_tmin: float = 0.0  # arrival-time selection [s]
    vgrid_tmax: float = 0.0
    vgrid_ny: int = 50  # reference: VGRID_NY/VGRID_NZ (vpkt.h)
    vgrid_nz: int = 50
    # vpkt-only grey-depth threshold: cells with grey_depth above it get
    # thick=2 (vpkts die there, r-packets transport normally;
    # vpkt.cc:739-748, update_grid.cc:1031-1035); < 0 means "inherit
    # cell_is_optically_thick" (override_thickcell_tau != 1)
    thick_vpkt: float = -1.0


def read_vpkt_config(path: str, tmin: float, tmax: float,
                     vmtbins: int = 30, vmnubins: int = 1000) -> VpktConfig:
    """Parse vpkt.txt (reference: vpkt.cc:611-790)."""
    with open(path) as f:
        tok = f.read().split()
    it = iter(tok)
    nobs = int(next(it))
    costh = [float(next(it)) for _ in range(nobs)]
    costh = [min(max(c, -0.9999), 0.9999) for c in costh]
    phis = [float(next(it)) * PI / 180.0 for _ in range(nobs)]
    dirs = np.array([
        [np.sqrt(1 - c * c) * np.cos(p), np.sqrt(1 - c * c) * np.sin(p), c]
        for c, p in zip(costh, phis)
    ])
    custom = int(next(it))
    if custom == 1:
        nspectra = int(next(it))
        exclude = tuple(int(next(it)) for _ in range(nspectra))
    else:
        nspectra, exclude = 1, (0,)
    override_t = int(next(it))
    t0 = float(next(it)) * DAY
    t1 = float(next(it)) * DAY
    if override_t != 1:
        t0, t1 = tmin, tmax
    custom_nu = int(next(it))
    if custom_nu == 1:
        nranges = int(next(it))
        ranges = [(float(next(it)), float(next(it))) for _ in range(nranges)]
        # given in Angstroms (lambda max, lambda min per reference usage)
        numin = np.array([2.99792458e18 / max(a, b) for a, b in ranges])
        numax = np.array([2.99792458e18 / min(a, b) for a, b in ranges])
    else:
        numin, numax = np.array([1e14]), np.array([5e15])
    # reference order (vpkt.cc:741-790): thick-cell override pair, tau_max,
    # then the velocity-grid map section; parse leniently for short files
    tau_max = 10.0
    thick_vpkt = -1.0
    vgrid_on = False
    vg_t0 = t0
    vg_t1 = t1
    vg_numin = np.array([1e14])
    vg_numax = np.array([5e15])
    try:
        rest = [float(next(it))]
        rest.append(float(next(it)))
        # "override_thickcell cell_thick_tau" pair: when the flag is 1, the
        # given grey-depth threshold marks cells thick=2 for vpkts only;
        # otherwise inherit cell_is_optically_thick (vpkt.cc:739-748)
        if int(rest[0]) == 1:
            thick_vpkt = rest[1]
        tau_max = float(next(it))
        vgrid_on = int(float(next(it))) != 0
        if vgrid_on:
            vg_t0 = float(next(it)) * DAY
            vg_t1 = float(next(it)) * DAY
            nrg = int(float(next(it)))
            pairs = [(float(next(it)), float(next(it))) for _ in range(nrg)]
            vg_numin = np.array([2.99792458e18 / max(a, b) for a, b in pairs])
            vg_numax = np.array([2.99792458e18 / min(a, b) for a, b in pairs])
    except StopIteration:
        if "rest" in dir() and rest:
            tau_max = rest[0] if len(rest) >= 1 and tau_max == 10.0 else tau_max
    return VpktConfig(
        obsdirs=jnp.asarray(dirs), numin=jnp.asarray(numin),
        numax=jnp.asarray(numax), nobs=nobs, nspectra=nspectra,
        exclude=exclude, tmin=float(t0), tmax=float(t1), tau_max=tau_max,
        vmtbins=vmtbins, vmnubins=vmnubins, specnumin=1e14, specnumax=5e15,
        vgrid_numin=jnp.asarray(vg_numin), vgrid_numax=jnp.asarray(vg_numax),
        vgrid_on=vgrid_on, vgrid_tmin=float(vg_t0), vgrid_tmax=float(vg_t1),
        thick_vpkt=thick_vpkt,
    )


def default_vpkt_config(tmin: float, tmax: float, nobs: int = 1,
                        vmtbins: int = 30, vmnubins: int = 1000) -> VpktConfig:
    costh = np.linspace(-0.9, 0.9, nobs) if nobs > 1 else np.array([0.0])
    dirs = np.stack([np.sqrt(1 - costh**2), np.zeros(nobs), costh], axis=1)
    return VpktConfig(
        obsdirs=jnp.asarray(dirs), numin=jnp.asarray([1e14]),
        numax=jnp.asarray([5e15]), nobs=nobs, nspectra=1, exclude=(0,),
        tmin=tmin, tmax=tmax, tau_max=10.0, vmtbins=vmtbins,
        vmnubins=vmnubins, specnumin=1e14, specnumax=5e15,
        vgrid_numin=jnp.asarray([1e14]), vgrid_numax=jnp.asarray([5e15]),
    )


def zero_vspectra(cfg: VpktConfig, dtype=jnp.float32):
    """(nobs, nspectra, vmtbins, vmnubins, 3) Stokes I,Q,U flux sums."""
    return jnp.zeros((cfg.nobs, cfg.nspectra, cfg.vmtbins, cfg.vmnubins, 3), dtype)


def exclusion_tables_spec(exclude: tuple) -> tuple:
    """Unique excluded element Zs, defining extra line-opacity tables
    (table 0 = all lines; table 1+i = lines of Z=zs[i] removed)."""
    return tuple(sorted({z for z in exclude if z > 0}))


def build_vpkt_tables(tau_sob_factor, dad, exclude: tuple = ()):
    """Cumulative line-opacity tables for closed-form segment tau
    (per timestep): (ntab, ncells, nlines+1) cumsum of tau_factor and of
    tau_factor * nu over the nu-DESCENDING linelist. Table 0 includes all
    lines; one extra table per excluded element Z zeroes that element's
    lines (reference: vpkt.cc:330-340 per-element bb exclusion)."""
    tf = tau_sob_factor
    nu = dad.line_nu[None, :].astype(tf.dtype)
    zero = jnp.zeros((tf.shape[0], 1), tf.dtype)

    def cums(tfk):
        ct = jnp.concatenate([zero, jnp.cumsum(tfk, axis=1)], axis=1)
        cn = jnp.concatenate([zero, jnp.cumsum(tfk * nu, axis=1)], axis=1)
        return ct, cn

    tabs_t = []
    tabs_n = []
    ct, cn = cums(tf)
    tabs_t.append(ct)
    tabs_n.append(cn)
    for z in exclusion_tables_spec(exclude):
        line_z = dad.elem_z[dad.ion_element[dad.line_ion]]
        keep = (line_z != z)[None, :]
        ct, cn = cums(jnp.where(keep, tf, 0.0))
        tabs_t.append(ct)
        tabs_n.append(cn)
    return jnp.stack(tabs_t), jnp.stack(tabs_n)


def _segment_bb_tau(dad, cum_tau, cum_taunu, cellidx, nu_start, nu_end,
                    t_start, d_nu_on_d_l):
    """Exact sum of tau_sobolev(t at line crossing) over all lines with
    nu_end < nu_trans <= nu_start (reference: vpkt.cc:293-346 per-line walk).

    With nu(d) = nu_start + d_nu_on_d_l * d, line l crosses at
    D_l = (nu_l - nu_start)/d_nu_on_d_l, so
    sum tau_l (t + D_l/c) = t' sum tau_l + (sum tau_l nu_l - nu_start
    sum tau_l) / (c d_nu_on_d_l), with t' = t_start - nu_start/(c dndl)...
    combined directly below."""
    nlines = dad.nlines
    # descending list: first index with nu <= nu_start
    j1 = jnp.searchsorted(-dad.line_nu, -nu_start, side="left").astype(jnp.int32)
    j2 = jnp.searchsorted(-dad.line_nu, -nu_end, side="right").astype(jnp.int32)
    j1 = jnp.clip(j1, 0, nlines)
    j2 = jnp.clip(j2, j1, nlines)
    s_tau = cum_tau[cellidx, j2] - cum_tau[cellidx, j1]
    s_taunu = cum_taunu[cellidx, j2] - cum_taunu[cellidx, j1]
    inv_cd = 1.0 / (CLIGHT_PROP * d_nu_on_d_l)
    return jnp.maximum(s_tau * (t_start - nu_start * inv_cd) + s_taunu * inv_cd, 0.0)


def trace_vpkts(
    cfg: VpktConfig,
    vspec,  # accumulator from zero_vspectra
    dad,
    grid: GridData,
    cells,
    ctx,  # StepContext (bf_a/bf_dep/chi_ff_nnionpart/tau tables)
    cum_tau, cum_taunu,
    pos, dirvec, prop_time, where, nu_cmf, e_cmf, stokes_qu,  # (K, ...) compacted packets
    is_scatter,  # (K,) dipole (True) vs isotropic emission
    active,  # (K,)
    opacity_case: int,
    e_scale: float = 1.0,
    max_crossings: int = 512,
    vgrid_acc=None,  # (nobs, nwl, ny, nz, 3) velocity-grid Stokes maps
):
    """Launch virtual packets from K interaction sites toward every observer
    and accumulate exp(-tau)-weighted Stokes fluxes. With cfg.vgrid_on and a
    vgrid accumulator, also bins each ray's emission velocity projected onto
    the observer plane into polarisation maps (reference: vpkt.cc:66-160),
    returning (vspec, vgrid)."""
    K = pos.shape[0]
    nobs = cfg.nobs
    dtype = pos.dtype

    # flatten (K, nobs) -> rays
    def flat(x):
        return jnp.repeat(x, nobs, axis=0)

    obs = jnp.tile(cfg.obsdirs.astype(dtype)[None, :, :], (K, 1, 1)).reshape(K * nobs, 3)
    rpos = flat(pos)
    rt = flat(prop_time)
    rwhere = flat(where)
    rnu_cmf = flat(nu_cmf)
    re_cmf = flat(e_cmf)
    rdir_in = flat(dirvec)
    rq_in = flat(stokes_qu[:, 0])
    ru_in = flat(stokes_qu[:, 1])
    ractive = flat(active)
    ris_scatter = flat(is_scatter)

    doppler = geometry.doppler_nucmf_on_nurf(rpos, obs, rt, False)
    nu_rf = rnu_cmf / doppler
    e_rf = re_cmf / doppler

    # arrival-time / frequency-window selection (vpkt.cc:925-945)
    t_arrive = rt - geometry.dot(rpos, obs) / CLIGHT_PROP
    in_time = (t_arrive >= cfg.tmin) & (t_arrive <= cfg.tmax)
    in_nu = jnp.any(
        (nu_rf[:, None] > cfg.numin[None, :].astype(dtype))
        & (nu_rf[:, None] < cfg.numax[None, :].astype(dtype)),
        axis=1,
    )
    ractive = ractive & in_time & in_nu

    # --- emission weight + emergent Stokes (vpkt.cc:180-256, Bulla+2015) ---
    vel = geometry.get_velocity(rpos, rt)
    old_dir_cmf, qi, ui = geometry.frame_transform(rdir_in, rq_in, ru_in, vel)
    obs_cmf = geometry.angle_ab(obs, vel)
    ref1_o, ref2_o = geometry.meridian(old_dir_cmf)
    i1 = geometry.get_rot_angle(old_dir_cmf, obs_cmf, ref1_o, ref2_o)
    qold = qi * jnp.cos(2 * i1) - ui * jnp.sin(2 * i1)
    uold = qi * jnp.sin(2 * i1) + ui * jnp.cos(2 * i1)
    mu = geometry.dot(old_dir_cmf, obs_cmf)
    pn_scatter = 3.0 / (16.0 * PI) * (1 + mu**2 + (mu**2 - 1) * qold)
    inew = 0.75 * ((mu * mu + 1.0) + qold * (mu * mu - 1.0))
    qnew = (0.75 * ((mu * mu - 1.0) + qold * (mu * mu + 1.0))) / jnp.maximum(inew, 1e-30)
    unew = (1.5 * mu * uold) / jnp.maximum(inew, 1e-30)
    ref1_n, ref2_n = geometry.meridian(obs_cmf)
    i2 = PI + geometry.get_rot_angle(obs_cmf, old_dir_cmf, ref1_n, ref2_n)
    q_sc = qnew * jnp.cos(2 * i2) + unew * jnp.sin(2 * i2)
    u_sc = -qnew * jnp.sin(2 * i2) + unew * jnp.cos(2 * i2)
    _, q_rf, u_rf = geometry.frame_transform(obs_cmf, q_sc, u_sc, -vel)

    pn = jnp.where(ris_scatter, pn_scatter, 1.0 / (4 * PI))
    q_out = jnp.where(ris_scatter, q_rf, 0.0)
    u_out = jnp.where(ris_scatter, u_rf, 0.0)

    # --- ray trace to escape, accumulating per-channel tau ---
    nspec = cfg.nspectra
    tau = jnp.zeros((K * nobs, nspec), dtype)
    n = K * nobs
    t0 = rt

    def cond(c):
        _, _, _, _, _, done, it = c
        return jnp.logical_and(~jnp.all(done), it < max_crossings)

    def body(c):
        p, t, w, nu_c, tau, done, it = c
        sdist, snext = boundary_distance(grid, obs, p, t, w)
        sdist = jnp.maximum(sdist, 0.0)
        s_cont = sdist * (t0 / t) ** 3
        nonemptymgi = jnp.take(grid.nonemptymgi_of_cell, w)
        nonempty = nonemptymgi >= 0
        safe_mgi = jnp.maximum(nonemptymgi, 0)
        # vpkts die in BOTH thick==1 (grey) and thick==2 (vpkt-only thick)
        # cells (vpkt.cc:362-365 checks thick != 0)
        thick = nonempty & (cells.thick[safe_mgi] != 0)
        live = ~done & nonempty

        chi_es, chi_ff, chi_bf, _sel = opacity.calculate_chi_rpkt_cont(
            dad, jnp.where(live, nu_c, 1e15), safe_mgi, live,
            ctx.bf_a, ctx.bf_dep, ctx.chi_ff_nnionpart, cells.nne, cells.Te,
            opacity_case,
        )
        chi_tot = chi_es + chi_ff + chi_bf
        # continuum per channel with exclusions (vpkt.cc:267-280)
        cont = []
        for ind in range(nspec):
            exc = cfg.exclude[ind]
            if exc == -2:
                cont.append(chi_tot - chi_bf)
            elif exc == -3:
                cont.append(chi_tot - chi_ff)
            elif exc == -4:
                cont.append(chi_tot - chi_es)
            else:
                cont.append(chi_tot)
        chi_chan = jnp.stack(cont, axis=1)  # (n, nspec)

        # line opacity over the segment, closed form
        dop_end = geometry.doppler_nucmf_on_nurf(
            p + obs * sdist[:, None], obs, t + sdist / CLIGHT_PROP, False
        )
        nu_rf_ray = nu_c / geometry.doppler_nucmf_on_nurf(p, obs, t, False)
        nu_cmf_end = nu_rf_ray * dop_end
        dndl = jnp.minimum((nu_cmf_end - nu_c) / jnp.maximum(sdist, 1e-300), -1e-300)
        zs = exclusion_tables_spec(cfg.exclude)
        tau_bb_tab = {}
        for tabi in sorted({0, *(1 + zs.index(e) for e in cfg.exclude if e > 0)}):
            tb = _segment_bb_tau(
                dad, cum_tau[tabi], cum_taunu[tabi], safe_mgi, nu_c,
                nu_cmf_end, t, dndl,
            )
            tau_bb_tab[tabi] = jnp.where(live & ~thick, tb, 0.0)
        # bb per channel: none for -1, element-excluded table for Z>0
        # (reference: vpkt.cc:330-340), full lines otherwise
        bb_chan = jnp.stack(
            [jnp.zeros_like(tau_bb_tab[0]) if cfg.exclude[ind] == -1
             else tau_bb_tab[1 + zs.index(cfg.exclude[ind])]
             if cfg.exclude[ind] > 0 else tau_bb_tab[0]
             for ind in range(nspec)], axis=1,
        )
        tau_new = tau + jnp.where(
            live[:, None], chi_chan * s_cont[:, None] + bb_chan, 0.0
        )
        # kill on tau_max or on passing through a thick cell (vpkt.cc:283,365)
        killed = live & (jnp.min(tau_new, axis=1) > cfg.tau_max)
        killed = killed | (live & thick)

        p = jnp.where(done[:, None], p, p + obs * sdist[:, None])
        tnew = jnp.where(done, t, t + sdist / CLIGHT_PROP)
        nu_c2 = jnp.where(done, nu_c, nu_cmf_end)
        escaped = snext == BOUNDARY_ESCAPE
        w2 = jnp.where(done | escaped, w, jnp.maximum(snext, 0))
        done2 = done | killed | (~done & escaped)
        # escaped rays keep their tau; killed rays get inf
        tau_new = jnp.where(killed[:, None], jnp.inf, tau_new)
        return p, tnew, w2, nu_c2, tau_new, done2, it + 1

    init = (rpos, rt, rwhere, rnu_cmf, tau, ~ractive, jnp.int32(0))
    _, _, _, _, tau, _, _ = jax.lax.while_loop(cond, body, init)

    # --- bin into the Stokes spectra (vpkt.cc:33-111 add_to_vspecpol) ---
    dlogt = np.log(cfg.tmax / cfg.tmin) / cfg.vmtbins
    dlognu = np.log(cfg.specnumax / cfg.specnumin) / cfg.vmnubins
    tbin = jnp.floor(jnp.log(jnp.maximum(t_arrive, 1e-30) / cfg.tmin) / dlogt).astype(jnp.int32)
    nubin = jnp.floor(jnp.log(jnp.maximum(nu_rf, 1e-30) / cfg.specnumin) / dlognu).astype(jnp.int32)
    ok = ractive & (tbin >= 0) & (tbin < cfg.vmtbins) & (nubin >= 0) & (nubin < cfg.vmnubins)
    obsidx = jnp.tile(jnp.arange(nobs, dtype=jnp.int32)[None, :], (K, 1)).reshape(-1)
    contrib = e_rf * pn * e_scale  # [erg] per channel after exp(-tau)
    weights = jnp.exp(-jnp.where(jnp.isfinite(tau), tau, jnp.inf))  # (n, nspec)
    stokes = jnp.stack([jnp.ones_like(q_out), q_out, u_out], axis=1)  # (n, 3)
    vals = contrib[:, None, None] * weights[:, :, None] * stokes[:, None, :]
    tbin_s = jnp.where(ok, tbin, cfg.vmtbins)  # OOB -> dropped by the scatter
    nrays = K * nobs
    specidx = jnp.arange(cfg.nspectra, dtype=jnp.int32)
    stokesidx = jnp.arange(3, dtype=jnp.int32)
    vspec = vspec.at[
        obsidx[:, None, None],
        specidx[None, :, None],
        tbin_s[:, None, None],
        nubin[:, None, None],
        stokesidx[None, None, :],
    ].add(vals.astype(vspec.dtype), mode="drop")

    if cfg.vgrid_on and vgrid_acc is not None:
        # emission velocity rotated into (n_obs, ref1, ref2)
        # (reference: vpkt.cc:114-160 add_to_vpkt_grid)
        vel0 = rpos / rt[:, None]
        ox, oy, oz = obs[:, 0], obs[:, 1], obs[:, 2]
        denom = jnp.maximum(1.0 + ox, 1e-6)
        sq = jnp.sqrt(jnp.maximum(1.0 - ox * ox, 1e-12))
        vref1 = (
            -oy * vel0[:, 0] + (ox + oz * oz / denom) * vel0[:, 1]
            - oy * oz * (1.0 - ox) / sq * vel0[:, 2]
        )
        vref2 = (
            -oz * vel0[:, 0] - oy * oz * (1.0 - ox) / sq * vel0[:, 1]
            + (ox + oy * oy / denom) * vel0[:, 2]
        )
        # observer along +x: (vref1, vref2) = (vy, vz) exactly
        on_x = jnp.abs(ox) > 0.999999
        vref1 = jnp.where(on_x, jnp.sign(ox) * vel0[:, 1], vref1)
        vref2 = jnp.where(on_x, jnp.sign(ox) * vel0[:, 2], vref2)
        vmax = jnp.asarray(grid.vmax, dtype)
        ny_b = jnp.floor((vmax - vref1) / (2.0 * vmax / cfg.vgrid_ny)).astype(jnp.int32)
        nz_b = jnp.floor((vmax - vref2) / (2.0 * vmax / cfg.vgrid_nz)).astype(jnp.int32)
        ok_v = (
            ractive
            & (jnp.abs(vref1) < vmax) & (jnp.abs(vref2) < vmax)
            & (t_arrive >= cfg.vgrid_tmin) & (t_arrive <= cfg.vgrid_tmax)
        )
        # channel 0 (full opacity) weights the map (vpkt.cc:404-413)
        w0 = jnp.exp(-jnp.where(jnp.isfinite(tau[:, 0]), tau[:, 0], jnp.inf))
        amp = e_rf * e_scale * w0
        svals = amp[:, None] * stokes  # (n, 3)
        nwl = vgrid_acc.shape[1]
        in_wl = (
            (nu_rf[:, None] > cfg.vgrid_numin[None, :].astype(dtype))
            & (nu_rf[:, None] < cfg.vgrid_numax[None, :].astype(dtype))
        )  # (n, nwl)
        ny_s = jnp.where(ok_v, jnp.clip(ny_b, 0, cfg.vgrid_ny - 1), cfg.vgrid_ny)
        wl_idx = jnp.arange(nwl, dtype=jnp.int32)
        vg_vals = jnp.where(in_wl[:, :, None], svals[:, None, :], 0.0)
        vgrid_acc = vgrid_acc.at[
            obsidx[:, None, None],
            wl_idx[None, :, None],
            ny_s[:, None, None],
            jnp.clip(nz_b, 0, cfg.vgrid_nz - 1)[:, None, None],
            stokesidx[None, None, :],
        ].add(vg_vals.astype(vgrid_acc.dtype), mode="drop")
    return vspec, vgrid_acc


def write_vspecpol(path: str, cfg: VpktConfig, vspec, nprocs: int = 1):
    """specpol_virtual output (reference: vpkt.cc write_vspecpol layout:
    first column arrival times, then per time bin I, Q, U columns)."""
    import numpy as np

    arr = np.asarray(vspec)  # (nobs, nspec, nt, nnu, 3)
    dlogt = np.log(cfg.tmax / cfg.tmin) / cfg.vmtbins
    dlognu = np.log(cfg.specnumax / cfg.specnumin) / cfg.vmnubins
    tmid = cfg.tmin * np.exp((np.arange(cfg.vmtbins) + 0.5) * dlogt)
    numid = cfg.specnumin * np.exp((np.arange(cfg.vmnubins) + 0.5) * dlognu)
    dt = cfg.tmin * (np.exp((np.arange(cfg.vmtbins) + 1) * dlogt)
                     - np.exp(np.arange(cfg.vmtbins) * dlogt))
    dnu = cfg.specnumin * (np.exp((np.arange(cfg.vmnubins) + 1) * dlognu)
                           - np.exp(np.arange(cfg.vmnubins) * dlognu))
    # flux normalisation to a 1 Mpc observer (reference exspec convention)
    MPC2 = (3.0857e24) ** 2
    norm = 1.0 / (4 * PI * MPC2) / nprocs
    with open(path, "w") as f:
        f.write("0 " + " ".join(f"{t / DAY:g}" for t in tmid) + "\n")
        for iobs in range(cfg.nobs):
            for ispec in range(cfg.nspectra):
                for stokes_i in range(3):
                    for inu in range(cfg.vmnubins):
                        row = [f"{numid[inu]:g}"]
                        for itb in range(cfg.vmtbins):
                            val = arr[iobs, ispec, itb, inu, stokes_i]
                            row.append(f"{val * norm / dt[itb] / dnu[inu]:g}")
                        f.write(" ".join(row) + "\n")


def write_vpkt_grid(path: str, cfg: VpktConfig, vgrid, vmax: float,
                    nprocs: int = 1):
    """Velocity-grid polarisation map file (reference: vpkt.cc:527-560
    write_vpkt_grid): one row per (obsdir, wlbin, ny, nz) with the bin's
    central (vref1, vref2) and summed Stokes I, Q, U."""
    import numpy as np

    vg = np.asarray(vgrid, dtype=np.float64) / nprocs
    nobs, nwl, ny, nz, _ = vg.shape
    ybin = 2.0 * vmax / ny
    zbin = 2.0 * vmax / nz
    with open(path, "w") as f:
        f.write("#obsdirindex wlbin vref1 vref2 I Q U\n")
        for o in range(nobs):
            for wl in range(nwl):
                for n in range(ny):
                    vref1 = vmax - (n + 0.5) * ybin
                    for m in range(nz):
                        vref2 = vmax - (m + 0.5) * zbin
                        i, q, u = vg[o, wl, n, m]
                        f.write(
                            f"{o} {wl} {vref1:g} {vref2:g} {i:g} {q:g} {u:g}\n"
                        )
