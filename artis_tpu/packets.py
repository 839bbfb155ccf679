"""Packet state as a struct-of-arrays + pellet initialisation.

TPU-native rebuild of the reference packet model (reference: packet.h:32-68
Packet struct, packet.cc:86-162 packet_init, packet.cc:30-82 place_pellet,
decay.cc:1311-1402 setup_radioactive_pellet, decay.cc:475-490 sample_decaytime).

The reference's ~200-byte array-of-structs Packet becomes a PacketState
struct-of-arrays pytree so every transport step is a batched VPU operation.
All sampling is counter-based threefry (jax.random), making packet
initialisation bitwise reproducible at any device count — the reference's
per-rank seed offset (input.cc:1599-1607) is replaced by folding the packet
number into the key.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import geometry
from .constants import H, PI
from .grid import GridData, get_cell_volume_tmin
from .options import GridType, Options

# packet types (reference: packet.h:7-20)
TYPE_ESCAPE = 32
TYPE_RADIOACTIVE_PELLET = 100
TYPE_GAMMA = 10
TYPE_RPKT = 11
TYPE_KPKT = 12
TYPE_MA = 13
TYPE_NTLEPTON_DEPOSITED = 20
TYPE_NONTHERMAL_PREDEPOSIT_BETAMINUS = 21
TYPE_NONTHERMAL_PREDEPOSIT_BETAPLUS = 22
TYPE_NONTHERMAL_PREDEPOSIT_ALPHA = 23
TYPE_NTALPHA_DEPOSITED = 24
TYPE_PRE_KPKT = 120
# internal-only: packet finished the current timestep (not a reference type)
TYPE_INACTIVE = 0

EMTYPE_NOTSET = -9999000
EMTYPE_FREEFREE = -9999999


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "ptype", "prop_time", "where", "nscatterings", "pos", "dir",
        "e_cmf", "e_rf", "nu_cmf", "nu_rf", "next_trans", "emissiontype",
        "em_pos", "em_time", "absorptiontype", "absorptionfreq",
        "trueemissiontype", "trueem_time", "stokes", "tdecay",
        "escape_type", "escape_time", "number",
        "originated_from_particlenotgamma", "pellet_decaytype",
        "pellet_nucindex", "trueemissionvelocity", "ma_level",
    ],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class PacketState:
    """Struct-of-arrays over the packet batch (reference: packet.h:32-68)."""

    ptype: jax.Array  # int32
    prop_time: jax.Array  # f64 [s]
    where: jax.Array  # int32 propagation cell
    nscatterings: jax.Array  # int32
    pos: jax.Array  # (n, 3) f64 [cm]
    dir: jax.Array  # (n, 3) f64 unit
    e_cmf: jax.Array
    e_rf: jax.Array
    nu_cmf: jax.Array
    nu_rf: jax.Array
    next_trans: jax.Array  # int32 linelist cursor
    emissiontype: jax.Array  # int32
    em_pos: jax.Array  # (n, 3)
    em_time: jax.Array
    absorptiontype: jax.Array  # int32
    absorptionfreq: jax.Array
    trueemissiontype: jax.Array  # int32
    trueem_time: jax.Array
    stokes: jax.Array  # (n, 3)
    tdecay: jax.Array
    escape_type: jax.Array  # int32
    escape_time: jax.Array
    number: jax.Array  # int32
    originated_from_particlenotgamma: jax.Array  # bool
    pellet_decaytype: jax.Array  # int32
    pellet_nucindex: jax.Array  # int32
    trueemissionvelocity: jax.Array
    ma_level: jax.Array  # int32: current macro-atom level while mid-resolution

    @property
    def npkts(self) -> int:
        return self.ptype.shape[0]

    def replace(self, **kw) -> "PacketState":
        return dataclasses.replace(self, **kw)


def empty_state(npkts: int, dtype=jnp.float64) -> PacketState:
    z = jnp.zeros(npkts, dtype)
    zi = jnp.zeros(npkts, jnp.int32)
    z3 = jnp.zeros((npkts, 3), dtype)
    return PacketState(
        ptype=zi, prop_time=z - 1.0, where=zi - 1, nscatterings=zi, pos=z3,
        dir=z3, e_cmf=z, e_rf=z, nu_cmf=z, nu_rf=z, next_trans=zi - 1,
        emissiontype=zi + EMTYPE_NOTSET, em_pos=jnp.full((npkts, 3), jnp.nan, dtype),
        em_time=z - 1.0, absorptiontype=zi, absorptionfreq=z,
        trueemissiontype=zi + EMTYPE_NOTSET, trueem_time=z - 1.0, ma_level=zi,
        stokes=jnp.concatenate([jnp.ones((npkts, 1), dtype), jnp.zeros((npkts, 2), dtype)], axis=1),
        tdecay=z - 1.0, escape_type=zi, escape_time=z - 1.0,
        number=jnp.arange(npkts, dtype=jnp.int32),
        originated_from_particlenotgamma=jnp.zeros(npkts, bool),
        pellet_decaytype=zi - 1, pellet_nucindex=zi - 1, trueemissionvelocity=z - 1.0,
    )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "en_cumulative_cell", "chan_cumulative", "path_meanlife", "path_len",
        "end_engamma", "end_enparticle", "end_nucindex", "end_decaytype",
    ],
    meta_fields=["norm", "e0", "t_model", "tmin", "tmax", "has_initial_energy_channel", "initial_packets_on"],
)
@dataclasses.dataclass(frozen=True)
class PelletTables:
    """Precomputed sampling tables for pellet placement."""

    en_cumulative_cell: jax.Array  # (ngrid,) cumulative cell energy fractions in [0,1]
    chan_cumulative: jax.Array  # (nonempty, nchannels) cumulative channel fractions in [0,1]
    path_meanlife: jax.Array  # (npaths, maxlen) [s], 0 padded
    path_len: jax.Array  # (npaths,)
    end_engamma: jax.Array  # (npaths,)
    end_enparticle: jax.Array  # (npaths,)
    end_nucindex: jax.Array  # (npaths,)
    end_decaytype: jax.Array  # (npaths,)
    norm: float
    e0: float
    t_model: float
    tmin: float
    tmax: float
    has_initial_energy_channel: bool
    initial_packets_on: bool


def make_pellet_tables(
    grid: GridData,
    decdata,
    initnucmassfrac_mgi: np.ndarray,
    initenergyq_mgi: np.ndarray | None,
    opts: Options,
    tmin: float,
    tmax: float,
    grid_host=None,
) -> PelletTables:
    """Build sampling tables (reference: packet.cc:103-128, decay.cc:1311-1334).

    initnucmassfrac_mgi: (npts_model, num_nuclides) aligned to decdata indices.
    """
    from . import decay as decay_mod

    time_min_decay = decdata.t_model if opts.initial_packets_on else tmin
    # (npts_model, npaths)
    epm = decay_mod.setup_decaypath_energy_per_mass(
        decdata, initnucmassfrac_mgi, time_min_decay, tmax
    )

    mgi_of_cell = np.asarray(grid.mgi_of_cell)
    nonemptymgi_of_cell = np.asarray(grid.nonemptymgi_of_cell)
    npts = grid.npts_model

    q_mgi = epm.sum(axis=1)  # (npts_model,)
    has_init_en = opts.initial_packets_on and opts.use_model_initial_energy and initenergyq_mgi is not None
    if has_init_en:
        q_mgi = q_mgi + initenergyq_mgi

    vol = np.asarray(get_cell_volume_tmin(grid, grid_host), dtype=np.float64)
    rho = np.asarray(grid.rho_tmin_mgi, dtype=np.float64)[mgi_of_cell]
    q_cell = np.where(mgi_of_cell < npts, np.concatenate([q_mgi, [0.0]])[mgi_of_cell], 0.0)
    cell_en = vol * rho * q_cell
    en_cumulative = np.cumsum(cell_en)
    norm = float(en_cumulative[-1])
    assert norm > 0
    # tables are stored normalised to [0, 1]: raw cumulative energies (~1e46
    # erg) overflow float32 on device, and sampling only needs relative values
    en_cumulative = en_cumulative / norm

    # per-nonempty-cell channel cumulative sums (decay paths + optional init-E)
    mgi_of_nonempty = mgi_of_cell[np.asarray(grid.cell_of_nonemptymgi)]
    chan_en = epm[mgi_of_nonempty]  # (nonempty, npaths)
    if has_init_en:
        chan_en = np.concatenate([chan_en, initenergyq_mgi[mgi_of_nonempty][:, None]], axis=1)
    chan_cumulative = np.cumsum(chan_en, axis=1)
    chan_total = chan_cumulative[:, -1:]
    chan_cumulative = np.where(chan_total > 0, chan_cumulative / np.maximum(chan_total, 1e-300), 1.0)

    # per-path per-step mean lifetimes (all path members decay)
    lam = decdata.path_lambdas[:, : decdata.maxlen]
    lenmask = np.arange(decdata.maxlen)[None, :] < decdata.path_len[:, None]
    meanlife = np.where(lenmask & (lam > 0), 1.0 / np.where(lam > 0, lam, 1.0), 0.0)

    end_nuc = decdata.path_end_nucindex
    end_dt = decdata.path_end_decaytype
    end_engamma = decdata.nuc_endecay_gamma[end_nuc]
    end_enparticle = decdata.nuc_endecay_particle[end_nuc, end_dt]

    return PelletTables(
        en_cumulative_cell=jnp.asarray(en_cumulative),
        chan_cumulative=jnp.asarray(chan_cumulative),
        path_meanlife=jnp.asarray(meanlife),
        path_len=jnp.asarray(decdata.path_len),
        end_engamma=jnp.asarray(end_engamma),
        end_enparticle=jnp.asarray(end_enparticle),
        end_nucindex=jnp.asarray(end_nuc.astype(np.int32)),
        end_decaytype=jnp.asarray(end_dt.astype(np.int32)),
        norm=norm,
        e0=norm / opts.npkts,
        t_model=float(decdata.t_model),
        tmin=float(tmin),
        tmax=float(tmax),
        has_initial_energy_channel=bool(has_init_en),
        initial_packets_on=bool(opts.initial_packets_on),
    )


def _sample_pos_in_cell(key, grid: GridData, cellindex, tmin, dtype):
    """Uniform position within a cell at tmin (reference: packet.cc:37-64)."""
    k1, k2, k3 = jax.random.split(key, 3)
    n = cellindex.shape[0]
    if grid.grid_type == GridType.SPHERICAL1D:
        z = jax.random.uniform(k1, (n,), dtype)
        r_inner = jnp.take(grid.cell_pos_min[:, 0], cellindex)
        r_outer = jnp.take(grid.cell_pos_max[:, 0], cellindex)
        # ratio form: r**3 at CGS radii (1e42) overflows float32
        ratio3 = jnp.where(r_outer > 0, r_inner / jnp.maximum(r_outer, 1.0), 0.0) ** 3
        radius = r_outer * (z * ratio3 + (1.0 - z)) ** (1.0 / 3.0)
        return geometry.rand_isotropic_unitvec(k2, (n,), dtype) * radius[:, None]
    if grid.grid_type == GridType.CYLINDRICAL2D:
        z = jax.random.uniform(k1, (n,), dtype)
        r_inner = jnp.take(grid.cell_pos_min[:, 0], cellindex)
        r_outer = jnp.take(grid.cell_pos_max[:, 0], cellindex)
        rcyl = jnp.sqrt(z * r_inner**2 + (1.0 - z) * r_outer**2)
        theta = jax.random.uniform(k2, (n,), dtype) * 2.0 * PI
        zmin = jnp.take(grid.cell_pos_min[:, 1], cellindex)
        zmax = jnp.take(grid.cell_pos_max[:, 1], cellindex)
        zpos = zmin + jax.random.uniform(k3, (n,), dtype) * (zmax - zmin)
        return jnp.stack([jnp.cos(theta) * rcyl, jnp.sin(theta) * rcyl, zpos], axis=-1)
    # CARTESIAN3D
    u = jax.random.uniform(k1, (n, 3), dtype)
    pmin = jnp.take(grid.cell_pos_min, cellindex, axis=0)
    pmax = jnp.take(grid.cell_pos_max, cellindex, axis=0)
    return pmin + u * (pmax - pmin)


def _sample_decaytimes(key, pathindex, tables: PelletTables, dtype):
    """Rejection-sample decay times (reference: decay.cc:475-490).

    tdecay = t_model + sum_i Exp(tau_i) accepted within (tdecaymin, tmax).
    """
    n = pathindex.shape[0]
    meanlives = jnp.take(tables.path_meanlife, pathindex, axis=0)  # (n, maxlen)
    # reference: tdecaymin = t_model when INITIAL_PACKETS_ON, else tmin (decay.cc:1364)
    tdecaymin = tables.t_model if tables.initial_packets_on else tables.tmin

    def cond2(carry):
        _, tdecay, accepted, it = carry
        return jnp.logical_and(~jnp.all(accepted), it < 100000)

    def body2(carry):
        k, tdecay, accepted, it = carry
        k, sub = jax.random.split(k)
        u = jax.random.uniform(sub, meanlives.shape, dtype, minval=jnp.finfo(dtype).tiny, maxval=1.0)
        t = tables.t_model + jnp.sum(-meanlives * jnp.log(u), axis=-1)
        ok = (t > tdecaymin) & (t < tables.tmax)
        newly = ok & ~accepted
        return (k, jnp.where(newly, t, tdecay), accepted | ok, it + 1)

    init = (key, jnp.zeros(n, dtype), jnp.zeros(n, bool), jnp.int32(0))
    _, tdecay, accepted, _ = jax.lax.while_loop(cond2, body2, init)
    return tdecay, accepted


def packet_init(key, grid: GridData, tables: PelletTables, opts: Options) -> PacketState:
    """Place all pellets (reference: packet.cc:86-162)."""
    dtype = jnp.float64 if opts.transport_dtype == "float64" else jnp.float32
    npkts = opts.npkts
    st = empty_state(npkts, dtype)

    kcell, kpos, kchan, ktime, kgp, kren = jax.random.split(key, 6)

    # select cells with probability proportional to their decay energy
    target = jax.random.uniform(kcell, (npkts,), dtype)
    cellindex = jnp.searchsorted(tables.en_cumulative_cell, target, side="right").astype(jnp.int32)
    pos = _sample_pos_in_cell(kpos, grid, cellindex, grid.tmin, dtype)

    # select decay channel within the cell (decay.cc:1336-1343)
    nonemptymgi = jnp.take(grid.nonemptymgi_of_cell, cellindex)
    chan_rows = jnp.take(tables.chan_cumulative, nonemptymgi, axis=0)  # (n, nchan)
    ztarget = jax.random.uniform(kchan, (npkts,), dtype)
    chanindex = jax.vmap(lambda row, t: jnp.searchsorted(row, t, side="right"))(
        chan_rows, ztarget
    ).astype(jnp.int32)

    npaths = tables.path_meanlife.shape[0]
    is_initial_energy = chanindex >= npaths
    pathindex = jnp.minimum(chanindex, npaths - 1)

    tdecay, accepted = _sample_decaytimes(ktime, pathindex, tables, dtype)
    # initial-energy channel decays at tmin (decay.cc:1351-1352)
    tdecay = jnp.where(is_initial_energy, tables.tmin, tdecay)

    # packet energies are carried in units of e0 = etot/npkts: raw erg values
    # (1e40+) overflow float32, and only host-side output code needs erg
    e_cmf = jnp.ones(npkts, dtype)

    engamma = jnp.take(tables.end_engamma, pathindex)
    enparticle = jnp.take(tables.end_enparticle, pathindex)
    ug = jax.random.uniform(kgp, (npkts,), dtype)
    frac_gamma = jnp.where(engamma + enparticle > 0, engamma / (engamma + enparticle), 0.0)
    from_particle = (ug >= frac_gamma) & ~is_initial_energy
    # the initial-energy channel pins nu to the pellet energy (erg; host float,
    # clamped so the unused branch never materialises an inf float32 constant)
    nu_init_en = min(tables.e0 / H, 3.0e38) if dtype == jnp.float32 else tables.e0 / H
    nu_cmf = jnp.where(is_initial_energy, nu_init_en, enparticle / H)

    pellet_nucindex = jnp.where(is_initial_energy, -1, jnp.take(tables.end_nucindex, pathindex))
    pellet_decaytype = jnp.where(is_initial_energy, -1, jnp.take(tables.end_decaytype, pathindex))

    # pellet moves with the flow: dir = pos/|pos| (packet.cc:76-79)
    dirvec = geometry.vec_norm(pos)
    prop_time = jnp.full(npkts, grid.tmin, dtype)
    doppler = geometry.doppler_nucmf_on_nurf(
        pos, dirvec, prop_time, opts.use_relativistic_doppler_shift
    )
    e_rf = e_cmf / doppler


    return st.replace(
        ptype=jnp.full(npkts, TYPE_RADIOACTIVE_PELLET, jnp.int32),
        prop_time=prop_time,
        where=cellindex,
        pos=pos,
        dir=dirvec,
        e_cmf=e_cmf,
        e_rf=e_rf,
        nu_cmf=nu_cmf,
        nu_rf=jnp.zeros(npkts, dtype),
        tdecay=tdecay,
        pellet_nucindex=pellet_nucindex.astype(jnp.int32),
        pellet_decaytype=pellet_decaytype.astype(jnp.int32),
        originated_from_particlenotgamma=from_particle,
        trueemissiontype=jnp.full(npkts, EMTYPE_NOTSET, jnp.int32),
    )


# ---------------------------------------------------------------------------
# packet file I/O (reference: packet.cc:164-301)
# ---------------------------------------------------------------------------

_TEXT_HEADER = (
    "#number where type_id posx posy posz dirx diry dirz tdecay e_cmf e_rf nu_cmf nu_rf "
    "escape_type_id escape_time emissiontype trueemissiontype "
    "em_posx em_posy em_posz absorption_type absorption_freq nscatterings em_time stokes1 stokes2 "
    "stokes3 originated_from_positron "
    "true_emission_velocity trueem_time pellet_nucindex"
)


def write_packets_text(filename: str, st: PacketState, e_scale: float = 1.0) -> None:
    """Write the packets*.out text format (reference: packet.cc:165-190)."""
    import numpy as np

    cols = [
        np.asarray(st.number), np.asarray(st.where), np.asarray(st.ptype),
        *np.asarray(st.pos).T, *np.asarray(st.dir).T,
        np.asarray(st.tdecay),
        np.asarray(st.e_cmf, dtype=np.float64) * e_scale,
        np.asarray(st.e_rf, dtype=np.float64) * e_scale,
        np.asarray(st.nu_cmf), np.asarray(st.nu_rf),
        np.asarray(st.escape_type), np.asarray(st.escape_time),
        np.asarray(st.emissiontype), np.asarray(st.trueemissiontype),
        *np.asarray(st.em_pos).T,
        np.asarray(st.absorptiontype), np.asarray(st.absorptionfreq),
        np.asarray(st.nscatterings), np.asarray(st.em_time),
        *np.asarray(st.stokes).T,
        np.asarray(st.originated_from_particlenotgamma).astype(int),
        np.asarray(st.trueemissionvelocity), np.asarray(st.trueem_time),
        np.asarray(st.pellet_nucindex),
    ]
    kinds = "".join(
        "i" if (np.asarray(c).dtype.kind in "ib") else "f" for c in cols
    )
    from .io import packetio

    # native C row formatter (native/packetio.c); Python fallback below
    if packetio.write_text_table(filename, _TEXT_HEADER, cols, kinds):
        return
    with open(filename, "w") as f:
        f.write(_TEXT_HEADER + "\n")
        for row in zip(*cols):
            f.write(" ".join(
                str(int(v)) if isinstance(v, (int,)) or hasattr(v, "dtype") and v.dtype.kind in "ib"
                else f"{float(v):g}"
                for v in row
            ) + "\n")


def read_packets_text(filename: str) -> dict:
    """Read packets*.out (reference: packet.cc:235-301). Returns numpy dict."""
    import numpy as np

    data = np.loadtxt(filename, ndmin=2)
    return dict(
        number=data[:, 0].astype(np.int64), where=data[:, 1].astype(np.int64),
        ptype=data[:, 2].astype(np.int64), pos=data[:, 3:6], dir=data[:, 6:9],
        tdecay=data[:, 9], e_cmf=data[:, 10], e_rf=data[:, 11],
        nu_cmf=data[:, 12], nu_rf=data[:, 13],
        escape_type=data[:, 14].astype(np.int64), escape_time=data[:, 15],
        emissiontype=data[:, 16].astype(np.int64),
        trueemissiontype=data[:, 17].astype(np.int64),
        em_pos=data[:, 18:21], absorptiontype=data[:, 21].astype(np.int64),
        absorptionfreq=data[:, 22], nscatterings=data[:, 23].astype(np.int64),
        em_time=data[:, 24], stokes=data[:, 25:28],
        originated_from_particlenotgamma=data[:, 28].astype(bool),
        trueemissionvelocity=data[:, 29], trueem_time=data[:, 30],
        pellet_nucindex=data[:, 31].astype(np.int64),
    )


def save_packets_npz(filename: str, st: PacketState) -> None:
    """Binary checkpoint of the full packet state (replaces the reference's
    raw-struct dump, packet.cc:192-203)."""
    import numpy as np
    import dataclasses as _dc

    np.savez_compressed(
        filename, **{f.name: np.asarray(getattr(st, f.name)) for f in _dc.fields(st)}
    )


def load_packets_npz(filename: str) -> PacketState:
    import numpy as np
    import dataclasses as _dc

    data = np.load(filename)
    return PacketState(**{f.name: jnp.asarray(data[f.name]) for f in _dc.fields(PacketState)})
