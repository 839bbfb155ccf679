"""Device-resident atomic data: the arrays the transport/plasma kernels gather.

Derived once from io.atomicdata.AtomicData (host) into a pytree of jnp arrays.
Precomputes the per-line Einstein B coefficients so the Sobolev opacity in the
hot loop is two gathers and a fused multiply (reference: atomic.h:195-229
get_tau_sobolev[_subupdown]).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .constants import CLIGHTSQUAREDOVERTWOH, H
from .io.atomicdata import AtomicData


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "elem_z", "elem_nions", "elem_ion_start", "elem_meanweight_init",
        "ion_element", "ion_stage", "ion_nlevels", "ion_level_start",
        "ion_ionpot", "ion_ionpot_eff", "ion_nionisinglevels", "ion_g0", "ion_eps0",
        "ion_groundcontindex", "ion_nlevels_groundterm",
        "level_energy", "level_g", "level_ion", "level_e_aboveground",
        "level_ndowntrans", "level_nuptrans", "level_alltrans_start",
        "trans_lineindex", "trans_target", "trans_A", "trans_coll_str",
        "trans_osc_strength", "trans_forbidden", "trans_owner", "trans_is_down",
        "line_nu", "line_element", "line_ion", "line_lowerunique",
        "line_upperunique", "line_blu", "line_bul",
        "cont_nu_edge", "cont_element", "cont_ion", "cont_uniquelower",
        "cont_uniqueupper", "cont_probability", "cont_phixsrow",
        "cont_groundindex", "cont_uniqueion", "cont_level", "cont_upperlevel",
        "groundcont_nu_edge", "groundcont_uniqueion", "groundcont_contindex",
        "allphixs",
    ],
    meta_fields=[
        "nelements", "nions_total", "nlevels_total", "ntrans_total", "nlines", "nbfcontinua",
        "nbfcontinua_ground", "nphixspoints", "nphixsnuincrement",
        "last_phixs_nuovernuedge", "max_nions",
    ],
)
@dataclasses.dataclass(frozen=True)
class DeviceAtomicData:
    # elements
    elem_z: jax.Array
    elem_nions: jax.Array
    elem_ion_start: jax.Array
    elem_meanweight_init: jax.Array
    # ions (flat)
    ion_element: jax.Array
    ion_stage: jax.Array
    ion_nlevels: jax.Array
    ion_level_start: jax.Array
    ion_ionpot: jax.Array
    ion_ionpot_eff: jax.Array  # eps(ion+1, 0) - eps(ion, 0); 0 for top ions
    ion_nionisinglevels: jax.Array
    ion_g0: jax.Array
    ion_eps0: jax.Array
    ion_groundcontindex: jax.Array
    ion_nlevels_groundterm: jax.Array
    # levels (flat)
    level_energy: jax.Array
    level_g: jax.Array
    level_ion: jax.Array  # uniqueionindex of each level
    level_e_aboveground: jax.Array  # eps(level) - eps(ion ground)
    level_ndowntrans: jax.Array
    level_nuptrans: jax.Array
    level_alltrans_start: jax.Array
    # transitions (flat [down|up] blocks)
    trans_lineindex: jax.Array
    trans_target: jax.Array
    trans_A: jax.Array
    trans_coll_str: jax.Array
    trans_osc_strength: jax.Array
    trans_forbidden: jax.Array
    trans_owner: jax.Array  # global level index owning the [down|up] block
    trans_is_down: jax.Array  # True for down-block entries
    # linelist (nu descending)
    line_nu: jax.Array
    line_element: jax.Array
    line_ion: jax.Array  # uniqueionindex
    line_lowerunique: jax.Array  # global level index
    line_upperunique: jax.Array
    line_blu: jax.Array  # B_lu = g_u/g_l * B_ul
    line_bul: jax.Array  # B_ul = c^2/(2 h nu^3) A_ul
    # bf continua (nu_edge ascending)
    cont_nu_edge: jax.Array
    cont_element: jax.Array
    cont_ion: jax.Array  # uniqueionindex of LOWER ion
    cont_uniquelower: jax.Array  # global level index of lower level
    cont_uniqueupper: jax.Array  # global level index of upper-ion target level
    cont_probability: jax.Array
    cont_phixsrow: jax.Array
    cont_groundindex: jax.Array
    cont_uniqueion: jax.Array  # same as cont_ion (alias kept for clarity)
    cont_level: jax.Array  # within-ion lower level
    cont_upperlevel: jax.Array  # within-ion upper level
    # ground continua (nu_edge ascending)
    groundcont_nu_edge: jax.Array
    groundcont_uniqueion: jax.Array
    groundcont_contindex: jax.Array  # (ngroundcont,) index into the allcont arrays
    # phixs cross sections (nbftables, nphixspoints), float32
    allphixs: jax.Array

    # static metadata
    nelements: int
    nions_total: int
    nlevels_total: int
    ntrans_total: int
    nlines: int
    nbfcontinua: int
    nbfcontinua_ground: int
    nphixspoints: int
    nphixsnuincrement: float
    last_phixs_nuovernuedge: float
    max_nions: int


def _groundcont_to_cont(ad) -> "np.ndarray":
    """(nbfcontinua_ground,) allcont index of each ground continuum: the
    ground-level first-target continuum carrying that groundphixslist index
    (reference: globals.h groundcont / elements.groundcontindex)."""
    ngc = ad.nbfcontinua_ground
    out = np.full(max(ngc, 1), -1, np.int32)
    gidx = np.asarray(ad.cont_index_in_groundphixslist)
    for ci in range(ad.nbfcontinua):
        g = int(gidx[ci])
        if 0 <= g < ngc and out[g] < 0:
            out[g] = ci
    return np.maximum(out, 0)


def to_device(ad: AtomicData) -> DeviceAtomicData:
    """Build the device pytree from host-parsed AtomicData."""
    ion_level_start = ad.ion_level_start.astype(np.int64)
    level_ion = np.repeat(np.arange(ad.nions_total), ad.ion_nlevels).astype(np.int32)

    ion_eps0 = ad.level_energy[ion_level_start] if ad.nlevels_total else np.zeros(0)
    ion_g0 = ad.level_g[ion_level_start] if ad.nlevels_total else np.zeros(0)
    level_e_aboveground = ad.level_energy - ion_eps0[level_ion]

    # effective ionpot between adjacent ions of the same element
    ion_ionpot_eff = np.zeros(ad.nions_total)
    for uii in range(ad.nions_total - 1):
        if ad.ion_element[uii] == ad.ion_element[uii + 1]:
            ion_ionpot_eff[uii] = ion_eps0[uii + 1] - ion_eps0[uii]

    line_uii = ad.elem_ion_start[ad.line_element] + ad.line_ion
    line_lowerunique = ion_level_start[line_uii] + ad.line_lower
    line_upperunique = ion_level_start[line_uii] + ad.line_upper
    g_u = ad.level_g[line_upperunique]
    g_l = ad.level_g[line_lowerunique]
    line_bul = CLIGHTSQUAREDOVERTWOH / ad.line_nu**3 * ad.line_A
    line_blu = g_u / g_l * line_bul

    cont_uii = (ad.elem_ion_start[ad.cont_element] + ad.cont_ion).astype(np.int64)
    cont_uniquelower = ion_level_start[cont_uii] + ad.cont_level
    cont_uniqueupper = ion_level_start[np.minimum(cont_uii + 1, ad.nions_total - 1)] + ad.cont_upperlevel

    groundcont_uii = (
        ad.elem_ion_start[ad.groundcont_element] + ad.groundcont_ion
    ).astype(np.int32)

    # owner level and down/up flag for each alltrans entry
    trans_owner = np.zeros(ad.ntrans_total, dtype=np.int64)
    trans_is_down = np.zeros(ad.ntrans_total, dtype=bool)
    for gl in range(ad.nlevels_total):
        s0 = int(ad.level_alltrans_start[gl])
        nd = int(ad.level_ndowntrans[gl])
        nu_ = int(ad.level_nuptrans[gl])
        trans_owner[s0 : s0 + nd + nu_] = gl
        trans_is_down[s0 : s0 + nd] = True

    # A dataset with no photoionisation tables (bound-bound-only physics,
    # e.g. a two-level test atom) leaves every (ncont,) table zero-length;
    # clipped gathers (jnp.clip(idx, 0, max(ncont-1, 0))) still read index 0,
    # so pad each to one benign row: nu_edge above any rpkt window makes the
    # padded continuum contribute zero opacity, and nbfcontinua stays 0 so
    # all logical loops/windows skip it.
    def _pad1(x, fill):
        x = np.asarray(x)
        if x.shape[0]:
            return x
        return np.full((1,) + x.shape[1:], fill, dtype=x.dtype)

    if ad.nbfcontinua == 0:
        ad.cont_nu_edge = _pad1(ad.cont_nu_edge, 1e30)
        ad.cont_element = _pad1(ad.cont_element, 0)
        cont_uii = _pad1(cont_uii, 0)
        cont_uniquelower = _pad1(cont_uniquelower, 0)
        cont_uniqueupper = _pad1(cont_uniqueupper, 0)
        ad.cont_probability = _pad1(ad.cont_probability, 1.0)
        ad.cont_phixsrow = _pad1(ad.cont_phixsrow, 0)
        ad.cont_index_in_groundphixslist = _pad1(
            ad.cont_index_in_groundphixslist, 0)
        ad.cont_level = _pad1(ad.cont_level, 0)
        ad.cont_upperlevel = _pad1(ad.cont_upperlevel, 0)
    if ad.nbfcontinua_ground == 0:
        ad.groundcont_nu_edge = _pad1(ad.groundcont_nu_edge, 1e30)
        groundcont_uii = _pad1(groundcont_uii, 0)
    if np.asarray(ad.allphixs).shape[0] == 0:
        ad.allphixs = np.zeros((1, ad.nphixspoints), dtype=np.float64)

    return DeviceAtomicData(
        elem_z=jnp.asarray(ad.elem_z),
        elem_nions=jnp.asarray(ad.elem_nions),
        elem_ion_start=jnp.asarray(ad.elem_ion_start),
        elem_meanweight_init=jnp.asarray(ad.elem_meanweight_init),
        ion_element=jnp.asarray(ad.ion_element),
        ion_stage=jnp.asarray(ad.ion_stage),
        ion_nlevels=jnp.asarray(ad.ion_nlevels),
        ion_level_start=jnp.asarray(ion_level_start),
        ion_ionpot=jnp.asarray(ad.ion_ionpot),
        ion_ionpot_eff=jnp.asarray(ion_ionpot_eff),
        ion_nionisinglevels=jnp.asarray(ad.ion_nionisinglevels),
        ion_g0=jnp.asarray(ion_g0),
        ion_eps0=jnp.asarray(ion_eps0),
        ion_groundcontindex=jnp.asarray(ad.ion_groundcontindex),
        ion_nlevels_groundterm=jnp.asarray(ad.ion_nlevels_groundterm),
        level_energy=jnp.asarray(ad.level_energy),
        level_g=jnp.asarray(ad.level_g),
        level_ion=jnp.asarray(level_ion),
        level_e_aboveground=jnp.asarray(level_e_aboveground),
        level_ndowntrans=jnp.asarray(ad.level_ndowntrans),
        level_nuptrans=jnp.asarray(ad.level_nuptrans),
        level_alltrans_start=jnp.asarray(ad.level_alltrans_start),
        trans_lineindex=jnp.asarray(ad.trans_lineindex),
        trans_target=jnp.asarray(ad.trans_target),
        trans_A=jnp.asarray(ad.trans_A),
        trans_coll_str=jnp.asarray(ad.trans_coll_str),
        trans_osc_strength=jnp.asarray(ad.trans_osc_strength),
        trans_forbidden=jnp.asarray(ad.trans_forbidden),
        trans_owner=jnp.asarray(trans_owner),
        trans_is_down=jnp.asarray(trans_is_down),
        line_nu=jnp.asarray(ad.line_nu),
        line_element=jnp.asarray(ad.line_element),
        line_ion=jnp.asarray(line_uii.astype(np.int32)),
        line_lowerunique=jnp.asarray(line_lowerunique.astype(np.int64)),
        line_upperunique=jnp.asarray(line_upperunique.astype(np.int64)),
        line_blu=jnp.asarray(line_blu),
        line_bul=jnp.asarray(line_bul),
        cont_nu_edge=jnp.asarray(ad.cont_nu_edge),
        cont_element=jnp.asarray(ad.cont_element),
        cont_ion=jnp.asarray(cont_uii.astype(np.int32)),
        cont_uniquelower=jnp.asarray(cont_uniquelower.astype(np.int64)),
        cont_uniqueupper=jnp.asarray(cont_uniqueupper.astype(np.int64)),
        cont_probability=jnp.asarray(ad.cont_probability),
        cont_phixsrow=jnp.asarray(ad.cont_phixsrow),
        cont_groundindex=jnp.asarray(ad.cont_index_in_groundphixslist),
        cont_uniqueion=jnp.asarray(cont_uii.astype(np.int32)),
        cont_level=jnp.asarray(ad.cont_level),
        cont_upperlevel=jnp.asarray(ad.cont_upperlevel),
        groundcont_nu_edge=jnp.asarray(ad.groundcont_nu_edge),
        groundcont_uniqueion=jnp.asarray(groundcont_uii),
        groundcont_contindex=jnp.asarray(_groundcont_to_cont(ad)),
        allphixs=jnp.asarray(ad.allphixs, dtype=jnp.float32),
        nelements=ad.nelements,
        nions_total=ad.nions_total,
        nlevels_total=ad.nlevels_total,
        ntrans_total=ad.ntrans_total,
        nlines=ad.nlines,
        nbfcontinua=ad.nbfcontinua,
        nbfcontinua_ground=ad.nbfcontinua_ground,
        nphixspoints=ad.nphixspoints,
        nphixsnuincrement=float(ad.nphixsnuincrement),
        last_phixs_nuovernuedge=float(ad.last_phixs_nuovernuedge),
        max_nions=ad.max_nions,
    )


def photoionization_crosssection(dad: DeviceAtomicData, phixsrow, nu_edge, nu):
    """Interpolate sigma_bf from the table rows, batched
    (reference: atomic.h:147-193)."""
    npts = dad.nphixspoints
    dnu = dad.nphixsnuincrement
    ireal = (nu / nu_edge - 1.0) / dnu
    i = jnp.floor(ireal).astype(jnp.int32)
    i_safe = jnp.clip(i, 0, npts - 2)
    row = jnp.clip(phixsrow, 0, dad.allphixs.shape[0] - 1) if dad.allphixs.shape[0] else phixsrow
    sig_a = dad.allphixs[row, i_safe].astype(nu.dtype)
    sig_b = dad.allphixs[row, i_safe + 1].astype(nu.dtype)
    factor_b = ireal - i_safe
    interp = (1.0 - factor_b) * sig_a + factor_b * sig_b
    # above table: Kramers nu^-3 extrapolation anchored at the last point
    nu_max_phixs = nu_edge * dad.last_phixs_nuovernuedge
    kramers = dad.allphixs[row, npts - 1].astype(nu.dtype) * (nu_max_phixs / nu) ** 3
    return jnp.where(i < 0, 0.0, jnp.where(i < npts - 1, interp, kramers))
