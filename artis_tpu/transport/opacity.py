"""r-packet continuum opacity, batched over the packet axis.

TPU-native rebuild of the reference continuum opacity path (reference:
rpkt.cc:739-780 free-free, rpkt.cc:783-898 bound-free with stimulated
recombination correction, rpkt.cc:972-1032 calculate_chi_rpkt_cont).

The reference evaluates a per-packet loop over the nu_edge-sorted continuum
list with a binary-searched window; here the continuum axis is processed in
fixed-size chunks under lax.scan so the (npkts x nbfcontinua) work is
vectorised without materialising the full matrix.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..atomic import DeviceAtomicData, photoionization_crosssection
from ..devutil import exp_clipped
from ..constants import HOVERKB, SAHACONST, KB, SIGMA_T


def calculate_chi_ffheating(chi_ff_nnionpart, nne, t_e, nu):
    """Free-free absorption coefficient [1/cm] (reference: rpkt.cc:768-780).

    chi_ff_nnionpart = 3.69255e-8... precomputed per cell as
    sum_ions charge^2 g_ff nnion * 3.69255e8 / sqrt(T_e) (rpkt.cc:739-754).
    """
    # nu**-3 (1e-45) underflows float32: fold an exact power-of-two rescale.
    # The 2**-150 factor is applied as two float32-representable halves (the
    # single literal would itself underflow to zero in float32)
    nu3_scaled = (nu * 2.0**-50) ** 3  # = nu**3 * 2**-150
    return (chi_ff_nnionpart * 2.0**-75) * (nne * 2.0**-75) / nu3_scaled \
        * -jnp.expm1(-HOVERKB * nu / t_e)


def chi_ff_nnionpart_cells(dad: DeviceAtomicData, nnion_cells, t_e):
    """(ncells,) ion-charge part of the ff opacity (reference: rpkt.cc:739-754)."""
    charge = (dad.ion_stage - 1).astype(nnion_cells.dtype)
    part = jnp.sum(nnion_cells * (charge * charge)[None, :], axis=1)
    return part * 3.69255e8 / jnp.sqrt(t_e)


def build_bf_tables(
    dad: DeviceAtomicData,
    levelpops: jax.Array,  # (ncells, nlevels)
    nnion_cells: jax.Array,  # (ncells, nions)
    nne: jax.Array,  # (ncells,)
    nnetot: jax.Array,  # (ncells,)
    t_e: jax.Array,  # (ncells,)
):
    """Per-timestep (ncells, nbfcontinua) bound-free factor tables.

    A[cell, cont] = nnlevel * prob, masked by the keep rule (rpkt.h:128-134);
    LD[cell, cont] = LOG of the stimulated-recombination departure
    coefficient (rpkt.cc:855-872 without the packet-frequency exponential).
    The log form is mandatory for float32 pipelines: the raw departure
    carries exp(+h nu_edge / k T_e) and overflows float32 (observed 1e74 on
    nebular-scale data), which would silently zero the stimulated correction;
    consumers apply it as corr = 1 - exp(LD - h nu / k T_e), whose argument
    is O(h (nu_edge - nu) / k T_e) and always representable.
    Precomputing these turns the per-packet chi_bf chunk pass from ~8 gathers
    into 2 row-gathers + the cross-section interpolation.
    """
    ncont = dad.nbfcontinua
    if ncont == 0:
        z = jnp.zeros((t_e.shape[0], 0), t_e.dtype)
        return z, z
    nnlevel = levelpops[:, dad.cont_uniquelower]  # (ncells, ncont)
    nnupper = levelpops[:, dad.cont_uniqueupper]
    nnion_p = nnion_cells[:, dad.cont_ion]
    is_ground = dad.cont_uniquelower == dad.ion_level_start[dad.cont_ion]
    keep = (nnion_p / jnp.maximum(nnetot[:, None], 1e-300) > 1e-6) | is_ground[None, :]
    g_l = dad.level_g[dad.cont_uniquelower]
    g_u = dad.level_g[dad.cont_uniqueupper]
    # log-departure as a sum of logs: every term is moderate even where the
    # raw product overflows
    ldep = (
        jnp.log(jnp.maximum(nnupper, 1e-300))
        - jnp.log(jnp.maximum(nnlevel, 1e-300))
        + jnp.log(jnp.maximum(nne, 1e-300))[:, None]
        + jnp.log(SAHACONST)
        + jnp.log((g_l / g_u)[None, :])
        - 1.5 * jnp.log(t_e)[:, None]
        + HOVERKB * dad.cont_nu_edge[None, :] / t_e[:, None]
    )
    bf_ldep = jnp.where(nnupper > 0, ldep, -1e30)
    a_tab = jnp.where(
        keep & (nnlevel > 0), nnlevel * dad.cont_probability[None, :], 0.0
    )
    return a_tab, bf_ldep


def calculate_chi_bf(
    dad: DeviceAtomicData,
    nu: jax.Array,  # (npkts,) cmf frequency
    cellidx: jax.Array,  # (npkts,) nonemptymgi (>=0 where active)
    active: jax.Array,  # (npkts,) bool
    bf_a: jax.Array,  # (ncells, ncont) from build_bf_tables
    bf_dep: jax.Array,  # (ncells, ncont)
    t_e: jax.Array,  # (ncells,)
    chunk: int = 512,
    want_gamma_contr: bool = False,
):
    """Total bound-free opacity chi_bf (npkts,) (reference: rpkt.cc:783-898).

    Returns (chi_bf, scanner) where scanner(target) -> selected continuum index
    for bf-event sampling via a second pass (reference: rpkt.cc:468-474).
    """
    ncont = dad.nbfcontinua
    if ncont == 0:
        if want_gamma_contr:
            return jnp.zeros_like(nu), None, jnp.zeros((nu.shape[0], 1), nu.dtype)
        return jnp.zeros_like(nu), None

    chunk = min(chunk, ncont)  # never pad a short continuum list up to chunk
    nchunks = -(-ncont // chunk)
    pad = nchunks * chunk - ncont

    def padk(x, fill=0):
        return jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)]) if pad else x

    def padc(x, fill=0.0):
        if pad:
            return jnp.concatenate(
                [x, jnp.full((x.shape[0], pad), fill, x.dtype)], axis=1
            )
        return x

    cont_nu_edge = padk(dad.cont_nu_edge, jnp.inf)
    cont_row = padk(dad.cont_phixsrow)
    bf_a = padc(bf_a)
    bf_dep = padc(bf_dep)

    t_e_p = t_e[cellidx]
    hnu_kt = HOVERKB * nu / t_e_p  # (npkts,)

    def chunk_contrib(c):
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, c * chunk, chunk)
        slc = lambda x: jax.lax.dynamic_slice_in_dim(x, c * chunk, chunk, axis=1)
        nu_edge = sl(cont_nu_edge)[None, :]  # (1, chunk)
        in_window = (nu[:, None] >= nu_edge) & (
            nu_edge * dad.last_phixs_nuovernuedge >= nu[:, None]
        ) & active[:, None]
        a_g = slc(bf_a)[cellidx]  # (npkts, chunk) row gather
        dep_g = slc(bf_dep)[cellidx]
        sigma_bf = photoionization_crosssection(
            dad, sl(cont_row)[None, :], nu_edge, jnp.maximum(nu[:, None], 1e-30)
        )
        corrfactor = jnp.maximum(
            0.0, 1.0 - jnp.exp(jnp.clip(dep_g - hnu_kt[:, None], -80.0, 80.0)))
        return jnp.where(in_window, a_g * sigma_bf * corrfactor, 0.0)

    def body(carry, c):
        contrib = chunk_contrib(c)
        return carry + jnp.sum(contrib, axis=1), None

    chi_bf, _ = jax.lax.scan(body, jnp.zeros_like(nu), jnp.arange(nchunks))

    gamma_contr = None
    if want_gamma_contr:
        # per-packet per-GROUND-continuum sigma*prob*corrfactor (no level pop)
        # used by the LUT photoionisation/bfheating estimators
        # (reference: rpkt.cc:870-880 groundcont_gamma_contr)
        ngc = max(dad.nbfcontinua_ground, 1)
        cont_prob = padk(dad.cont_probability)
        cont_gidx = padk(dad.cont_groundindex, -1)

        def gbody(carry, c):
            sl = lambda x: jax.lax.dynamic_slice_in_dim(x, c * chunk, chunk)
            slc = lambda x: jax.lax.dynamic_slice_in_dim(x, c * chunk, chunk, axis=1)
            nu_edge = sl(cont_nu_edge)[None, :]
            in_window = (nu[:, None] >= nu_edge) & (
                nu_edge * dad.last_phixs_nuovernuedge >= nu[:, None]
            ) & active[:, None]
            dep_g = slc(bf_dep)[cellidx]
            sigma_bf = photoionization_crosssection(
                dad, sl(cont_row)[None, :], nu_edge, jnp.maximum(nu[:, None], 1e-30)
            )
            corrfactor = jnp.maximum(
            0.0, 1.0 - jnp.exp(jnp.clip(dep_g - hnu_kt[:, None], -80.0, 80.0)))
            contr = jnp.where(in_window, sigma_bf * sl(cont_prob)[None, :] * corrfactor, 0.0)
            gidx = sl(cont_gidx)
            gidx_s = jnp.where(gidx >= 0, gidx, ngc)  # invalid -> dropped
            return carry.at[:, gidx_s].add(contr, mode="drop"), None

        # carry derived from the varying input so shard_map's varying-axis
        # tracking stays consistent
        gc0 = jnp.zeros_like(nu)[:, None] + jnp.zeros((ngc,), nu.dtype)
        gamma_contr, _ = jax.lax.scan(gbody, gc0, jnp.arange(nchunks))

    def select_continuum(key):
        """Sample the absorbing continuum: first i with cumulative > target
        (reference: rpkt.cc:469-474). Second pass, same chunking."""
        target = jax.random.uniform(key, nu.shape, nu.dtype) * chi_bf

        def body2(carry, c):
            cum, chosen = carry
            contrib = chunk_contrib(c)
            cumchunk = jnp.cumsum(contrib, axis=1) + cum[:, None]
            hit = (cumchunk > target[:, None]) & (chosen[:, None] < 0)
            # first hit within chunk
            anyhit = jnp.any(hit, axis=1)
            first = (jnp.argmax(hit, axis=1) + c * chunk).astype(jnp.int32)
            chosen = jnp.where((chosen < 0) & anyhit, first, chosen)
            return (cumchunk[:, -1], chosen), None

        (_, chosen), _ = jax.lax.scan(
            body2,
            (jnp.zeros_like(nu), jnp.zeros_like(nu, dtype=jnp.int32) - 1),
            jnp.arange(nchunks),
        )
        return jnp.clip(chosen, 0, ncont - 1)

    if want_gamma_contr:
        return chi_bf, select_continuum, gamma_contr
    return chi_bf, select_continuum


def calculate_chi_rpkt_cont(
    dad: DeviceAtomicData,
    nu_cmf,
    cellidx,
    active,
    bf_a,
    bf_dep,
    chi_ff_nnionpart,
    nne,
    t_e,
    opacity_case: int,
    chunk: int = 512,
    want_gamma_contr: bool = False,
):
    """es + ff + bf continuum opacities (reference: rpkt.cc:972-1032).

    Returns (chi_escat, chi_ff, chi_bf, select_continuum_fn[, gamma_contr]).
    bf_a/bf_dep are the per-timestep tables from build_bf_tables.
    """
    nne_p = nne[cellidx]
    chi_ff = calculate_chi_ffheating(chi_ff_nnionpart[cellidx], nne_p, t_e[cellidx], jnp.maximum(nu_cmf, 1e-30))
    gamma_contr = None
    if opacity_case >= 4:
        chi_escat = SIGMA_T * nne_p
        out = calculate_chi_bf(
            dad, nu_cmf, cellidx, active, bf_a, bf_dep, t_e, chunk,
            want_gamma_contr=want_gamma_contr,
        )
        if want_gamma_contr:
            chi_bf, select_continuum, gamma_contr = out
        else:
            chi_bf, select_continuum = out
    else:
        chi_escat = jnp.zeros_like(chi_ff)
        chi_bf = jnp.zeros_like(chi_ff)
        select_continuum = None
        if want_gamma_contr:
            gamma_contr = jnp.zeros((nu_cmf.shape[0], max(dad.nbfcontinua_ground, 1)), nu_cmf.dtype)
    if want_gamma_contr:
        return chi_escat, chi_ff, chi_bf, select_continuum, gamma_contr
    return chi_escat, chi_ff, chi_bf, select_continuum


def accumulate_bf_estimators(
    dad: DeviceAtomicData,
    nu: jax.Array,  # (npkts,) cmf frequency at the segment start
    cellidx: jax.Array,  # (npkts,) nonemptymgi (>=0 where active)
    active: jax.Array,  # (npkts,) bool
    bf_dep: jax.Array,  # (ncells, ncont)
    t_e: jax.Array,  # (ncells,)
    weight: jax.Array,  # (npkts,) distance*e_cmf/nu_cmf*doppler per segment
    bfrate: jax.Array,  # (ncells, ncont) accumulator
    chunk: int = 512,
):
    """Detailed per-continuum photoionisation-rate estimators: scatter
    sigma_contr (sigma_bf * probability * stimulated-correction) weighted by
    the path-segment factor into (cell, continuum) bins
    (reference: radfield.cc:204-233 update_bfestimators; every continuum has
    an estimator because LEVEL_HAS_BFEST is true for all levels in the NLTE
    presets, input.cc:788-797)."""
    ncont = dad.nbfcontinua
    if ncont == 0:
        return bfrate
    chunk = min(chunk, ncont)
    nchunks = -(-ncont // chunk)
    pad = nchunks * chunk - ncont

    def padk(x, fill=0):
        return jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)]) if pad else x

    def padc(x, fill=0.0):
        if pad:
            return jnp.concatenate(
                [x, jnp.full((x.shape[0], pad), fill, x.dtype)], axis=1
            )
        return x

    cont_nu_edge = padk(dad.cont_nu_edge, jnp.inf)
    cont_row = padk(dad.cont_phixsrow)
    cont_prob = padk(dad.cont_probability)
    bf_dep_p = padc(bf_dep)
    t_e_p = t_e[cellidx]
    hnu_kt = HOVERKB * nu / t_e_p
    ncells = bfrate.shape[0]
    safe_cell = jnp.where(active, cellidx, ncells)  # dropped when inactive

    def body(carry, c):
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, c * chunk, chunk)
        slc = lambda x: jax.lax.dynamic_slice_in_dim(x, c * chunk, chunk, axis=1)
        nu_edge = sl(cont_nu_edge)[None, :]
        in_window = (nu[:, None] >= nu_edge) & (
            nu_edge * dad.last_phixs_nuovernuedge >= nu[:, None]
        ) & active[:, None]
        dep_g = slc(bf_dep_p)[cellidx]
        sigma_bf = photoionization_crosssection(
            dad, sl(cont_row)[None, :], nu_edge, jnp.maximum(nu[:, None], 1e-30)
        )
        corrfactor = jnp.maximum(
            0.0, 1.0 - jnp.exp(jnp.clip(dep_g - hnu_kt[:, None], -80.0, 80.0)))
        contr = jnp.where(
            in_window, sigma_bf * sl(cont_prob)[None, :] * corrfactor, 0.0
        ) * weight[:, None]
        cols = c * chunk + jnp.arange(chunk)
        return carry.at[safe_cell[:, None], cols[None, :]].add(
            contr, mode="drop"
        ), None

    bfrate, _ = jax.lax.scan(body, bfrate, jnp.arange(nchunks))
    return bfrate
