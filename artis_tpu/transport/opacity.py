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
from ..constants import HOVERKB, SAHACONST, KB, SIGMA_T


def calculate_chi_ffheating(chi_ff_nnionpart, nne, t_e, nu):
    """Free-free absorption coefficient [1/cm] (reference: rpkt.cc:768-780).

    chi_ff_nnionpart = 3.69255e-8... precomputed per cell as
    sum_ions charge^2 g_ff nnion * 3.69255e8 / sqrt(T_e) (rpkt.cc:739-754).
    """
    # nu**-3 (1e-45) underflows float32: fold an exact power-of-two rescale
    nu3_scaled = (nu * 2.0**-50) ** 3  # = nu**3 * 2**-150
    return (chi_ff_nnionpart * 2.0**-150) / nu3_scaled * nne * -jnp.expm1(-HOVERKB * nu / t_e)


def chi_ff_nnionpart_cells(dad: DeviceAtomicData, nnion_cells, t_e):
    """(ncells,) ion-charge part of the ff opacity (reference: rpkt.cc:739-754)."""
    charge = (dad.ion_stage - 1).astype(nnion_cells.dtype)
    part = jnp.sum(nnion_cells * (charge * charge)[None, :], axis=1)
    return part * 3.69255e8 / jnp.sqrt(t_e)


def calculate_chi_bf(
    dad: DeviceAtomicData,
    nu: jax.Array,  # (npkts,) cmf frequency
    cellidx: jax.Array,  # (npkts,) nonemptymgi (>=0 where active)
    active: jax.Array,  # (npkts,) bool
    levelpops: jax.Array,  # (ncells, nlevels)
    nnion_cells: jax.Array,  # (ncells, nions)
    nne: jax.Array,  # (ncells,)
    nnetot: jax.Array,  # (ncells,)
    t_e: jax.Array,  # (ncells,)
    chunk: int = 512,
):
    """Total bound-free opacity chi_bf (npkts,) (reference: rpkt.cc:783-898).

    Returns (chi_bf, scanner) where scanner(target) -> selected continuum index
    for bf-event sampling via a second pass (reference: rpkt.cc:468-474).
    """
    ncont = dad.nbfcontinua
    if ncont == 0:
        return jnp.zeros_like(nu), None

    nchunks = -(-ncont // chunk)
    pad = nchunks * chunk - ncont

    def padk(x, fill=0):
        return jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)]) if pad else x

    cont_nu_edge = padk(dad.cont_nu_edge, jnp.inf)
    cont_lower = padk(dad.cont_uniquelower)
    cont_upper = padk(dad.cont_uniqueupper)
    cont_prob = padk(dad.cont_probability)
    cont_row = padk(dad.cont_phixsrow)
    cont_ion = padk(dad.cont_ion)
    g_l = dad.level_g[cont_lower]
    g_u = dad.level_g[cont_upper]

    t_e_p = t_e[cellidx]
    nne_p = nne[cellidx]
    nnetot_p = nnetot[cellidx]

    def chunk_contrib(c):
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, c * chunk, chunk)
        nu_edge = sl(cont_nu_edge)[None, :]  # (1, chunk)
        in_window = (nu[:, None] >= nu_edge) & (
            nu_edge * dad.last_phixs_nuovernuedge >= nu[:, None]
        ) & active[:, None]
        ionidx = sl(cont_ion)
        nnion_p = nnion_cells[cellidx[:, None], ionidx[None, :]]
        # keep continua of abundant ions or ground levels (rpkt.h:128-134)
        is_ground = sl(cont_lower) == dad.ion_level_start[ionidx]
        keep = (nnion_p / jnp.maximum(nnetot_p[:, None], 1e-300) > 1e-6) | is_ground[None, :]
        nnlevel = levelpops[cellidx[:, None], sl(cont_lower)[None, :]]
        sigma_bf = photoionization_crosssection(
            dad, sl(cont_row)[None, :], nu_edge, jnp.maximum(nu[:, None], 1e-30)
        )
        # stimulated recombination correction (rpkt.cc:855-872)
        nnupper = levelpops[cellidx[:, None], sl(cont_upper)[None, :]]
        sf = (
            SAHACONST
            * (sl(g_l) / sl(g_u))[None, :]
            * t_e_p[:, None] ** -1.5
            * jnp.exp(jnp.minimum(HOVERKB * nu_edge / t_e_p[:, None], 700.0))
        )
        departure = nnupper / jnp.maximum(nnlevel, 1e-300) * nne_p[:, None] * sf
        stimfactor = departure * jnp.exp(-HOVERKB * nu[:, None] / t_e_p[:, None])
        corrfactor = jnp.maximum(0.0, 1.0 - stimfactor)
        sigma_contr = sigma_bf * sl(cont_prob)[None, :] * corrfactor
        return jnp.where(in_window & keep & (nnlevel > 0), nnlevel * sigma_contr, 0.0)

    def body(carry, c):
        contrib = chunk_contrib(c)
        return carry + jnp.sum(contrib, axis=1), None

    chi_bf, _ = jax.lax.scan(body, jnp.zeros_like(nu), jnp.arange(nchunks))

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

    return chi_bf, select_continuum


def calculate_chi_rpkt_cont(
    dad: DeviceAtomicData,
    nu_cmf,
    cellidx,
    active,
    levelpops,
    nnion_cells,
    chi_ff_nnionpart,
    nne,
    nnetot,
    t_e,
    opacity_case: int,
    chunk: int = 512,
):
    """es + ff + bf continuum opacities (reference: rpkt.cc:972-1032).

    Returns (chi_escat, chi_ff, chi_bf, select_continuum_fn), all (npkts,) cmf.
    """
    nne_p = nne[cellidx]
    chi_ff = calculate_chi_ffheating(chi_ff_nnionpart[cellidx], nne_p, t_e[cellidx], jnp.maximum(nu_cmf, 1e-30))
    if opacity_case >= 4:
        chi_escat = SIGMA_T * nne_p
        chi_bf, select_continuum = calculate_chi_bf(
            dad, nu_cmf, cellidx, active, levelpops, nnion_cells, nne, nnetot, t_e, chunk
        )
    else:
        chi_escat = jnp.zeros_like(chi_ff)
        chi_bf = jnp.zeros_like(chi_ff)
        select_continuum = None
    return chi_escat, chi_ff, chi_bf, select_continuum
