"""NLTE level-population solver: per-element statistical equilibrium.

TPU-native rebuild of the reference NLTE solver (reference:
nltepop.cc:750-1058 solve_nlte_pops_element, 383-464 bound-bound matrix,
466-523 ionisation/recombination matrix, 555-589 LTE-population column
normalisation, 623-746 LU solve with refinement and negative-pop fallback,
892-916 normalisation row and forced-Saha ion constraints).

Design: the reference assembles and LU-solves one (dim x dim) GSL matrix per
cell per element, serially. Here each element's rate matrix is assembled for
ALL cells at once by vectorised gathers over the element's transition and
continuum index lists (precomputed on the host), and the solve is one batched
LU factorisation over the cell axis with iterative refinement (keeping the
best-residual iterate, nltepop.cc:623-746).

Superlevels (reference: input.cc:1418-1460 setup_nlte_levels,
nltepop.cc:850-870 s_renorm, 1061-1072 superlevel_boltzmann): levels above
the per-ion NLTE cap collapse into one matrix column per ion whose internal
distribution is Boltzmann at T_exc; rates out of member levels are weighted
by their Boltzmann share, and the column's normalisation factor is the sum
of the members' Boltzmann populations (nltepop.cc:568-577).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..atomic import DeviceAtomicData
from ..constants import H, HCLIGHTOVERFOURPI, KB, CLIGHTSQUARED
from ..options import Options
from .ltepop import calculate_partfuncts, log_phi_saha, calculate_ionfractions_log, _ion_index_grid, find_uppermost_ion
from .radfield import dbb
from .ratecoeff import RateCoeffTables, interpolate_lut
from .transitionrates import (
    beta_sobolev, col_deexcitation_ratecoeff, col_excitation_ratecoeff,
    col_ionization_ratecoeff, col_recombination_ratecoeff,
)


@dataclasses.dataclass(frozen=True)
class ElementNlteIndex:
    """Host-side static index lists for one element's rate matrix."""

    element: int
    lstart: int  # first global level index
    dim: int  # number of levels of this element
    # transitions of this element (down entries only; each line appears once)
    trans_upper_local: np.ndarray
    trans_lower_local: np.ndarray
    trans_A: np.ndarray
    trans_coll_str: np.ndarray
    trans_forbidden: np.ndarray
    trans_osc_strength: np.ndarray
    trans_lineidx: np.ndarray  # global lineindex of each down entry
    # continua of this element
    cont_idx: np.ndarray  # indices into the global continuum arrays
    cont_lower_local: np.ndarray
    cont_upper_local: np.ndarray
    # per-ion info
    ion_local_start: np.ndarray  # local level index of each ion's ground state
    ion_nlevels: np.ndarray
    nions: int
    first_global_ion: int = 0  # global ion index of this element's first ion
    # superlevel compression (input.cc:1418-1460): maps each local level to a
    # matrix column; members of an ion's superlevel share one column
    colmap: np.ndarray | None = None  # (dim,) int32 -> [0, dim_reduced)
    dim_reduced: int = 0
    sl_member: np.ndarray | None = None  # (dim,) bool
    e_slref: np.ndarray | None = None  # (dim,) energy of the ion's first member


def _nlte_level_cap(z: int, ionstage: int, opts) -> int:
    """Highest level index treated in full NLTE (reference:
    artisoptions_nltenebular.h:19-24 LEVEL_IS_NLTE; the christinenonthermal
    preset instead caps by Z band, artisoptions_christinenonthermal.h:19-24)."""
    if opts is None or opts.nlte_all_levels:
        return 1 << 30
    if getattr(opts, "nlte_maxlevel_lowz", -1) >= 0 and z < 22:
        return opts.nlte_maxlevel_lowz
    if z == 26 and ionstage == 2:
        return opts.nlte_maxlevel_fe2
    return opts.nlte_maxlevel


def build_indices(dad: DeviceAtomicData, opts=None) -> list[ElementNlteIndex]:
    """Precompute per-element index lists (host, once per run)."""
    out = []
    level_ion = np.asarray(dad.level_ion)
    ion_element = np.asarray(dad.ion_element)
    ion_level_start = np.asarray(dad.ion_level_start)
    ion_nlevels = np.asarray(dad.ion_nlevels)
    trans_owner = np.asarray(dad.trans_owner)
    trans_is_down = np.asarray(dad.trans_is_down)
    trans_target = np.asarray(dad.trans_target)
    cont_lower = np.asarray(dad.cont_uniquelower)
    cont_upper = np.asarray(dad.cont_uniqueupper)
    cont_elem = np.asarray(dad.cont_element)

    level_elem = ion_element[level_ion]
    for el in range(dad.nelements):
        ions = np.nonzero(ion_element == el)[0]
        if len(ions) == 0:
            continue
        lstart = int(ion_level_start[ions[0]])
        dim = int(ion_nlevels[ions].sum())

        # down-block transition entries owned by this element's levels
        sel = trans_is_down & (level_elem[trans_owner] == el)
        owner = trans_owner[sel]
        target_global = ion_level_start[level_ion[owner]] + trans_target[sel]
        csel = cont_elem == el

        # superlevel column mapping (input.cc:1418-1460): per ion, levels
        # 1..cap are full-NLTE columns; higher levels share one column
        z = int(np.asarray(dad.elem_z)[el])
        ion_stages = np.asarray(dad.ion_stage)[ions]
        colmap = np.zeros(dim, dtype=np.int32)
        sl_member = np.zeros(dim, dtype=bool)
        e_slref = np.zeros(dim)
        level_energy = np.asarray(dad.level_energy)
        col = 0
        for k, gi in enumerate(ions):
            ls = int(ion_level_start[gi]) - lstart
            nl = int(ion_nlevels[gi])
            cap = _nlte_level_cap(z, int(ion_stages[k]), opts)
            n_full = min(nl, cap + 1)  # levels 0..cap are full NLTE
            for l in range(n_full):
                colmap[ls + l] = col
                col += 1
            if nl > n_full:
                e_ref = level_energy[lstart + ls + n_full]
                for l in range(n_full, nl):
                    colmap[ls + l] = col
                    sl_member[ls + l] = True
                    e_slref[ls + l] = e_ref
                col += 1
        dim_reduced = col

        out.append(
            ElementNlteIndex(
                element=el,
                lstart=lstart,
                dim=dim,
                trans_upper_local=(owner - lstart).astype(np.int32),
                trans_lower_local=(target_global - lstart).astype(np.int32),
                trans_A=np.asarray(dad.trans_A)[sel],
                trans_coll_str=np.asarray(dad.trans_coll_str)[sel],
                trans_forbidden=np.asarray(dad.trans_forbidden)[sel],
                trans_osc_strength=np.asarray(dad.trans_osc_strength)[sel],
                trans_lineidx=np.asarray(dad.trans_lineindex)[sel],
                cont_idx=np.nonzero(csel)[0].astype(np.int64),
                cont_lower_local=(cont_lower[csel] - lstart).astype(np.int32),
                cont_upper_local=(cont_upper[csel] - lstart).astype(np.int32),
                ion_local_start=(ion_level_start[ions] - lstart).astype(np.int32),
                ion_nlevels=ion_nlevels[ions].astype(np.int32),
                nions=len(ions),
                first_global_ion=int(ions[0]),
                colmap=colmap,
                dim_reduced=dim_reduced,
                sl_member=sl_member,
                e_slref=e_slref,
            )
        )
    return out


def solve_element(
    idx: ElementNlteIndex,
    dad: DeviceAtomicData,
    rc: RateCoeffTables,
    cells,
    opts: Options,
    levelpops_boltzmann: jax.Array,  # (ncells, nlevels_total) current LTE pops
    nnelement: jax.Array,  # (ncells,)
    t_mid,
    nt_ion_rate=None,  # (ncells, nions_total) non-thermal ionisation [1/s]
    nt_prob_auger=None,  # (ncells, nions_total, naug) upper-ion probabilities
    ntd=None,  # NonthermalData (for the NT excitation transition table)
    nt_exc_perdep=None,  # (ncells, nexc) excitation ratecoeff per deposition
    nt_dep_rate_density=None,  # (ncells,) [erg/cm3/s]
    bfrate_normed=None,  # (ncells, nbfcontinua) detailed MC photoion rates
    jblue_normed=None,  # (jblue_of_line, (ncells, njblue)) detailed J_b_lu
    corr_photoion_cells=None,  # (ncells, ncont) LUT-off on-the-fly rates
):
    """Solve one element's statistical equilibrium for all cells.

    Returns (ncells, dim) level populations [1/cm3].
    """
    ncells = nnelement.shape[0]
    dim = idx.dim
    lstart = idx.lstart
    t_e = cells.Te
    nne = cells.nne
    t_r = jnp.maximum(cells.TR, 1.0)
    w = cells.W
    dtype = levelpops_boltzmann.dtype

    lp = levelpops_boltzmann[:, lstart : lstart + dim]  # (ncells, dim)

    # superlevel machinery (nltepop.cc:850-870, 1061-1072): column map and
    # per-level Boltzmann share of its superlevel at T_exc
    if idx.colmap is not None:
        cm = jnp.asarray(idx.colmap)  # (dim,)
        dimr = idx.dim_reduced
        member = jnp.asarray(idx.sl_member)
        if bool(np.any(idx.sl_member)):
            t_exc = cells.TJ if opts.ltepop_excitation_use_tj else t_e
            e_lvl = dad.level_energy[lstart : lstart + dim]
            g_lvl = dad.level_g[lstart : lstart + dim]
            boltz = jnp.where(
                member[None, :],
                g_lvl[None, :] * jnp.exp(
                    -jnp.maximum(e_lvl - jnp.asarray(idx.e_slref, dtype), 0.0)[None, :]
                    / (KB * jnp.maximum(t_exc, 1.0))[:, None]
                ),
                0.0,
            )
            sl_partfunc = jnp.zeros((ncells, dimr), dtype).at[:, cm].add(boltz)
            s_renorm = jnp.where(
                member[None, :],
                boltz / jnp.maximum(sl_partfunc[:, cm], 1e-300),
                1.0,
            )
        else:
            s_renorm = jnp.ones((ncells, dim), dtype)
    else:
        cm = jnp.arange(dim, dtype=jnp.int32)
        dimr = dim
        s_renorm = jnp.ones((ncells, dim), dtype)

    m = jnp.zeros((ncells, dimr, dimr), dtype)

    # --- bound-bound (nltepop.cc:383-464) ---
    if len(idx.trans_A) > 0:
        up = jnp.asarray(idx.trans_upper_local)
        lo = jnp.asarray(idx.trans_lower_local)
        e_up = dad.level_energy[lstart + up]
        e_lo = dad.level_energy[lstart + lo]
        eps_trans = e_up - e_lo
        nu_trans = jnp.maximum(eps_trans / H, 1e-30)
        a_ul = jnp.asarray(idx.trans_A)
        b_ul = a_ul * (CLIGHTSQUARED / (nu_trans * nu_trans)) / (2.0 * H * nu_trans)
        g_u = dad.level_g[lstart + up]
        g_l = dad.level_g[lstart + lo]
        b_lu = g_u / g_l * b_ul

        n_u = lp[:, up]
        n_l = lp[:, lo]
        tau = jnp.maximum((b_lu[None, :] * n_l - b_ul[None, :] * n_u) * HCLIGHTOVERFOURPI * t_mid, 0.0)
        beta = beta_sobolev(tau)

        r_down = a_ul[None, :] * beta
        c_down = col_deexcitation_ratecoeff(
            t_e[:, None], nne[:, None], eps_trans[None, :], jnp.asarray(idx.trans_coll_str)[None, :],
            jnp.asarray(idx.trans_forbidden)[None, :], jnp.asarray(idx.trans_osc_strength)[None, :],
            g_u[None, :], g_l[None, :],
        )
        r_over_j = jnp.where(
            n_l > 0, (b_lu[None, :] - b_ul[None, :] * n_u / jnp.maximum(n_l, 1e-300)) * beta,
            b_lu[None, :] * beta,
        )
        j_nu = dbb(nu_trans[None, :], t_r[:, None], w[:, None])
        if jblue_normed is not None and idx.trans_lineidx is not None:
            # detailed line estimator replaces the dilute-BB field for
            # selected lines (reference: macroatom.cc:713-720)
            jb_line, jb_arr = jblue_normed
            li = jnp.asarray(idx.trans_lineidx)
            jb_idx = jb_line[jnp.clip(li, 0, jb_line.shape[0] - 1)]
            has_jb = (li >= 0) & (jb_idx >= 0)
            j_nu = jnp.where(
                has_jb[None, :], jb_arr[:, jnp.maximum(jb_idx, 0)], j_nu
            )
        r_up = jnp.maximum(r_over_j * j_nu, 0.0)
        c_up = col_excitation_ratecoeff(
            t_e[:, None], nne[:, None], eps_trans[None, :], jnp.asarray(idx.trans_coll_str)[None, :],
            jnp.asarray(idx.trans_forbidden)[None, :], jnp.asarray(idx.trans_osc_strength)[None, :],
            g_u[None, :], g_l[None, :],
        )
        # rates out of a level carry its superlevel Boltzmann share
        # (nltepop.cc:860-870 s_renorm)
        down = (r_down + c_down) * s_renorm[:, up]
        upr = (r_up + c_up) * s_renorm[:, lo]
        cu, cl = cm[up], cm[lo]
        m = m.at[:, cu, cu].add(-down)
        m = m.at[:, cl, cu].add(down)
        m = m.at[:, cl, cl].add(-upr)
        m = m.at[:, cu, cl].add(upr)

    # --- bound-free (nltepop.cc:466-523) ---
    if len(idx.cont_idx) > 0:
        ci = jnp.asarray(idx.cont_idx)
        ll = jnp.asarray(idx.cont_lower_local)
        ul = jnp.asarray(idx.cont_upper_local)
        eps_trans = dad.level_energy[lstart + ul] - dad.level_energy[lstart + ll]
        sigma_edge = dad.allphixs[dad.cont_phixsrow[ci], 0].astype(dtype) * dad.cont_probability[ci]
        lower_stage = dad.ion_stage[dad.cont_ion[ci]]
        g_l = dad.level_g[lstart + ll]
        g_u = dad.level_g[lstart + ul]

        if corr_photoion_cells is not None:
            # LUT-off: photoionisation integral over the current radiation
            # field model (reference: ratecoeff.cc:731-817)
            r_ion = corr_photoion_cells[:, ci]
        else:
            gamma_lut = interpolate_lut(rc.corrphotoion, rc, ci[None, :], t_r[:, None])
            r_ion = w[:, None] * gamma_lut
        if bfrate_normed is not None:
            # detailed MC estimator IS the photoionisation rate coefficient
            # (reference: ratecoeff.cc:1218-1226 get_corrphotoioncoeff with
            # DETAILED_BF_ESTIMATORS_ON)
            r_ion = bfrate_normed[:, ci]
        c_ion = col_ionization_ratecoeff(
            t_e[:, None], nne[:, None], sigma_edge[None, :], eps_trans[None, :], lower_stage[None, :]
        )
        alpha = interpolate_lut(rc.spontrecomb, rc, ci[None, :], t_e[:, None])
        r_rec = nne[:, None] * alpha
        c_rec = col_recombination_ratecoeff(
            t_e[:, None], nne[:, None], sigma_edge[None, :], eps_trans[None, :],
            (lower_stage + 1)[None, :], g_l[None, :], g_u[None, :],
        )
        ion = (r_ion + c_ion) * s_renorm[:, ll]
        rec = (r_rec + c_rec) * s_renorm[:, ul]
        cll, cul = cm[ll], cm[ul]
        m = m.at[:, cll, cll].add(-ion)
        m = m.at[:, cul, cll].add(ion)
        m = m.at[:, cul, cul].add(-rec)
        m = m.at[:, cll, cul].add(rec)

    # --- non-thermal ionisation (nltepop.cc:525-554 NT contribution): the
    # same Gamma_NT applies to every level of an ion; the electron lands in
    # the ground state of ion+1+a with the Auger-electron probability
    # P(a) (nonthermal.cc:2157-2203 nt_ionization_upperion_probability) ---
    if nt_ion_rate is not None:
        cm_np = (np.asarray(idx.colmap) if idx.colmap is not None
                 else np.arange(dim))
        ion_starts = [int(v) for v in idx.ion_local_start]
        nlv = [int(v) for v in idx.ion_nlevels]
        naug = nt_prob_auger.shape[2] if nt_prob_auger is not None else 1
        for k in range(idx.nions - 1):
            lsl = ion_starts[k]
            ionidx_global = int(idx.first_global_ion) + k
            rate = nt_ion_rate[:, ionidx_global]  # (ncells,)
            lv = jnp.arange(lsl, lsl + nlv[k])
            clv = cm[lv]
            slv = s_renorm[:, lv]  # (ncells, nlv_k)
            m = m.at[:, clv, clv].add(-rate[:, None] * slv)
            maxa = min(naug, idx.nions - 1 - k)
            for a in range(maxa):
                gup = int(cm_np[ion_starts[k + 1 + a]])
                if nt_prob_auger is not None:
                    p = nt_prob_auger[:, ionidx_global, a]
                    if a == maxa - 1:
                        # remaining probability folds into the top reachable
                        # ion (nonthermal.cc:2174-2196)
                        p = 1.0 - jnp.sum(nt_prob_auger[:, ionidx_global, :a], axis=1)
                else:
                    p = jnp.ones_like(rate) if a == 0 else jnp.zeros_like(rate)
                m = m.at[:, gup, clv].add((rate * p)[:, None] * slv)

    # --- non-thermal excitation (nltepop.cc:445-449 NTC term;
    # nonthermal.cc:2272-2297 nt_excitation_ratecoeff) ---
    if nt_exc_perdep is not None and ntd is not None and nt_dep_rate_density is not None:
        exc_lower = np.asarray(ntd.exc_lower)
        in_elem = (exc_lower >= lstart) & (exc_lower < lstart + dim)
        if np.any(in_elem):
            tsel = jnp.asarray(np.nonzero(in_elem)[0])
            lo_l = jnp.asarray(exc_lower[in_elem] - lstart)
            up_l = ntd.exc_upper[tsel] - lstart
            ntc = nt_exc_perdep[:, tsel] * nt_dep_rate_density[:, None]  # (ncells, t)
            ntc = ntc * s_renorm[:, lo_l]
            clo, cup = cm[lo_l], cm[up_l]
            m = m.at[:, clo, clo].add(-ntc)
            m = m.at[:, cup, clo].add(ntc)

    # --- constraint rows and column normalisation ---
    # The reference sets constraint rows to 1 BEFORE scaling every matrix
    # column by the Boltzmann norm factors (nltepop.cc:892-930), so the
    # constraint rows end up containing norm_j — i.e. they constrain the
    # physical populations sum(x_j norm_j). We apply the end state directly.
    # A superlevel column's norm is the sum of its members' Boltzmann pops
    # (nltepop.cc:568-577).
    lpc = jnp.maximum(lp, opts.minpop)  # (ncells, dim)
    norm = jnp.zeros((ncells, dimr), dtype).at[:, cm].add(lpc)
    m = m * norm[:, None, :]
    balance = jnp.zeros((ncells, dimr), dtype).at[:, 0].set(nnelement)
    m = m.at[:, 0, :].set(norm)

    if opts.force_saha_ion_balance:
        # replace each ion's ground row with the Saha ion-population constraint
        # (nltepop.cc:904-921)
        partfuncts = calculate_partfuncts(dad, cells.TJ if opts.ltepop_excitation_use_tj else cells.Te)
        logphi = log_phi_saha(dad, partfuncts, t_e)
        from ..constants import MH

        uppermost = find_uppermost_ion(dad, logphi, cells.rho / MH)
        frac = calculate_ionfractions_log(dad, logphi, nne, uppermost)  # (ncells, nelem, maxn)
        colmap_np = (np.asarray(idx.colmap) if idx.colmap is not None
                     else np.arange(dim, dtype=np.int32))
        for k in range(1, idx.nions):
            g0 = int(idx.ion_local_start[k])
            g1 = g0 + int(idx.ion_nlevels[k])
            c0 = int(colmap_np[g0])
            c1 = int(colmap_np[g1 - 1]) + 1
            nnion_k = nnelement * frac[:, idx.element, k]
            row = jnp.zeros((ncells, dimr), dtype).at[:, c0:c1].set(1.0) * norm
            m = m.at[:, c0, :].set(row)
            balance = balance.at[:, c0].set(nnion_k)

    # --- batched LU solve with iterative refinement, keeping the best
    # residual (nltepop.cc:623-746) ---
    lu, piv = jax.vmap(jax.scipy.linalg.lu_factor)(m)

    def lusolve(rhs):
        return jax.vmap(jax.scipy.linalg.lu_solve)((lu, piv), rhs)

    x = lusolve(balance)

    def resnorm(xv):
        r = balance - jnp.einsum("cij,cj->ci", m, xv)
        return r, jnp.max(jnp.abs(r), axis=1)

    r, best_err = resnorm(x)
    best_x = x

    def refine(_, carry):
        x, r, best_x, best_err = carry
        x = x + lusolve(r)
        r, err = resnorm(x)
        better = err < best_err
        best_x = jnp.where(better[:, None], x, best_x)
        best_err = jnp.minimum(err, best_err)
        return x, r, best_x, best_err

    n_ref = max(int(getattr(opts, "nlte_refine_iters", 0)), 0)
    if n_ref > 0:
        _, _, best_x, best_err = jax.lax.fori_loop(
            0, n_ref, refine, (x, r, best_x, best_err)
        )
    x = best_x

    # physical pops: superlevel members share the solved x of their column
    # scaled by their own Boltzmann population (nltepop.cc:993-1005)
    pops = x[:, cm] * lpc

    # fallbacks: non-finite solve or negative pops -> LTE value
    # (nltepop.cc:632-636, 735-742)
    bad = ~jnp.isfinite(pops) | (pops < 0)
    pops = jnp.where(bad, lpc, pops)
    return pops


def solve_all_elements(
    indices,
    dad: DeviceAtomicData,
    rc: RateCoeffTables,
    cells,
    opts: Options,
    levelpops_boltzmann: jax.Array,
    t_mid,
    nt_ion_rate=None,
    nt_prob_auger=None,
    ntd=None,
    nt_exc_perdep=None,
    nt_dep_rate_density=None,
    bfrate_normed=None,
    jblue_normed=None,
    corr_photoion_cells=None,
):
    """Solve every element and return the merged (ncells, nlevels_total)
    population table plus updated ion ground pops / partition functions."""
    nnelement_all = cells.elem_numberdens()
    levelpops = levelpops_boltzmann
    for idx in indices:
        pops = solve_element(
            idx, dad, rc, cells, opts, levelpops_boltzmann,
            nnelement_all[:, idx.element], t_mid, nt_ion_rate=nt_ion_rate,
            nt_prob_auger=nt_prob_auger, ntd=ntd, nt_exc_perdep=nt_exc_perdep,
            nt_dep_rate_density=nt_dep_rate_density,
            bfrate_normed=bfrate_normed,
            jblue_normed=jblue_normed,
            corr_photoion_cells=corr_photoion_cells,
        )
        levelpops = jax.lax.dynamic_update_slice(
            levelpops, pops, (0, idx.lstart)
        )

    # re-derive ion ground pops, partition functions, and nne from the pops
    ncells = levelpops.shape[0]
    nions = dad.nions_total
    ion_of_level = dad.level_ion
    ionpop = jnp.zeros((ncells, nions), levelpops.dtype).at[:, ion_of_level].add(levelpops)
    groundpops = levelpops[:, dad.ion_level_start]
    partfuncts = jnp.where(
        groundpops > 0, ionpop / jnp.maximum(groundpops, 1e-300) * dad.ion_g0[None, :],
        dad.ion_g0[None, :],
    )
    charge = (dad.ion_stage - 1)[None, :]
    nne = jnp.maximum(jnp.sum(ionpop * charge, axis=1), opts.minpop)
    cells = cells.replace(
        ion_groundlevelpops=groundpops, ion_partfuncts=partfuncts, nne=nne
    )
    return cells, levelpops
