"""The simulation driver: setup + per-timestep grid update and transport.

TPU-native rebuild of the reference main program (reference: sn3d.cc:686-946
main, sn3d.cc:554-682 do_timestep, update_grid.cc:869-1072 update_grid_cell,
update_grid.cc:1076-1158 update_grid, grid.cc:2206-2325 grid_init ordering).

Per timestep: the plasma state of ALL non-empty cells is solved as batched
device ops (replacing the reference's rank-partitioned cell loop + MPI
broadcast), then one jitted transport call advances every packet to the end of
the timestep, then estimators come back for the next grid update.
"""

from __future__ import annotations

import dataclasses
import os
import time as _time

import jax
import jax.numpy as jnp
import numpy as np

from . import decay as decay_mod
from . import grid as grid_mod
from . import packets as packets_mod
from . import spectrum as spectrum_mod
from . import stats as stats_mod
from .atomic import to_device
from .constants import CLIGHT, DAY, FOURPI, LSUN, MEV, MH, ONEOVER4PI, PI, SIGMA_T
from .estimators import Estimators, zero_estimators
from .io import atomicdata as atomicdata_io
from .io import gammadata as gammadata_io
from .io import inputparams as inputparams_io
from .io import model as model_io
from .options import GridType, Options, kilonova_lte
from .packets import TYPE_ESCAPE, TYPE_RPKT, PacketState
from .plasma import cellstate as cellstate_mod
from .plasma import ltepop as ltepop_mod
from .plasma import nltepop as nltepop_mod
from .plasma import nonthermal as nonthermal_mod
from .plasma import radfield as radfield_mod
from .plasma import ratecoeff as ratecoeff_mod
from .plasma import thermalbalance as thermalbalance_mod
from .plasma import transitionrates as transitionrates_mod
from .devutil import demote_to_f32
from .transport import engine as engine_mod
from .transport import linewalk as linewalk_mod
from .transport import macroatom as macroatom_mod
from .transport import opacity as opacity_mod

GREY_OP = 0.1  # reference: globals.h:240


@jax.jit
def _count_active(state, t2):
    return jnp.sum(
        ((state.prop_time < t2) & (state.ptype != TYPE_ESCAPE)).astype(jnp.int32)
    )


@jax.jit
def _pack_counts(it_c, ns_c, state, t2):
    """Stack the per-chunk scalars into one device array so the driver pays a
    single host round-trip per chunk (the tunnel round-trip is ~40ms; three
    separate int() fetches were 3x that)."""
    n_act = jnp.sum(
        ((state.prop_time < t2) & (state.ptype != TYPE_ESCAPE)).astype(jnp.int32)
    )
    return jnp.stack([
        it_c.astype(jnp.int32), ns_c.astype(jnp.int32), n_act,
    ])


from functools import partial as _partial


@_partial(jax.jit, static_argnames=("width",))
def _gather_active(state, t2, width: int):
    """Gather the active packets into a width-lane buffer (tail dispatch)."""
    npkts = state.npkts
    act = (state.prop_time < t2) & (state.ptype != TYPE_ESCAPE)
    (idx,) = jnp.nonzero(act, size=width, fill_value=npkts)
    valid = idx < npkts
    idxc = jnp.minimum(idx, npkts - 1)
    sub = jax.tree_util.tree_map(lambda x: x[idxc], state)
    sub = sub.replace(ptype=jnp.where(valid, sub.ptype, TYPE_ESCAPE))
    return sub, idx


@jax.jit
def _scatter_back(state, sub, idx):
    """Scatter the tail buffer back into the full packet state."""
    sidx = jnp.where(idx < state.npkts, idx, state.npkts)
    return jax.tree_util.tree_map(
        lambda full, part: full.at[sidx].set(part, mode="drop"), state, sub
    )


def printout(logfile, msg):
    line = f"{_time.strftime('%H:%M:%S')} {msg}"
    print(line, flush=True)
    if logfile is not None:
        logfile.write(line + "\n")
        logfile.flush()


def _kappagrey_just2022(x_lan, t_r):
    """Just+2022 grey kappa: analytic in the lanthanide mass fraction with a
    temperature suppression below T_R = 2000 K (reference: grid.cc:1790-1820,
    fit to Kasen+2017 lightcurves for ALCAR simulations)."""
    x_lan = np.asarray(x_lan, dtype=np.float64)
    t_r = np.asarray(t_r, dtype=np.float64)
    kappa = np.where(
        x_lan < 1e-7, 0.2,
        np.where(x_lan < 1e-3, 3.0 * (x_lan / 1e-3) ** 0.3,
                 np.where(x_lan < 1e-1, 3.0 * (x_lan / 1e-3) ** 0.5,
                          30.0 * (x_lan / 1e-1) ** 0.1)))
    return np.where(t_r < 2000.0, kappa * (t_r / 2000.0) ** 5, kappa)


def sf_default_carry(ncells, nions, naug, nexc, dtype):
    """Fresh cross-timestep Spencer-Fano carry state: the skip-solution
    defaults (nonthermal.cc:2393-2419 — Axelrod heating fraction 0.97 and
    zeroed eff_ionpot so rates fall back to the WF approximation; here
    frac_ionization stays 0 because it routes transport deposits and zero
    eff_ionpot routes everything to heating) plus the solution-reuse
    bookkeeping (nneperion_when_solved / timestep_last_solved,
    nonthermal.cc:2421-2442)."""
    base = jnp.zeros((naug,), dtype).at[0].set(1.0)
    return dict(
        eff_ionpot=jnp.zeros((ncells, nions), dtype),
        frac_heating=jnp.full((ncells,), 0.97, dtype),
        frac_ionization=jnp.zeros((ncells,), dtype),
        frac_excitation=jnp.zeros((ncells,), dtype),
        frac_ion_by_ion=jnp.zeros((ncells, nions), dtype),
        prob_num_auger=jnp.broadcast_to(base, (ncells, nions, naug)),
        ionenfrac_num_auger=jnp.broadcast_to(base, (ncells, nions, naug)),
        exc_ratecoeff_perdep=jnp.zeros((ncells, max(nexc, 1)), dtype),
        exc_fracdep_cum=jnp.zeros((ncells, max(nexc, 1)), dtype),
        xe_when_solved=jnp.full((ncells,), -1.0, dtype),
        ts_last_solved=jnp.full((ncells,), -1, jnp.int32),
    )


_SF_BOOKKEEPING = ("xe_when_solved", "ts_last_solved")


def _plasma_update_device(dad, rc, cells, opts, j_norm, nuj_norm, t_mid,
                          ffheating_norm, dep_heating, mode: str,
                          binj_norm=None, binnuj_norm=None, bincount=None,
                          gammaest_norm=None, bfrate_normed=None,
                          jblue_normed=None, jblue_contribcount=None,
                          sf_carry=None, nts_dev=None,
                          radfield_use_bins: bool = False,
                          nlte_indices=None, ntd=None, nt_wf=None,
                          nt_sf_skip: bool = False, vpkt_exclude=(),
                          num_lte_timesteps: int = 0):
    """All device work of one grid update fused into a single dispatch:
    radiation-field fits, T_e solve or LTE T_J path, Saha/nne balance, level
    populations, ff-opacity parts and the macro-atom/cooling rate tables
    (reference: update_grid.cc:869-1072 solved per cell; here batched).

    mode: "first" (temperatures pre-assigned), "lte" (T_J path,
    update_grid.cc:961-978), or "nlte" (T_R/W fit + thermal balance,
    update_grid.cc:979-1002)."""
    if mode == "lte":
        t_j = radfield_mod.get_t_j_from_j(j_norm, opts.mintemp, opts.maxtemp)
        valid = jnp.isfinite(t_j) & (j_norm > 0)
        t_j = jnp.where(valid, t_j, cells.TJ)
        cells = cells.replace(
            TJ=t_j, TR=t_j, Te=t_j, W=jnp.ones_like(t_j)
        )
    elif mode == "nlte":
        t_j, t_r, w, valid = radfield_mod.fit_params_fullspec(
            j_norm, nuj_norm, opts.mintemp, opts.maxtemp
        )
        cells = cells.replace(
            TJ=jnp.where(valid, t_j, cells.TJ),
            TR=jnp.where(valid, t_r, cells.TR),
            W=jnp.where(valid, w, cells.W),
        )
    # multibin radiation-field fits (reference: radfield.cc:834-911) — fitted
    # BEFORE the solvers so LUT-off photoionisation/bfheating integrals can
    # evaluate J_nu from the binned model (update_grid_cell fits first too)
    if opts.multibin_radfield and mode != "first" and binj_norm is not None:
        tr_bins, w_bins = radfield_mod.fit_bin_params(
            binj_norm, binnuj_norm, bincount, cells.Te, opts.radfieldbincount,
            opts.mintemp, opts.maxtemp,
        )
    else:
        nb = opts.radfieldbincount if opts.multibin_radfield else 1
        tr_bins = jnp.zeros((cells.Te.shape[0], nb), cells.Te.dtype)
        w_bins = jnp.zeros_like(tr_bins)

    # LUT-off on-the-fly photoionisation / bf-heating integrals against the
    # current radiation-field model (reference: ratecoeff.cc:685-817,
    # thermalbalance.cc:43-106)
    corr_otf = None
    bfh_otf = None
    if (mode == "nlte" and dad.nbfcontinua > 0
            and (not opts.use_lut_photoion or not opts.use_lut_bfheating)):
        lp0 = ltepop_mod.calculate_levelpops(dad, cells, opts)
        nnion0_ = ltepop_mod.get_nnion(dad, cells)
        _, bf_dep0 = opacity_mod.build_bf_tables(
            dad, lp0, nnion0_, cells.nne, cells.nnetot, cells.Te
        )
        use_bins = radfield_use_bins and opts.multibin_radfield and binj_norm is not None
        corr_all, bfh_all = ratecoeff_mod.radfield_bf_integrals_cells(
            dad, cells.Te, cells.TR, cells.W, bf_dep0,
            tr_bins=tr_bins if use_bins else None,
            w_bins=w_bins if use_bins else None,
            nbins=opts.radfieldbincount if use_bins else 0,
        )
        if not opts.use_lut_photoion:
            corr_otf = corr_all
        if not opts.use_lut_bfheating:
            bfh_otf = bfh_all
    if mode == "nlte":
        # thermal balance after the radiation-field fits so LUT-off heating
        # uses the current field (reference: update_grid_cell fit -> solve)
        cells, _hc = thermalbalance_mod.call_t_e_finder(
            dad, rc, cells, opts, t_mid, ffheating_norm, dep_heating,
            bfheating_cells=bfh_otf,
        )
        # thick cells use the grey/LTE T_J path even in non-LTE timesteps
        # (reference: update_grid.cc:961-978 per-cell branch)
        t_j = radfield_mod.get_t_j_from_j(j_norm, opts.mintemp, opts.maxtemp)
        validj = jnp.isfinite(t_j) & (j_norm > 0)
        thick1 = cells.thick == 1
        cells = cells.replace(
            TJ=jnp.where(thick1 & validj, t_j, cells.TJ),
            TR=jnp.where(thick1 & validj, t_j, cells.TR),
            Te=jnp.where(thick1 & validj, t_j, cells.Te),
            W=jnp.where(thick1, jnp.ones_like(t_j), cells.W),
        )

    # LUT gamma estimators -> per-ion Gamma + corrphotoionrenorm
    # (reference: update_grid.cc:765-830)
    gamma_ion = None
    corrphotoionrenorm = None
    if gammaest_norm is not None and mode == "nlte" and opts.use_lut_photoion:
        ngc = gammaest_norm.shape[1]
        gci = dad.groundcont_contindex
        from .plasma.ratecoeff import interpolate_lut
        corr_lut = interpolate_lut(
            rc.corrphotoion, rc, gci[None, :], jnp.maximum(cells.TR, rc.mintemp)[:, None]
        )  # (ncells, ngc)
        corr_ana = cells.W[:, None] * corr_lut
        corrphotoionrenorm = jnp.where(
            corr_ana > 0, gammaest_norm / jnp.maximum(corr_ana, 1e-300), 1.0
        )
        gamma_ion = jnp.zeros((cells.Te.shape[0], dad.nions_total), cells.Te.dtype)
        gamma_ion = gamma_ion.at[:, dad.groundcont_uniqueion].add(gammaest_norm)

    cells = ltepop_mod.calculate_ion_balance_nne(
        dad, cells, opts, gamma_ion=gamma_ion, rc=rc
    )
    # non-thermal Spencer-Fano solution (reference: nonthermal.cc:2391;
    # solved before the NLTE populations in the outer loop,
    # update_grid.cc:683-694)
    ncells = cells.Te.shape[0]
    nions = dad.nions_total
    nt_frac_ion_by_ion = jnp.zeros((ncells, nions), cells.Te.dtype)
    nt_frac_ionization = jnp.zeros((ncells,), cells.Te.dtype)
    nt_frac_excitation = jnp.zeros((ncells,), cells.Te.dtype)
    naug = opts.nt_max_auger_electrons + 1
    nt_ionenfrac = jnp.broadcast_to(
        jnp.zeros((naug,), cells.Te.dtype).at[0].set(1.0), (ncells, nions, naug)
    )
    nexc = (ntd.exc_upper.shape[0] if (ntd is not None and opts.nt_excitation_on)
            else 1)
    nt_exc_fracdep_cum = jnp.zeros((ncells, max(nexc, 1)), cells.Te.dtype)
    dtype_c = cells.Te.dtype
    nlte_fracdiff = jnp.zeros((ncells,), dtype_c)
    nlte_iters = jnp.zeros((ncells,), jnp.int32)

    def _wf_rate(cells_c, nniontot):
        # work-function-approximation rate, the reference's SF alternative
        # and per-ion fallback (nonthermal.cc:1172-1178, 2246-2269):
        # Gamma = deposition density / nnion_tot * 1/W
        if nt_wf is None:
            return None
        wf_factor, elem_z_f = nt_wf
        zbar = jnp.maximum(jnp.sum(
            cells_c.elem_massfrac * elem_z_f[None, :].astype(dtype_c),
            axis=1), 1e-30)
        r = (dep_heating / nniontot / zbar)[:, None] \
            * wf_factor[None, :].astype(dtype_c)
        return jnp.where(dep_heating[:, None] > 0, r, 0.0)

    def _sf_defaults():
        # values in force when the SF solve is skipped (see sf_default_carry)
        full = sf_default_carry(ncells, nions, naug, nexc, dtype_c)
        return {k: v for k, v in full.items() if k not in _SF_BOOKKEEPING}

    def _sf_carry_init():
        """(sfst, xe_last, ts_last) start state for this timestep: the
        carried cross-timestep solution where still valid, defaults where
        stale.  A solution is stale when it is older than
        sf_max_ts_between_solutions timesteps or was solved during the LTE
        phase (reference keep-conditions, nonthermal.cc:2432-2442); staleness
        invalidates via xe=-1 so the in-loop x_e gate forces a re-solve."""
        if sf_carry is None or ntd is None or nts_dev is None:
            return (_sf_defaults(),
                    jnp.full((ncells,), -1.0, dtype_c),
                    jnp.full((ncells,), -1, jnp.int32))
        sfst = {k: v for k, v in sf_carry.items() if k not in _SF_BOOKKEEPING}
        ts_last = sf_carry["ts_last_solved"]
        stale = (
            (nts_dev - ts_last > opts.sf_max_ts_between_solutions)
            | (ts_last <= num_lte_timesteps)
        )
        xe_last = jnp.where(stale, -1.0, sf_carry["xe_when_solved"])
        return sfst, xe_last, ts_last

    def _sf_solve(cells_c, nnion0):
        boltz0 = ltepop_mod.calculate_levelpops(dad, cells_c, opts)
        sf = nonthermal_mod.solve_spencerfano_cells(
            ntd, dad, boltz0, nnion0, cells_c.nne,
            sf_auger_contribution_on=opts.sf_auger_contribution_on,
            nt_use_valence_ionpotential=opts.nt_use_valence_ionpotential,
        )
        out = _sf_defaults()
        for k2 in ("eff_ionpot", "frac_heating", "frac_ionization",
                   "frac_excitation", "frac_ion_by_ion", "prob_num_auger",
                   "ionenfrac_num_auger"):
            out[k2] = sf[k2].astype(dtype_c)
        if opts.nt_excitation_on and ntd.nexc > 0:
            out["exc_ratecoeff_perdep"] = sf["exc_ratecoeff_perdep"].astype(
                dtype_c)
            # per-transition deposition fractions, cumulative, for the NT
            # excitation channel (nonthermal.cc:1608-1625 frac_deposition)
            from .constants import EV as _EV
            fracdep = (
                boltz0[:, ntd.exc_lower]
                * ntd.exc_eps_ev[None, :].astype(dtype_c) * _EV
                * out["exc_ratecoeff_perdep"]
            )
            out["exc_fracdep_cum"] = jnp.cumsum(fracdep, axis=1)
        return out

    def _nt_rate(sfst, cells_c, nniontot):
        if ntd is None and nt_wf is None:
            return None
        rate = None
        if ntd is not None:
            rate = nonthermal_mod.nt_ionization_ratecoeff(
                dep_heating, nniontot, sfst["eff_ionpot"])
        wf = _wf_rate(cells_c, nniontot)
        if rate is None:
            return wf
        if wf is not None:
            # SF rates that come out non-positive/invalid fall back to the
            # WF approximation (nonthermal.cc:2249-2266)
            rate = jnp.where(jnp.isfinite(rate) & (rate > 0), rate, wf)
        return rate

    if mode == "nlte" and opts.nlte_enabled and nlte_indices:
        # reference solve_Te_nltepops (update_grid.cc:670-763): iterate
        # [Spencer-Fano -> T_e -> NLTE pops -> ion balance/nne] until both
        # the nne and T_e fractional changes drop below the 4% tolerance or
        # NLTEITER is hit.  Each cell converges independently: its state
        # freezes and the batched loop exits once every cell is done.
        tol = opts.nlte_convergence_tol
        maxiter = max(opts.nlte_outer_iters, 1)
        lp0 = ltepop_mod.calculate_levelpops(dad, cells, opts)
        sf0, xe0, ts_last0 = _sf_carry_init()
        # grey (thick==1) cells keep the T_J route set above; the reference
        # never calls solve_Te_nltepops for them (update_grid.cc:961-978)
        converged0 = cells.thick == 1

        def _freeze(mask, new, old):
            return jax.tree_util.tree_map(
                lambda n, o: jnp.where(
                    mask.reshape((ncells,) + (1,) * (n.ndim - 1)), n, o),
                new, old)

        def _body(carry):
            (it, converged, cells_c, lp_c, sfst, xe_last, solved, fd,
             it_used) = carry
            active = ~converged
            nnion0 = ltepop_mod.get_nnion(dad, cells_c)
            nniontot = jnp.maximum(jnp.sum(nnion0, axis=1), 1e-300)
            if ntd is not None and not nt_sf_skip:
                # re-solve Spencer-Fano only where x_e moved >= 5% since the
                # last solution (the NT_MAX_FRACDIFF_NNEPERION gate,
                # nonthermal.cc:2426-2442; cross-timestep reuse arrives
                # pre-invalidated by _sf_carry_init); skip the whole batched
                # solve when no active cell needs it
                xe = cells_c.nne / nniontot
                need = active & (
                    (xe_last <= 0)
                    | (jnp.abs(xe_last / jnp.maximum(xe, 1e-300) - 1.0)
                       >= 0.05)
                )
                sf_new = jax.lax.cond(
                    jnp.any(need),
                    lambda c: _sf_solve(c, nnion0),
                    lambda c: sfst, cells_c,
                )
                sfst = _freeze(need, sf_new, sfst)
                xe_last = jnp.where(need, xe, xe_last)
                solved = solved | need
            nt_rate_c = _nt_rate(sfst, cells_c, nniontot)
            if ntd is not None:
                heatfrac = sfst["frac_heating"]
            elif nt_wf is not None:
                heatfrac = 0.97  # get_nt_frac_heating WF constant
            else:
                heatfrac = 1.0
            # only the heating fraction of the deposition heats the gas
            # (thermalbalance.cc:135-241)
            prev_te = cells_c.Te
            cells_n, _hc = thermalbalance_mod.call_t_e_finder(
                dad, rc, cells_c, opts, t_mid, ffheating_norm,
                dep_heating * heatfrac, bfheating_cells=bfh_otf,
            )
            fd_te = jnp.abs(cells_n.Te / jnp.maximum(prev_te, 1e-300) - 1.0)
            nne_prev = cells_n.nne
            boltz = ltepop_mod.calculate_levelpops(dad, cells_n, opts)
            cells_n, lp_n = nltepop_mod.solve_all_elements(
                nlte_indices, dad, rc, cells_n, opts, boltz, t_mid,
                nt_ion_rate=nt_rate_c,
                nt_prob_auger=(sfst["prob_num_auger"]
                               if ntd is not None else None),
                ntd=ntd,
                nt_exc_perdep=(sfst["exc_ratecoeff_perdep"]
                               if ntd is not None and opts.nt_excitation_on
                               else None),
                nt_dep_rate_density=dep_heating,
                bfrate_normed=bfrate_normed,
                jblue_normed=jblue_normed,
                corr_photoion_cells=corr_otf,
            )
            fd_nne = jnp.abs(
                cells_n.nne / jnp.maximum(nne_prev, 1e-300) - 1.0)
            fd_new = jnp.maximum(fd_te, fd_nne)
            cells_c = _freeze(active, cells_n, cells_c)
            lp_c = jnp.where(active[:, None], lp_n, lp_c)
            fd = jnp.where(active, fd_new, fd)
            it_used = jnp.where(active, it + 1, it_used)
            converged = converged | (fd_new <= tol)
            return (it + 1, converged, cells_c, lp_c, sfst, xe_last, solved,
                    fd, it_used)

        def _cond(carry):
            return (carry[0] < maxiter) & ~jnp.all(carry[1])

        (_, _, cells, levelpops, sfst, xe_out, sf_solved, nlte_fracdiff,
         nlte_iters) = jax.lax.while_loop(
            _cond, _body,
            (jnp.int32(0), converged0, cells, lp0, sf0, xe0,
             jnp.zeros((ncells,), bool),
             jnp.zeros((ncells,), dtype_c),
             jnp.zeros((ncells,), jnp.int32)),
        )
        if nts_dev is not None:
            ts_last_out = jnp.where(
                sf_solved, nts_dev.astype(jnp.int32), ts_last0)
        else:
            ts_last_out = ts_last0
        sf_carry_out = dict(
            sfst, xe_when_solved=xe_out, ts_last_solved=ts_last_out)
        if ntd is not None:
            nt_frac_ion_by_ion = sfst["frac_ion_by_ion"]
            nt_frac_ionization = sfst["frac_ionization"]
            nt_frac_excitation = sfst["frac_excitation"]
            nt_ionenfrac = sfst["ionenfrac_num_auger"]
            nt_exc_fracdep_cum = sfst["exc_fracdep_cum"]
    else:
        # no NLTE outer loop: pass the SF carry through (or, below, update
        # it from the single solve)
        if sf_carry is not None:
            sf_carry_out = sf_carry
        else:
            sf_carry_out = dict(
                _sf_defaults(),
                xe_when_solved=jnp.full((ncells,), -1.0, dtype_c),
                ts_last_solved=jnp.full((ncells,), -1, jnp.int32))
        if mode == "nlte" and (ntd is not None or nt_wf is not None):
            # no NLTE levels: SF + T_e + ion balance run once, no iteration
            # (update_grid.cc:710-721 "break; no iteration is needed")
            nnion0 = ltepop_mod.get_nnion(dad, cells)
            nniontot = jnp.maximum(jnp.sum(nnion0, axis=1), 1e-300)
            if ntd is not None and not nt_sf_skip:
                sf0, xe0, ts_last0 = _sf_carry_init()
                xe = cells.nne / nniontot
                need = (
                    (xe0 <= 0)
                    | (jnp.abs(xe0 / jnp.maximum(xe, 1e-300) - 1.0) >= 0.05)
                )
                sf_new = jax.lax.cond(
                    jnp.any(need),
                    lambda c: _sf_solve(c, nnion0),
                    lambda c: sf0, cells,
                )
                sfst = jax.tree_util.tree_map(
                    lambda n, o: jnp.where(
                        need.reshape((ncells,) + (1,) * (n.ndim - 1)), n, o),
                    sf_new, sf0)
                if nts_dev is not None:
                    ts_last_out = jnp.where(
                        need, nts_dev.astype(jnp.int32), ts_last0)
                else:
                    ts_last_out = ts_last0
                sf_carry_out = dict(
                    sfst, xe_when_solved=jnp.where(need, xe, xe0),
                    ts_last_solved=ts_last_out)
            else:
                sfst = _sf_defaults()
            if ntd is not None:
                nt_frac_ion_by_ion = sfst["frac_ion_by_ion"]
                nt_frac_ionization = sfst["frac_ionization"]
                nt_frac_excitation = sfst["frac_excitation"]
                nt_ionenfrac = sfst["ionenfrac_num_auger"]
                nt_exc_fracdep_cum = sfst["exc_fracdep_cum"]
                heatfrac = sfst["frac_heating"]
            else:
                heatfrac = 0.97
            cells, _hc = thermalbalance_mod.call_t_e_finder(
                dad, rc, cells, opts, t_mid, ffheating_norm,
                dep_heating * heatfrac, bfheating_cells=bfh_otf,
            )
            cells = ltepop_mod.calculate_ion_balance_nne(dad, cells, opts)
        levelpops = ltepop_mod.calculate_levelpops(dad, cells, opts)
    nnion = ltepop_mod.get_nnion(dad, cells)
    chi_ff_part = opacity_mod.chi_ff_nnionpart_cells(dad, nnion, cells.Te)
    rates = transitionrates_mod.compute_process_rates(
        dad, rc, levelpops, nnion, cells.Te, cells.TR, cells.W, cells.nne, t_mid,
        corrphotoionrenorm=corrphotoionrenorm,
        jblue_normed=jblue_normed,
        corr_photoion_cells=corr_otf,
    )
    cells = cells.replace(
        totalcooling=rates.totalcooling, ion_cooling_contribs=rates.ion_cooling
    )
    # per-timestep transport tables (the cellcache equivalent): Sobolev tau
    # factors and bound-free factor tables, so the per-packet hot loop does
    # single row-gathers instead of recomputing per packet
    tau_sob = linewalk_mod.build_tau_factor(dad, levelpops)
    if opts.expansionopacities_on:
        from .transport import expansionopacity as expo_mod
        expo_kappa, expo_pc = expo_mod.build_expansion_opacities(
            tau_sob, dad, cells.rho, cells.TR, t_mid
        )
        if opts.rpkt_boundbound_thermalisation_probability < 0:
            expo_wcum, expo_binoff = expo_mod.build_line_selection(
                tau_sob, dad, t_mid
            )
        else:
            expo_wcum = jnp.zeros((tau_sob.shape[0], 1), tau_sob.dtype)
            expo_binoff = jnp.zeros((2,), jnp.int32)
    else:
        expo_kappa = jnp.zeros((tau_sob.shape[0], 1), tau_sob.dtype)
        expo_pc = expo_kappa
        expo_wcum = expo_kappa
        expo_binoff = jnp.zeros((2,), jnp.int32)
    if opts.vpkt_on:
        from .transport import vpkt as vpkt_device_mod
        vcum_tau, vcum_taunu = vpkt_device_mod.build_vpkt_tables(
            tau_sob, dad, exclude=vpkt_exclude
        )
    else:
        vcum_tau = jnp.zeros((tau_sob.shape[0], 1), tau_sob.dtype)
        vcum_taunu = vcum_tau
    bf_a, bf_dep = opacity_mod.build_bf_tables(
        dad, levelpops, nnion, cells.nne, cells.nnetot, cells.Te
    )
    return (cells, levelpops, nnion, chi_ff_part, rates, tau_sob, bf_a, bf_dep,
            nt_frac_ion_by_ion, nt_frac_ionization, nt_frac_excitation,
            nt_ionenfrac, nt_exc_fracdep_cum,
            tr_bins, w_bins, vcum_tau, vcum_taunu, expo_kappa, expo_pc,
            expo_wcum, expo_binoff, nlte_fracdiff, nlte_iters, sf_carry_out)


class Simulation:
    """Owns all static data and the evolving state of one run."""

    def __init__(self, rundir: str, opts: Options | None = None, datadir: str | None = None,
                 lockfile: bool = False, mesh=None):
        self._mesh_request = mesh
        mode = os.environ.get("ARTIS_HOST_SETUP", "auto")
        host_setup = mode == "1" or (mode == "auto" and jax.default_backend() != "cpu")
        if host_setup:
            try:
                cpu = jax.local_devices(backend="cpu")[0]
            except RuntimeError:
                if mode == "1":
                    # an explicit request is being downgraded to the slow
                    # direct-on-accelerator init; on a remote-relay backend
                    # that is exactly the minutes-long pathology host setup
                    # exists to avoid — say so
                    print(
                        "WARNING: ARTIS_HOST_SETUP=1 requested but no CPU "
                        "backend is available; falling back to direct "
                        "on-accelerator setup (slow on relay backends)",
                        flush=True,
                    )
                host_setup = False
        if not host_setup:
            self._init_impl(rundir, opts, datadir, lockfile)
            self._setup_mesh()
            return
        # Build every device structure on the local CPU backend: eager setup
        # ops on a remote-relay accelerator each cost a network round trip
        # (minutes of wall time for the ~10^2 small ops below, measured), then
        # one bulk device_put ships the finished pytrees to the accelerator.
        with jax.default_device(cpu):
            self._init_impl(rundir, opts, datadir, lockfile)
        devices = jax.devices()
        if len(devices) > 1:
            # replicate over ALL devices (an uncommitted-compatible layout):
            # committing to devices[0] makes shard_map reject the arrays on a
            # multi-device mesh ("incompatible devices"), while a replicated
            # NamedSharding over the same device set reshards freely
            from jax.sharding import Mesh as _Mesh, NamedSharding, PartitionSpec as _P
            import numpy as _np
            target = NamedSharding(_Mesh(_np.array(devices), ("d",)), _P())
        else:
            target = devices[0]
        t0 = _time.time()
        moved = [0]
        moved_arrays = []

        def _move(x):
            if isinstance(x, jax.Array):
                moved[0] += x.nbytes
                y = jax.device_put(x, target)
                moved_arrays.append(y)
                return y
            return x

        for name, val in list(vars(self).items()):
            setattr(self, name, jax.tree_util.tree_map(_move, val))
        jax.block_until_ready(moved_arrays)
        # the plasma jit closed over pre-move (CPU-committed) array copies;
        # rebuild it so the moved device copies are the ones captured
        self._build_plasma_jit()
        self.log(
            f"host setup: moved {moved[0] / 1e6:.1f} MB to {target} in "
            f"{_time.time() - t0:.1f}s"
        )
        self._setup_mesh()

    def _init_impl(self, rundir: str, opts: Options | None, datadir: str | None,
                   lockfile: bool):
        self.rundir = rundir
        self.datadir = datadir or os.path.join(rundir, "data")
        if not os.path.isdir(self.datadir):
            self.datadir = rundir
        self._lockpath = None
        if lockfile:
            self._acquire_lockfile()
        self.logfile = open(os.path.join(rundir, "output_0-0.txt"), "w")
        self.log = lambda msg: printout(self.logfile, msg)

        p = inputparams_io.read_parameterfile(os.path.join(rundir, "input.txt"))
        self.params = p
        self.opts = opts if opts is not None else kilonova_lte()

        self.ts = inputparams_io.time_init(
            p.tmin, p.tmax, p.ntimesteps, self.opts.timestep_size_method,
            self.opts.fixed_timestep_width, self.opts.timestep_transition_time,
        )

        # --- atomic data ---
        self.log("reading atomic data...")
        self.ad = atomicdata_io.read_atomicdata(
            rundir,
            single_level_top_ion=self.opts.single_level_top_ion,
            single_ground_level=self.opts.single_ground_level,
        )
        # optional recombination-rate calibration: scales phixs before ANY
        # rate table is built (reference: ratecoeff.cc:513-653)
        from .plasma import recombcalibration as _recomb

        if self.opts.nlte_enabled and not self.opts.nlte_all_levels:
            def _sl_first(element, ion, _ad=self.ad, _o=self.opts):
                uii = int(_ad.elem_ion_start[element] + ion)
                nlev = int(_ad.ion_nlevels[uii])
                cap = min(_o.nlte_maxlevel, nlev)
                return cap + 1 if cap + 1 < nlev else None
        else:
            _sl_first = None
        _recomb.apply_recombrate_calibration(
            self.ad, rundir, t_elec=self.opts.recombcalibration_t_elec,
            superlevel_first_level=_sl_first, log=self.log,
        )
        # float32 device mode: the TPU path demotes every device structure at
        # construction time so no float64 array ever lives on (or reads back
        # from) the device (f64 is unsupported/emulated on TPU backends).
        if self.opts.transport_dtype not in ("float64", "float32"):
            raise ValueError(
                f"transport_dtype must be 'float64' or 'float32', got "
                f"{self.opts.transport_dtype!r}"
            )
        self._f32 = self.opts.transport_dtype == "float32"
        self.dad = to_device(self.ad)
        if self._f32:
            self.dad = demote_to_f32(self.dad)
        self.log(
            f"nelements {self.ad.nelements} ions {self.ad.nions_total} "
            f"levels {self.ad.nlevels_total} nlines {self.ad.nlines} "
            f"nbfcontinua {self.ad.nbfcontinua}"
        )

        # --- ejecta model + grid ---
        self.model = model_io.read_model(os.path.join(rundir, "model.txt"), p.tmin)
        self.grid, self.grid_host = grid_mod.grid_init(
            self.model, p.tmin, self.opts.grid_type,
            (self.opts.ncoordgrid_x, self.opts.ncoordgrid_y, self.opts.ncoordgrid_z),
            with_host=True,
        )
        if self._f32:
            self.grid = demote_to_f32(self.grid)
        self.log(
            f"model dim {self.model.dim} npts {self.model.npts_model} "
            f"grid {self.grid.ncoordgrid} nonempty {self.grid.nonempty_npts}"
        )

        # --- decay network + gamma lines ---
        self.dec = decay_mod.init_nuclides(
            list(self.model.nuc_z), list(self.model.nuc_a), self.datadir
        )
        self.dec.t_model = self.model.t_model
        self.gamma = gammadata_io.init_gamma_data(self.dec, folder=rundir, datadir=self.datadir)
        self.log(f"nuclides {self.dec.num_nuclides} decaypaths {self.dec.npaths}")
        _tsetup = _time.time()

        # initial nuclide mass fractions aligned to the network's indices
        colmap = np.array(
            [self.dec.get_nucindex(z, a) for z, a in zip(self.model.nuc_z, self.model.nuc_a)]
        )
        self.initnucmassfrac = np.zeros((self.model.npts_model, self.dec.num_nuclides))
        ok = colmap >= 0
        self.initnucmassfrac[:, colmap[ok]] = self.model.initnucmassfrac[:, ok]

        # --- per-cell initial composition ---
        self.log(f"setup: nucmassfrac done at {_time.time() - _tsetup:.1f}s")
        mgi_of_nonempty = self.grid_host.mgi_of_cell[
            self.grid_host.cell_of_nonemptymgi
        ]
        self.mgi_of_nonempty = mgi_of_nonempty
        ncells = self.grid.nonempty_npts
        abund = model_io.read_abundances(
            os.path.join(rundir, "abundances.txt"), self.model.npts_model,
            self.model.first_cellindex,
        )
        # normalisation rule (reference: grid.cc:575-590)
        threed = self.model.dim == 3
        norm = abund.sum(axis=1)
        norm = np.where(threed | (norm <= 0), 1.0, norm)
        elem_total = abund[:, self.ad.elem_z - 1] / norm[:, None]  # (npts, nelements)

        self.log(f"setup: abundances read at {_time.time() - _tsetup:.1f}s")
        # untracked-stable = total - radioactive isotopes (grid.cc:228-266)
        iso_by_elem = np.zeros((self.model.npts_model, self.ad.nelements))
        for el, z in enumerate(self.ad.elem_z):
            sel = self.dec.nuc_z == z
            if sel.any():
                iso_by_elem[:, el] = self.initnucmassfrac[:, sel].sum(axis=1)
        self.stable_initabund_mgi = np.maximum(elem_total - iso_by_elem, 0.0)
        self.elem_total_init_mgi = self.stable_initabund_mgi + iso_by_elem

        self.stable_initabund = self.stable_initabund_mgi[mgi_of_nonempty]

        # --- rate coefficient tables ---
        self.log(f"composition setup took {_time.time() - _tsetup:.1f}s")
        self.log("building rate coefficient tables...")
        # ARTIS_RATECOEFF_CACHE_DIR: shared cross-run cache location (the
        # md5 of the atomic inputs + table params still gates validity, so a
        # stale file can never be used) — bench/profile tools run the same
        # synthetic scene from fresh tmpdirs and would otherwise pay the
        # device-side LUT integration on every launch
        _rc_cache = os.environ.get("ARTIS_RATECOEFF_CACHE_DIR") or rundir
        os.makedirs(_rc_cache, exist_ok=True)
        self.rc = ratecoeff_mod.build_tables(
            self.dad, self.opts.tablesize, self.opts.mintemp, self.opts.maxtemp,
            self.opts.use_lut_photoion, self.opts.use_lut_bfheating,
            cache_dir=_rc_cache,
        )
        self.aux = macroatom_mod.build_aux(self.dad)
        if self._f32:
            self.rc = demote_to_f32(self.rc)
            self.aux = demote_to_f32(self.aux)

        # --- cell state ---
        rho_tmin = self.model.rho_tmin[mgi_of_nonempty]
        self.rho_tmin_nonempty = rho_tmin
        self.cells = cellstate_mod.init_cellstate(
            self.dad, ncells, rho_tmin, self.model.ffegrp[mgi_of_nonempty],
            self.opts.mintemp, self.opts.maxtemp,
        )
        self._calculate_kappagrey_initial()

        # --- initial temperatures from trapped decay energy (grid.cc:918-965) ---
        endecay = decay_mod.endecay_t0_to_time_withexpansion(
            self.dec, self.initnucmassfrac[mgi_of_nonempty], self.ts.mid[0]
        )
        if self.opts.initial_packets_on and self.opts.use_model_initial_energy and self.model.initenergyq is not None:
            endecay = endecay + self.model.initenergyq[mgi_of_nonempty]
        fdtype = jnp.float32 if self._f32 else jnp.float64
        self.cells = cellstate_mod.assign_initial_temperatures(
            self.cells, jnp.asarray(rho_tmin, dtype=fdtype),
            jnp.asarray(endecay, dtype=fdtype), p.tmin,
            float(self.ts.mid[0]), self.opts.mintemp, self.opts.maxtemp,
        )
        if self._f32:
            self.cells = demote_to_f32(self.cells)

        # --- packets ---
        self.log("placing pellets...")
        self.pellet_tables = packets_mod.make_pellet_tables(
            self.grid, self.dec, self.initnucmassfrac,
            self.model.initenergyq, self.opts, p.tmin, p.tmax,
            grid_host=self.grid_host,
        )
        if self._f32:
            self.pellet_tables = demote_to_f32(self.pellet_tables)
        # packet energies live on device in units of e0 (erg values overflow
        # f32); every host-side consumer rescales by this factor
        self._e0 = float(self.pellet_tables.e0)
        seed = p.pre_zseed if p.pre_zseed > 0 else 42
        self.base_key = jax.random.PRNGKey(seed)
        self.state = jax.jit(
            packets_mod.packet_init, static_argnames=("opts",)
        )(jax.random.fold_in(self.base_key, 0), self.grid, self.pellet_tables, self.opts)
        self.log(f"packets {self.opts.npkts} etot {self.pellet_tables.norm:g} erg")

        # timesteps.out (reference: input.cc:1980-1988 write_timestep_file)
        with open(os.path.join(rundir, "timesteps.out"), "w") as f:
            f.write("#timestep tstart_days tmid_days twidth_days\n")
            for n in range(p.ntimesteps):
                f.write(
                    f"{n} {self.ts.start[n] / DAY:g} {self.ts.mid[n] / DAY:g} "
                    f"{self.ts.width[n] / DAY:g}\n"
                )
        # grid.out (reference: grid.cc:2258-2267): propcell -> modelgridindex
        with open(os.path.join(rundir, "grid.out"), "w") as f:
            mgi_all = self.grid_host.mgi_of_cell
            for n in range(int(self.grid.ngrid)):
                if mgi_all[n] != self.model.npts_model:
                    f.write(f"{n} {int(mgi_all[n])}\n")
        if not p.simulation_continued_from_saved:
            # gammalinelist.out (reference: gammapkt.cc:194-206)
            gd = self.gamma
            with open(os.path.join(rundir, "gammalinelist.out"), "w") as f:
                f.write("#index nucindex Z A nucgammmaindex en_gamma_mev "
                        "gammaline_probability\n")
                for i in range(len(gd.sorted_energy)):
                    ni = int(gd.sorted_nucindex[i])
                    gi = int(gd.sorted_nucgammaindex[i])
                    f.write(
                        f"{i} {ni} {int(self.dec.nuc_z[ni])} "
                        f"{int(self.dec.nuc_a[ni])} {gi} "
                        f"{gd.sorted_energy[i] / MEV:g} "
                        f"{gd.line_prob[ni, gi]:g}\n"
                    )
            # bflist.out (reference: input.cc:1373-1414 write_bflist_file):
            # continuum emission-type index k -> (element, ion, level,
            # upperionlevel), k ordered by lower unique level exactly as the
            # macro-atom emtype encoding
            ad = self.ad
            with open(os.path.join(rundir, "bflist.out"), "w") as f:
                f.write(f"{ad.nbfcontinua}\n")
                if ad.nbfcontinua:
                    cont_uii = (ad.elem_ion_start[ad.cont_element].astype(np.int64)
                                + ad.cont_ion)
                    lower_unique = ad.ion_level_start[cont_uii] + ad.cont_level
                    order_l = np.argsort(lower_unique, kind="stable")
                    for k, ci in enumerate(order_l):
                        f.write(
                            f"{k} {int(ad.cont_element[ci])} "
                            f"{int(ad.cont_ion[ci])} {int(ad.cont_level[ci])} "
                            f"{int(ad.cont_upperlevel[ci])}\n"
                        )
        if self.opts.record_linestat and not p.simulation_continued_from_saved:
            # linestat.out header rows (reference: sn3d.cc:64-98)
            with open(os.path.join(rundir, "linestat.out"), "w") as f:
                lam = CLIGHT / np.asarray(self.ad.line_nu)
                zrow = np.asarray(self.ad.elem_z)[np.asarray(self.ad.line_element)]
                uii = np.asarray(self.ad.elem_ion_start)[
                    np.asarray(self.ad.line_element)] + np.asarray(self.ad.line_ion)
                stages = np.concatenate([
                    np.arange(s0, s0 + n)
                    for s0, n in zip(self.ad.elem_ion_stage0, self.ad.elem_nions)
                ])[uii] if hasattr(self.ad, "elem_ion_stage0") else np.asarray(self.dad.ion_stage)[uii]
                for row in (lam, zrow, stages,
                            np.asarray(self.ad.line_upper) + 1,
                            np.asarray(self.ad.line_lower) + 1):
                    f.write(" ".join(f"{v:g}" for v in row) + "\n")

        # estimators & spectra
        self._nradbins = self.opts.radfieldbincount if self.opts.multibin_radfield else 1
        self._vspec_shape = (
            (self.opts.vpkt_nobs, 1, self.opts.vpkt_vmtbins,
             self.opts.vpkt_vmnubins, 3)
            if self.opts.vpkt_on else (1, 1, 1, 1, 3)
        )
        self._nbfrate = (
            max(self.ad.nbfcontinua, 1) if self.opts.detailed_bf_estimators_on else 1
        )
        self._nbfrate_cells = ncells if self.opts.detailed_bf_estimators_on else 1
        # detailed line J_b_lu estimator selection (radfield.cc:520-552):
        # selected element's lines from low-lying lower levels
        if self.opts.detailed_line_estimators_on and self.ad.nlines > 0:
            line_elem_z = np.asarray(self.ad.elem_z)[np.asarray(self.ad.line_element)]
            line_lower_local = np.asarray(self.ad.line_lower)
            line_a = np.asarray(self.ad.line_A)
            pick = (line_lower_local <= self.opts.jblue_max_lowerlevel) & (line_a > 0)
            if self.opts.jblue_elem_z > 0:
                pick &= line_elem_z == self.opts.jblue_elem_z
            self.jblue_lineindices = np.nonzero(pick)[0].astype(np.int32)
            jblue_of_line = np.full(self.ad.nlines, -1, np.int32)
            jblue_of_line[self.jblue_lineindices] = np.arange(
                len(self.jblue_lineindices), dtype=np.int32
            )
            self.jblue_of_line = jnp.asarray(jblue_of_line)
            self._njblue = max(len(self.jblue_lineindices), 1)
            self._njblue_cells = ncells
            self.log(f"detailed line estimators: {len(self.jblue_lineindices)} lines")
        else:
            self.jblue_lineindices = np.zeros(0, np.int32)
            self.jblue_of_line = jnp.full((max(self.ad.nlines, 1),), -1, jnp.int32)
            self._njblue = 1
            self._njblue_cells = 1
        self._nion_stats_cells = ncells if self.opts.track_ion_stats else 1
        self._nion_stats_ions = (
            max(self.ad.nions_total, 1) if self.opts.track_ion_stats else 1
        )
        self._nion_stats = (
            stats_mod.N_ION_STATS if self.opts.track_ion_stats else 1
        )
        self._vgrid_shape = (1, 1, 1, 1, 3)  # refined after vpkt cfg is read
        self._nlinestat = (
            max(self.ad.nlines, 1) if self.opts.record_linestat else 1
        )
        self._nmalog = (
            max(self.opts.log_macroatom_capacity, 1)
            if self.opts.log_macroatom else 1
        )
        self.est = zero_estimators(
            ncells, max(self.ad.nbfcontinua_ground, 1), dtype=fdtype,
            nradfieldbins=self._nradbins, vspec_shape=self._vspec_shape,
            nbfrate=self._nbfrate, nbfrate_cells=self._nbfrate_cells,
            njblue=self._njblue, njblue_cells=self._njblue_cells,
            nion_stats_cells=self._nion_stats_cells,
            nion_stats_ions=self._nion_stats_ions,
            nion_stats=self._nion_stats,
            vgrid_shape=self._vgrid_shape,
            nlinestat=self._nlinestat,
            nmalog=self._nmalog,
        )
        self.prev_bfrate_normed = None
        self._last_levelpops = None
        self.prev_est: Estimators | None = None
        self.lc_lum = np.zeros(p.ntimesteps)
        self.lc_lumcmf = np.zeros(p.ntimesteps)
        self.gamma_dep_ts = np.zeros(p.ntimesteps)
        self.cmf_lum_ts = np.zeros(p.ntimesteps)
        self.dep_ts = {k: np.zeros(p.ntimesteps) for k in (
            "electron", "positron", "alpha",
            "electron_discrete", "positron_discrete", "alpha_discrete",
            "gamma_emission", "positron_emission", "electron_emission",
            "alpha_emission",
        )}
        self.spec = spectrum_mod.init_spectra(self.opts.nu_min_r, self.opts.nu_max_r, p.ntimesteps)
        self._escaped_counted = np.zeros(self.opts.npkts, dtype=bool)

        # XCOM gamma photoionisation tables (reference: gammapkt.cc:209-256)
        if self.opts.use_xcom_gammaphotoion:
            xe, xs, _xl = gammadata_io.read_xcom_photoion(
                os.path.join(self.datadir, "xcom_photoion_data.txt"),
                list(self.ad.elem_z),
            )
            self._xcom_energy = jnp.asarray(xe, dtype=fdtype)
            self._xcom_sigma = jnp.asarray(xs, dtype=fdtype)
        else:
            self._xcom_energy = jnp.ones((1, 1), dtype=fdtype)
            self._xcom_sigma = jnp.ones((1, 1), dtype=fdtype)

        # analytic-thermalisation scalars (reference: grid.h:131-142
        # get_ejecta_kinetic_energy; gammapkt.cc:832-837; update_packets.cc:44)
        from .transport import thermalisation as therm_mod
        vol_tmin_all = grid_mod.get_cell_volume_tmin(self.grid, self.grid_host)
        assoc_vol_mgi = np.zeros(self.grid.npts_model + 1)
        np.add.at(assoc_vol_mgi, self.grid_host.mgi_of_cell, vol_tmin_all)
        self._assoc_vol_model = assoc_vol_mgi[: self.model.npts_model]
        m_cell = self.model.rho_tmin * self._assoc_vol_model
        self.mtot_input = float(m_cell.sum())
        radial_pos_avg = self.grid_host.initial_radial_pos_sum_mgi[
            : self.model.npts_model
        ] / np.maximum(self.grid_host.numpropcells_mgi[: self.model.npts_model], 1)
        self.e_kin = float(np.sum(0.5 * m_cell * (radial_pos_avg / p.tmin) ** 2))
        self._barnes_t_ineff = therm_mod.barnes_t_ineff(max(self.mtot_input, 1e-30), max(self.e_kin, 1e-30))
        self._barnes_tau_lepton = therm_mod.barnes_tau_ineff_particle(
            max(self.mtot_input, 1e-30), max(self.e_kin, 1e-30), alpha=False)
        self._barnes_tau_alpha = therm_mod.barnes_tau_ineff_particle(
            max(self.mtot_input, 1e-30), max(self.e_kin, 1e-30), alpha=True)

        # gamma tables on device
        self.gammaline_energy = jnp.asarray(self.gamma.line_energy, dtype=fdtype)
        self.gammaline_cumfrac = jnp.asarray(self.gamma.line_cumfrac, dtype=fdtype)
        self.gammaline_nlines = jnp.asarray(self.gamma.nuc_nlines)

        if p.simulation_continued_from_saved:
            self.log(f"resuming from checkpoint at timestep {p.timestep_start}")
            self.load_checkpoint(p.timestep_start)

        self._transport_jit = jax.jit(
            engine_mod.transport_timestep,
            static_argnames=(
                "opts", "gamma_kappagrey", "opacity_case",
                "kpktdiffusion_timescale", "apply_kpkt_diffusion", "max_iters",
            ),
        )
        self.nlte_indices = (
            nltepop_mod.build_indices(self.dad, self.opts)
            if self.opts.nlte_enabled else None
        )
        self.ntd = None
        self.nt_wf = None
        if self.opts.nt_on:
            import numpy as _np
            self.nt_wf = (
                jnp.asarray(nonthermal_mod.wf_oneoverw_factor(
                    self.ad, self.dad, self.datadir)),
                jnp.asarray(_np.asarray(self.ad.elem_z, _np.float64)),
            )
        if self.opts.nt_on and self.opts.nt_solve_spencerfano:
            self.ntd = nonthermal_mod.build_nonthermal_data(
                self.ad, self.dad, self.datadir,
                sf_points=self.opts.sf_points, sf_emin=self.opts.sf_emin,
                sf_emax=self.opts.sf_emax,
                nt_max_auger=self.opts.nt_max_auger_electrons,
                maxnlevels_lower=self.opts.ntexcitation_maxnlevels_lower,
                maxnlevels_upper=self.opts.ntexcitation_maxnlevels_upper,
            )
            if self._f32:
                self.ntd = demote_to_f32(self.ntd)
        from .transport import vpkt as vpkt_mod
        self.vpkt_cfg = None
        if self.opts.vpkt_on:
            vpkt_path = os.path.join(rundir, "vpkt.txt")
            if os.path.exists(vpkt_path):
                self.vpkt_cfg = vpkt_mod.read_vpkt_config(
                    vpkt_path, p.tmin, p.tmax, self.opts.vpkt_vmtbins,
                    self.opts.vpkt_vmnubins,
                )
            else:
                self.vpkt_cfg = vpkt_mod.default_vpkt_config(
                    p.tmin, p.tmax, self.opts.vpkt_nobs,
                    self.opts.vpkt_vmtbins, self.opts.vpkt_vmnubins,
                )
            if self._f32:
                self.vpkt_cfg = demote_to_f32(self.vpkt_cfg)
            self.log(
                f"vpkt: {self.vpkt_cfg.nobs} observers, "
                f"{self.vpkt_cfg.nspectra} spectra each"
            )
        if self.opts.vpkt_on and self.vpkt_cfg is not None:
            # the real observer/channel counts come from vpkt.txt, which is
            # read after the estimator shapes were first sized
            self._vspec_shape = (
                self.vpkt_cfg.nobs, self.vpkt_cfg.nspectra,
                self.opts.vpkt_vmtbins, self.opts.vpkt_vmnubins, 3,
            )
            self.est = self.est.replace(
                vspec=jnp.zeros(self._vspec_shape,
                                jnp.float32 if self._f32 else jnp.float64))
        if (self.opts.vpkt_on and self.vpkt_cfg is not None
                and self.vpkt_cfg.vgrid_on):
            self._vgrid_shape = (
                self.vpkt_cfg.nobs, int(self.vpkt_cfg.vgrid_numin.shape[0]),
                self.vpkt_cfg.vgrid_ny, self.vpkt_cfg.vgrid_nz, 3,
            )
            # re-zero with the real map shape
            self.est = self.est.replace(
                vgrid=jnp.zeros(self._vgrid_shape,
                                jnp.float32 if self._f32 else jnp.float64))
        if not hasattr(self, "_vspec_total"):  # load_checkpoint may have set it
            self._vspec_total = np.zeros(self._vspec_shape, dtype=np.float64)
        if not hasattr(self, "_vgrid_total"):
            self._vgrid_total = np.zeros(self._vgrid_shape, dtype=np.float64)

        self._build_plasma_jit()

    def _build_plasma_jit(self):
        """(Re)build the jitted plasma update from the CURRENT attribute
        arrays — called again after the host-setup bulk move so the closure
        captures the accelerator copies, not the CPU-committed originals."""
        import functools as _ft
        self._plasma_fn = _ft.partial(
            _plasma_update_device, nlte_indices=self.nlte_indices,
            ntd=self.ntd, nt_wf=self.nt_wf,
            vpkt_exclude=(self.vpkt_cfg.exclude
                          if self.vpkt_cfg is not None else ()),
            num_lte_timesteps=int(self.params.num_lte_timesteps),
        )
        self._plasma_jit = jax.jit(
            self._plasma_fn,
            static_argnames=("opts", "mode", "radfield_use_bins",
                             "nt_sf_skip"),
        )

    def _setup_mesh(self):
        """Build the device mesh for the production driver (round-5: the
        TPU-native equivalent of the reference's MPI-inside-every-timestep,
        sn3d.cc:197-348 — packet transport sharded over the mesh with psum'd
        estimators, the plasma solve cell-domain-decomposed over the same
        devices).

        ``mesh`` request semantics: None = single device (off); "auto" = all
        available devices if more than one; int n = first n devices; a
        jax.sharding.Mesh = used as-is (must be 1-axis).
        """
        from .parallel import mesh as mesh_mod

        req = self._mesh_request
        self.mesh = None
        if req is None:
            return
        if isinstance(req, jax.sharding.Mesh):
            self.mesh = req
        else:
            devices = jax.devices()
            if req == "auto":
                if len(devices) <= 1:
                    return
                use = devices
            else:
                n = int(req)
                if n <= 1:
                    return
                if n > len(devices):
                    raise ValueError(
                        f"mesh={n} devices requested but only "
                        f"{len(devices)} available")
                use = devices[:n]
            self.mesh = mesh_mod.make_mesh(use)
        ndev = self.mesh.devices.size
        if self.opts.npkts % ndev != 0:
            raise ValueError(
                f"npkts={self.opts.npkts} must divide the mesh size {ndev}")
        if self.opts.log_macroatom:
            # the event-row buffer is positional: a psum over shards would
            # sum unrelated rows (the reference's log is per-rank too,
            # macroatom_%.4d.out); disable rather than corrupt
            self.opts = self.opts.replace(log_macroatom=False)
            self.log("WARNING: log_macroatom is single-device only; "
                     "disabled for the mesh run")
        self.log(f"mesh: {ndev} devices, packet axis "
                 f"{self.opts.npkts // ndev} packets/device")
        # sharded dispatchers with the same call signatures as the
        # single-device jits they replace
        self._transport_jit = mesh_mod.make_transport_dispatch(self.mesh)
        self._plasma_jit = mesh_mod.make_plasma_dispatch(
            self.mesh, self._plasma_fn)
        # lay the packet state out over the packet axis up front (one
        # resharding transfer; all later transport dispatches are in-place)
        self.state = jax.device_put(
            self.state, mesh_mod.packet_sharding(self.mesh, self.state))

    # ------------------------------------------------------------------
    def _calculate_kappagrey_initial(self):
        """Grey opacities at t=tmin (reference: grid.cc:1722-1834)."""
        p = self.params
        mgi = self.mgi_of_nonempty
        rho_tmin = self.model.rho_tmin[mgi]
        ffegrp = self.model.ffegrp[mgi]
        case = p.opacity_case
        rho_sum = rho_tmin.sum()
        fe_sum = ffegrp.sum()

        if case == 0:
            kappa = np.full_like(rho_tmin, GREY_OP)
        elif case in (1, 4):
            mtot, mfegroup = self._total_masses()
            kappa = (0.9 * ffegrp + 0.1) * GREY_OP / (0.9 * mfegroup / mtot + 0.1)
        elif case == 2:
            opcase2_normal = GREY_OP * rho_sum / (0.9 * fe_sum + 0.1 * self.grid.ngrid)
            kappa = opcase2_normal / rho_tmin * (0.9 * ffegrp + 0.1)
        elif case == 3:
            # rho_crit is recomputed at every timestep in update_grid (the
            # per-timestep regime switch, update_grid.cc:1090-1097)
            kappagrey = 0.9 * ffegrp + 0.1
            opcase3_sum = (kappagrey * rho_tmin).sum()
            self.opcase3_normal = GREY_OP * rho_sum / opcase3_sum
            kappa = kappagrey * self.opcase3_normal
        elif case == 5:
            ye = self.model.init_ye[mgi] if self.model.init_ye is not None else np.full(len(mgi), 0.3)
            kappa = np.select(
                [ye <= 0.1, ye <= 0.15, ye <= 0.2, ye <= 0.25, ye <= 0.3, ye <= 0.35],
                [19.5, 32.2, 22.3, 5.6, 5.36, 3.3], default=0.96,
            )
        elif case == 6:
            # Just+2022 T_R/lanthanide-fraction kappa at t=tmin; recomputed
            # every timestep in update_grid (update_grid.cc:885-887)
            elem_massfrac0, _ = decay_mod.update_abundances(
                self.dec, self.initnucmassfrac[mgi], self.stable_initabund,
                self.ad.elem_meanweight_init, np.asarray(self.ad.elem_z),
                self.params.tmin,
            )
            kappa = _kappagrey_just2022(
                self._lanthanide_massfrac(elem_massfrac0),
                np.asarray(self.cells.TR),
            )
        else:
            kappa = np.full_like(rho_tmin, GREY_OP)
        self._kappagrey_np = np.asarray(kappa)
        self.cells = self.cells.replace(kappagrey=jnp.asarray(kappa))

    def _lanthanide_massfrac(self, elem_massfrac):
        """Summed lanthanide (57 <= Z <= 71) mass fraction per cell
        (reference: grid.cc:1795-1801)."""
        zarr = np.asarray(self.ad.elem_z)
        lan = (zarr >= 57) & (zarr <= 71)
        return np.asarray(elem_massfrac)[:, lan].sum(axis=1)

    def _total_masses(self):
        vol = model_io.model_cell_volume_at_tmin(self.model, self.params.tmin)
        mtot = (self.model.rho_tmin * vol).sum()
        mfegroup = (self.model.rho_tmin * vol * self.model.ffegrp).sum()
        return mtot, mfegroup

    # ------------------------------------------------------------------
    def _plasma_call(self, nts: int, mode_force=None, prev_est="self"):
        """Normalise the previous timestep's estimators and invoke the jitted
        plasma update (factored out of update_grid so warm_plasma can
        pre-compile every (mode, signature) this run will dispatch).

        Returns (mode, results-tuple)."""
        p = self.params
        opts = self.opts
        tmid = float(self.ts.mid[nts])
        ncells = self.grid.nonempty_npts
        mgi = self.mgi_of_nonempty
        lte_mode = nts < p.num_lte_timesteps
        if isinstance(prev_est, str):
            prev_est = self.prev_est

        # "first" means no previous transport estimators exist; a RESUMED run
        # restores prev_est from the checkpoint and must use it (the reference
        # reads the LUT estimators back from gridsave, grid.cc:865-905)
        first_ts = prev_est is None
        if first_ts:
            j_norm = jnp.zeros(ncells)
            nuj_norm = jnp.zeros(ncells)
        else:
            # normalise estimators from the previous timestep's transport
            nts_prev = nts - 1
            deltat = float(self.ts.width[nts_prev])
            if not hasattr(self, "_assoc_vol"):
                vol_tmin = grid_mod.get_cell_volume_tmin(self.grid, self.grid_host)
                assoc_vol = np.zeros(self.grid.npts_model + 1)
                np.add.at(assoc_vol, self.grid_host.mgi_of_cell, vol_tmin)
                self._assoc_vol = assoc_vol
            deltav = self._assoc_vol[mgi] * (float(self.ts.mid[nts_prev]) / p.tmin) ** 3
            norm4pi = self._e0 * ONEOVER4PI / (deltav * deltat)  # nprocs folded into psum
            j_norm = prev_est.j * jnp.asarray(norm4pi)
            nuj_norm = prev_est.nuj * jnp.asarray(norm4pi)

        # deposition heating rate density [erg/s/cm3]: path estimators
        # normalised, NT heating fraction = 1 with the NT solver off
        # (nonthermal.cc:2096-2159)
        if first_ts:
            ffheating_norm = jnp.zeros(ncells)
            dep_heating = jnp.zeros(ncells)
            mode = "first"
        else:
            ffheating_norm = prev_est.ffheating * jnp.asarray(norm4pi * FOURPI)
            dep_norm = jnp.asarray(norm4pi * FOURPI)
            dep_heating = (
                prev_est.dep_gamma + prev_est.dep_positron
                + prev_est.dep_electron + prev_est.dep_alpha
            ) * dep_norm
            mode = "lte" if lte_mode or bool(np.all(np.asarray(self.cells.thick) == 1)) else "nlte"
        if mode_force is not None:
            mode = mode_force

        if self._f32:
            j_norm = demote_to_f32(j_norm)
            nuj_norm = demote_to_f32(nuj_norm)
            ffheating_norm = demote_to_f32(ffheating_norm)
            dep_heating = demote_to_f32(dep_heating)
        if self.opts.multibin_radfield and prev_est is not None:
            normb = jnp.asarray(norm4pi)[:, None] if not first_ts else 0.0
            binj_norm = prev_est.radfieldbin_j * normb
            binnuj_norm = prev_est.radfieldbin_nuj * normb
            bincount = prev_est.radfieldbin_count
            if self._f32:
                binj_norm = demote_to_f32(binj_norm)
                binnuj_norm = demote_to_f32(binnuj_norm)
        else:
            binj_norm = binnuj_norm = bincount = None
        gammaest_norm = None
        if (self.opts.use_lut_photoion and prev_est is not None
                and not first_ts):
            from .constants import H as _H
            gammaest_norm = prev_est.gammaestimator * jnp.asarray(
                norm4pi * FOURPI / _H
            )[:, None]
            if self._f32:
                gammaest_norm = demote_to_f32(gammaest_norm)
        bfrate_normed = None
        if (self.opts.detailed_bf_estimators_on and prev_est is not None
                and not first_ts
                and nts >= self.opts.detailed_bf_estimators_usefromtimestep):
            from .constants import H as _H
            # prev_bfrate_normed = bfrate_raw * estimator_normfactor / H
            # (reference: radfield.cc:946)
            bfrate_normed = prev_est.bfrate * jnp.asarray(
                norm4pi * FOURPI / _H
            )[:, None]
            if self._f32:
                bfrate_normed = demote_to_f32(bfrate_normed)
        jblue_normed = None
        jblue_contribcount = None
        if (self.opts.detailed_line_estimators_on and prev_est is not None
                and not first_ts):
            # prev_Jb_lu_normed = raw * estimator_normfactor_over4pi
            # (reference: radfield.cc:919)
            jb_arr = prev_est.jblue_raw * jnp.asarray(norm4pi)[:, None]
            jblue_contribcount = prev_est.jblue_count
            if self._f32:
                jb_arr = demote_to_f32(jb_arr)
            jblue_normed = (self.jblue_of_line, jb_arr)
        results = self._plasma_jit(
            self.dad, self.rc, self.cells, opts, j_norm, nuj_norm,
            jnp.asarray(tmid, dtype=jnp.float32 if self._f32 else jnp.float64),
            ffheating_norm, dep_heating, mode=mode,
            binj_norm=binj_norm, binnuj_norm=binnuj_norm, bincount=bincount,
            gammaest_norm=gammaest_norm, bfrate_normed=bfrate_normed,
            jblue_normed=jblue_normed, jblue_contribcount=jblue_contribcount,
            sf_carry=self._sf_carry_or_default(),
            nts_dev=jnp.asarray(nts, jnp.int32),
            radfield_use_bins=bool(nts >= self.opts.first_nlte_radfield_timestep),
            nt_sf_skip=bool(nts == self.params.num_lte_timesteps),
        )
        return mode, results

    def _sf_carry_or_default(self):
        """The cross-timestep Spencer-Fano carry (sf_max_ts_between_solutions
        reuse, nonthermal.cc:2432-2442), or a fresh default-state dict so the
        jit signature stays uniform across timesteps."""
        if self.ntd is None:
            return None
        carry = getattr(self, "_sf_carry", None)
        if carry is not None:
            return carry
        naug = self.opts.nt_max_auger_electrons + 1
        nexc = (self.ntd.exc_upper.shape[0]
                if self.opts.nt_excitation_on else 1)
        return sf_default_carry(
            self.grid.nonempty_npts, self.dad.nions_total, naug, nexc,
            jnp.float32 if self._f32 else jnp.float64)

    def warm_plasma(self, nts_start: int):
        """Pre-compile the plasma-update programs for every (mode, static
        signature) the run from nts_start can dispatch, so no XLA compile
        fires inside a timestep's grid update (a grey->non-grey mode switch
        used to cost ~15 s at the first non-grey timestep on TPU).

        Signatures are enumerated from the timestep schedule; the dynamic
        all-cells-thick override only ever demotes "nlte" to "lte", which is
        warmed anyway.  Results are discarded; driver state is untouched."""
        p = self.params
        first_done = self.prev_est is not None
        seen = set()
        todo = []  # (mode, representative nts) per unique static signature
        for nts in range(nts_start, p.timestep_finish):
            if not first_done and nts == nts_start:
                mode = "first"
            else:
                mode = "lte" if nts < p.num_lte_timesteps else "nlte"
            sig = (mode,
                   bool(nts >= self.opts.first_nlte_radfield_timestep),
                   bool(nts == p.num_lte_timesteps))
            if sig not in seen:
                seen.add(sig)
                todo.append((mode, nts))
        t0 = _time.time()
        zero_est = self._zero_est()
        for mode, nts in todo:
            pe = None if mode == "first" else zero_est
            mode_out, results = self._plasma_call(
                nts, mode_force=(None if mode == "first" else mode),
                prev_est=pe)
            jax.block_until_ready(results[0].Te)
        self.log(
            f"warm_plasma: {len(todo)} plasma programs compiled in "
            f"{_time.time() - t0:.1f}s "
            f"(modes {[m for m, _ in todo]})"
        )

    # ------------------------------------------------------------------
    def update_grid(self, nts: int):
        """Per-timestep plasma update (reference: update_grid.cc:869-1072)."""
        p = self.params
        opts = self.opts
        tmid = float(self.ts.mid[nts])
        tratmid = tmid / p.tmin
        ncells = self.grid.nonempty_npts
        mgi = self.mgi_of_nonempty
        lte_mode = nts < p.num_lte_timesteps

        # density update
        rho = self.rho_tmin_nonempty / tratmid**3
        self.cells = self.cells.replace(rho=jnp.asarray(rho))

        if p.opacity_case == 3:
            # critical density where tau_sobolev(3000 A) == 1 at t_mid: above
            # it kappagrey switches from rho-proportional to the
            # rho-independent regime (update_grid.cc:1090-1097, 893-907)
            from .constants import ME, QE
            self.rho_crit = (
                ME * CLIGHT * 56.0 * MH
                / (PI * QE**2 * p.rho_crit_para * 3000e-8 * tmid)
            )
            ffegrp_ne = self.model.ffegrp[mgi]
            kgrey = self.opcase3_normal * (0.9 * ffegrp_ne + 0.1)
            kgrey = np.where(
                rho > self.rho_crit, kgrey * self.rho_crit / rho, kgrey)
            self._kappagrey_np = np.asarray(kgrey)
            self.cells = self.cells.replace(kappagrey=jnp.asarray(kgrey))

        # radioactive abundances (host, vectorised over cells)
        elem_massfrac, elem_meanweight = decay_mod.update_abundances(
            self.dec, self.initnucmassfrac[mgi], self.stable_initabund,
            self.ad.elem_meanweight_init, np.asarray(self.ad.elem_z), tmid,
        )
        self.cells = self.cells.replace(
            elem_massfrac=jnp.asarray(elem_massfrac),
            elem_meanweight=jnp.asarray(elem_meanweight),
        )
        nnetot = cellstate_mod.calculate_nnetot(self.cells, self.dad)
        self.cells = self.cells.replace(nnetot=nnetot)

        if p.opacity_case == 6:
            # Just+2022 kappa recomputed per timestep from the decayed
            # lanthanide fraction and the previous fit's T_R — the reference
            # recomputes BEFORE the new radiation-field fits
            # (update_grid.cc:885-887 -> grid.cc:1790-1820)
            kgrey6 = _kappagrey_just2022(
                self._lanthanide_massfrac(elem_massfrac),
                np.asarray(self.cells.TR))
            self._kappagrey_np = np.asarray(kgrey6)
            self.cells = self.cells.replace(kappagrey=jnp.asarray(kgrey6))

        mode, results = self._plasma_call(nts)
        (self.cells, levelpops, nnion, chi_ff_part, self.rates,
         tau_sob, bf_a, bf_dep, nt_fibi, nt_fi, nt_fe, nt_ionenfrac,
         nt_exc_fracdep_cum,
         self.radfieldbin_tr, self.radfieldbin_w,
         vcum_tau, vcum_taunu, expo_kappa, expo_pc,
         expo_wcum, expo_binoff, nlte_fracdiff, nlte_iters,
         sf_carry_out) = results
        if self.ntd is not None:
            self._sf_carry = sf_carry_out
        if mode == "nlte" and self.opts.nlte_enabled and self.nlte_indices:
            fdmax = float(jnp.max(nlte_fracdiff))
            itmax = int(jnp.max(nlte_iters))
            self.log(
                f"timestep {nts}: NLTE outer loop max fracdiff "
                f"{fdmax:.4g} after <= {itmax} iterations"
                + ("" if fdmax <= self.opts.nlte_convergence_tol
                   else f" (NOT converged to {self.opts.nlte_convergence_tol})")
            )

        # grey optical depth and thick flags (update_grid.cc:1007-1035)
        kappagrey = self._kappagrey_np
        assoc_cells = self.grid_host.numpropcells_mgi[mgi]
        radial_pos = (
            self.grid_host.initial_radial_pos_sum_mgi[mgi] * tratmid / assoc_cells
        )
        dist_to_obs = np.maximum(0.0, self.grid.rmax * tratmid - radial_pos)
        grey_depth = kappagrey * rho * dist_to_obs
        # thick flag: 1 = grey transport, 2 = vpkt-only thick (virtual
        # packets die, real packets transport normally), 0 = detailed.
        # The grey-depth rule decides for every opacity case — the
        # reference's opacity_case<4 thick=1 (update_grid.cc:893-896) is
        # overwritten by this final assignment (update_grid.cc:1027-1035).
        grey1 = (grey_depth >= p.cell_is_optically_thick) \
            & (nts < p.num_grey_timesteps)
        thick = grey1.astype(np.int32)
        if self.opts.vpkt_on and self.vpkt_cfg is not None:
            tv = (self.vpkt_cfg.thick_vpkt if self.vpkt_cfg.thick_vpkt >= 0
                  else p.cell_is_optically_thick)
            thick[~grey1 & (grey_depth > tv)] = 2
        self.cells = self.cells.replace(
            thick=jnp.asarray(thick), grey_depth=jnp.asarray(grey_depth)
        )
        if self._f32:
            self.cells = demote_to_f32(self.cells)

        fdtype = jnp.float32 if self._f32 else jnp.float64
        self._last_levelpops = levelpops
        ctx = engine_mod.StepContext(
            levelpops=levelpops,
            nnion=nnion,
            chi_ff_nnionpart=chi_ff_part,
            tau_sob_factor=tau_sob,
            bf_a=bf_a,
            bf_dep=bf_dep,
            expopac_kappa=expo_kappa,
            expopac_planck_cum=expo_pc,
            expopac_wcum=expo_wcum,
            expopac_binoffsets=expo_binoff,
            elem_numberdens=(
                self.cells.elem_numberdens()
                if self.opts.use_xcom_gammaphotoion
                else jnp.zeros((self.grid.nonempty_npts, 1), fdtype)
            ),
            xcom_energy=self._xcom_energy,
            xcom_sigma=self._xcom_sigma,
            vpkt_cum_tau=vcum_tau,
            vpkt_cum_taunu=vcum_taunu,
            vpkt_cfg=self.vpkt_cfg,
            nt_frac_ion_by_ion=nt_fibi,
            nt_frac_ionization=nt_fi,
            nt_frac_excitation=nt_fe,
            nt_exc_fracdep_cum=nt_exc_fracdep_cum,
            nt_exc_upper=(
                self.ntd.exc_upper.astype(jnp.int32)
                if (self.ntd is not None and self.opts.nt_excitation_on)
                else jnp.zeros((1,), jnp.int32)
            ),
            jblue_of_line=self.jblue_of_line,
            nt_ionenfrac_auger=nt_ionenfrac,
            barnes_t_ineff=jnp.asarray(self._barnes_t_ineff, dtype=fdtype),
            barnes_tau_ineff_lepton=jnp.asarray(self._barnes_tau_lepton, dtype=fdtype),
            barnes_tau_ineff_alpha=jnp.asarray(self._barnes_tau_alpha, dtype=fdtype),
            rho_t_mgi=jnp.asarray(
                np.concatenate([self.model.rho_tmin, [0.0]])
                * (self.params.tmin / tmid) ** 3, dtype=fdtype),
            rho_tmin_mgi=jnp.asarray(
                np.concatenate([self.model.rho_tmin, [0.0]]), dtype=fdtype),
            tmin=jnp.asarray(self.params.tmin, dtype=fdtype),
            gammaline_energy=jnp.asarray(self.gammaline_energy, dtype=fdtype),
            gammaline_cumfrac=jnp.asarray(self.gammaline_cumfrac, dtype=fdtype),
            gammaline_nlines=self.gammaline_nlines,
            nuc_engamma=jnp.asarray(self.dec.nuc_endecay_gamma, dtype=fdtype),
            ts=jnp.asarray(float(self.ts.start[nts]), dtype=fdtype),
            t2=jnp.asarray(float(self.ts.start[nts] + self.ts.width[nts]), dtype=fdtype),
            t_mid=jnp.asarray(tmid, dtype=fdtype),
            is_first_timestep=jnp.asarray(nts == 0),
        )
        return self._prepad_tau_for_kernel(ctx)

    def _prepad_tau_for_kernel(self, ctx):
        """Pre-pad the (ncells, nlines) Sobolev table to the fused kernel's
        geometry ONCE per timestep. The kernel prep's pads are idempotent,
        so without this they re-create a padded multi-GB copy of the table
        inside EVERY transport dispatch program (at 100k lines x thousands
        of cells those HLO temps alone exhausted a 16 GB chip). Padded rows/
        cols are zero-tau and are never indexed by the XLA walk."""
        opts = self.opts
        if not (opts.use_pallas_rpkt and self._f32
                and not opts.expansionopacities_on):
            return ctx
        from .transport import pallas_rpkt as _pk
        if not _pk.supported(opts, self.dad, self.grid,
                             self.grid.nonempty_npts):
            return ctx
        import dataclasses as _dc

        nlines = max(self.dad.nlines, 1)
        lpad = _pk._round_up(nlines, _pk.pick_line_chunk(opts, nlines))
        tau = ctx.tau_sob_factor.astype(jnp.float32)
        padc = lpad - tau.shape[1]
        padr = 0
        if _pk.use_tiled(opts, self.dad, self.grid, self.grid.nonempty_npts):
            padr = (self.grid.nonempty_npts + _pk.tiled_mpad(opts)
                    - tau.shape[0])
        if padc > 0 or padr > 0:
            tau = jnp.pad(tau, ((0, max(padr, 0)), (0, max(padc, 0))))
        return _dc.replace(ctx, tau_sob_factor=tau)

    # ------------------------------------------------------------------
    def _zero_est(self):
        dtype = jnp.float32 if self._f32 else jnp.float64
        return zero_estimators(
            self.grid.nonempty_npts, max(self.ad.nbfcontinua_ground, 1), dtype=dtype,
            nradfieldbins=self._nradbins, vspec_shape=self._vspec_shape,
            nbfrate=self._nbfrate, nbfrate_cells=self._nbfrate_cells,
            njblue=self._njblue, njblue_cells=self._njblue_cells,
            nion_stats_cells=self._nion_stats_cells,
            nion_stats_ions=self._nion_stats_ions,
            nion_stats=self._nion_stats,
            vgrid_shape=self._vgrid_shape,
            nlinestat=self._nlinestat,
            nmalog=self._nmalog,
        )

    def _tail_plan(self):
        """The descending tail-width ladder and its per-width options."""
        npkts = self.opts.npkts
        tail_w = max(1024, 1 << max(npkts // max(self.opts.tail_width_divisor, 1) - 1, 0).bit_length())
        tail_widths = [tail_w] if tail_w < npkts else []
        while tail_widths and tail_widths[-1] // 4 >= max(self.opts.tail_min_width, 256):
            tail_widths.append(tail_widths[-1] // 4)

        def _tail_opts(w):
            # tail programs run their device-side loop to convergence (or the
            # iteration cap): descending the ladder mid-drain costs a host
            # round-trip + gather per width, which the narrower programs'
            # cheaper iterations rarely pay back
            return self.opts.replace(
                rpkt_crossings_per_dispatch=self.opts.tail_crossings_per_dispatch,
                npkts=w, pallas_block=min(self.opts.pallas_block, w),
                exit_below=0,
            )

        return tail_widths, _tail_opts

    def _full_opts(self, tail_widths):
        """Options for the full-width transport program: exit the device loop
        early once the wavefront fits the widest tail buffer."""
        if tail_widths:
            return self.opts.replace(exit_below=tail_widths[0])
        return self.opts

    def _transport_kwargs(self, nts: int):
        p = self.params
        return dict(
            gamma_kappagrey=float(p.gamma_kappagrey),
            opacity_case=int(p.opacity_case),
            kpktdiffusion_timescale=float(p.kpktdiffusion_timescale),
            apply_kpkt_diffusion=bool(nts < p.n_kpktdiffusion_timesteps),
        )

    def warm_transport(self, nts: int):
        """Pre-compile every transport program do_timestep(nts) can dispatch:
        the full-width program plus each tail-width program in the ladder.

        Each program is invoked on an all-escaped packet buffer, so the
        transport while_loop exits at the first cond check — the call costs
        one compile (served from the persistent cache when warm) plus
        microseconds of device time. Benchmarks call this so no compile
        lands inside the measured window."""
        from .packets import TYPE_ESCAPE as _ESC

        ctx = self.update_grid(nts)
        est = self._zero_est()
        kwargs = self._transport_kwargs(nts)
        tail_widths, _tail_opts = self._tail_plan()
        key = jax.random.PRNGKey(0)
        dead = self.state.replace(
            ptype=jnp.full_like(self.state.ptype, _ESC))
        t0 = _time.time()
        self._transport_jit(
            key, dead, est, self.grid, self.dad, self.aux, self.rc,
            self.rates, self.cells, ctx, self._full_opts(tail_widths),
            max_iters=self.opts.dispatch_chunk_iters, **kwargs)
        for w in tail_widths:
            sub = jax.tree_util.tree_map(lambda x: x[:w], dead)
            self._transport_jit(
                key, sub, est, self.grid, self.dad, self.aux, self.rc,
                self.rates, self.cells, ctx, _tail_opts(w),
                max_iters=self.opts.tail_chunk_iters, **kwargs)
        # settle pass: right after a burst of cold compiles a relay backend
        # serves the next few dispatches seconds slower (server-side cache
        # writes); re-running each (now compiled) program absorbs that
        # outside any measured window
        out = self._transport_jit(
            key, dead, est, self.grid, self.dad, self.aux, self.rc,
            self.rates, self.cells, ctx, self._full_opts(tail_widths),
            max_iters=self.opts.dispatch_chunk_iters, **kwargs)
        for w in tail_widths:
            sub = jax.tree_util.tree_map(lambda x: x[:w], dead)
            out = self._transport_jit(
                key, sub, est, self.grid, self.dad, self.aux, self.rc,
                self.rates, self.cells, ctx, _tail_opts(w),
                max_iters=self.opts.tail_chunk_iters, **kwargs)
        jax.block_until_ready(out[2])
        self.log(
            f"warm_transport: {1 + len(tail_widths)} programs compiled in "
            f"{_time.time() - t0:.1f}s (widths {[self.opts.npkts] + tail_widths})"
        )
        # also warm the plasma-update programs (both the grey and non-grey
        # specialisations) so no compile fires at a mid-run mode switch
        self.warm_plasma(nts)

    # ------------------------------------------------------------------
    def do_timestep(self, nts: int):
        p = self.params
        t0 = _time.time()
        ctx = self.update_grid(nts)
        self.log(f"timestep {nts}: grid update took {_time.time() - t0:.1f}s")

        self.est = self._zero_est()

        t0 = _time.time()
        base_key = jax.random.fold_in(self.base_key, 1000 + nts)
        chunk_iters = self.opts.dispatch_chunk_iters
        iters = 0
        nsteps = 0
        t2v = float(self.ts.start[nts] + self.ts.width[nts])
        t2dev = jnp.asarray(t2v, self.state.prop_time.dtype)

        # tail mode: stragglers (diffusion-trapped packets needing millions of
        # scatters) gathered into a narrow buffer running a second compiled
        # program with many more in-kernel crossings per iteration; the
        # descending width ladder re-gathers into 4x narrower buffers as the
        # active count shrinks (kernel wall time scales with buffer width)
        tail_widths, _tail_opts = self._tail_plan()
        use_tail = bool(tail_widths)
        full_opts = self._full_opts(tail_widths)

        def _pick_width(n):
            fit = [w for w in tail_widths if w >= max(n, 1)]
            return fit[-1] if fit else None

        mode_tail = False
        cur_w = None
        sub = None
        tail_idx = None
        transport_kwargs = self._transport_kwargs(nts)
        # drained wavefronts (late timesteps: most packets escaped) start
        # straight in tail mode — one cheap count fetch replaces several
        # full-width dispatches worth of launch + round-trip cost
        n_act0 = int(jnp.sum((self.state.ptype != TYPE_ESCAPE).astype(jnp.int32)))
        if use_tail:
            w0 = _pick_width(n_act0)
            if w0 is not None:
                sub, tail_idx = _gather_active(self.state, t2dev, w0)
                cur_w = w0
                mode_tail = True
        for chunk in range(65536):  # hard backstop; each chunk advances or drains
            key = jax.random.fold_in(base_key, chunk)
            if not mode_tail:
                self.state, self.est, it_c, ns_c = self._transport_jit(
                    key, self.state, self.est, self.grid, self.dad, self.aux,
                    self.rc, self.rates, self.cells, ctx, full_opts,
                    max_iters=chunk_iters, **transport_kwargs,
                )
                counts = np.asarray(_pack_counts(it_c, ns_c, self.state, t2dev))
            else:
                sub, self.est, it_c, ns_c = self._transport_jit(
                    key, sub, self.est, self.grid, self.dad, self.aux,
                    self.rc, self.rates, self.cells, ctx, _tail_opts(cur_w),
                    max_iters=self.opts.tail_chunk_iters, **transport_kwargs,
                )
                counts = np.asarray(_pack_counts(it_c, ns_c, sub, t2dev))
            it_c, ns_c, n_act = (int(v) for v in counts)
            iters += it_c
            nsteps += ns_c
            if os.environ.get("ARTIS_DEBUG_CHUNKS"):
                self.log(
                    f"  chunk {chunk}{' (tail)' if mode_tail else ''}: iters "
                    f"{it_c} steps {int(ns_c)} active {n_act} "
                    f"elapsed {_time.time() - t0:.0f}s"
                )
            if (os.environ.get("ARTIS_DEBUG_STUCK") and n_act
                    and 0 < n_act <= 4 and chunk >= 40):
                src = sub if mode_tail else self.state
                gat, _ = _gather_active(src, t2dev, 4)
                rows = {
                    f.name: np.asarray(getattr(gat, f.name))[:n_act]
                    for f in dataclasses.fields(gat)
                    if isinstance(getattr(gat, f.name), jnp.ndarray)
                    and getattr(gat, f.name).ndim in (1, 2)
                }
                self.log(f"  STUCK dump (t2={t2v}): " + "; ".join(
                    f"{k}={v.tolist()}" for k, v in sorted(rows.items())))
                self.log(
                    "  STUCK cells: nne="
                    + str(np.asarray(self.cells.nne).tolist())
                    + " thick=" + str(np.asarray(self.cells.thick).tolist())
                )
                if self.opts.expansionopacities_on:
                    from .transport import expansionopacity as _expo
                    nu = rows["nu_cmf"]
                    lam = 1e8 * CLIGHT / np.maximum(nu, 1.0)
                    bb = np.clip(
                        ((lam - _expo.LAMBDA_MIN) / _expo.DELTA_LAMBDA
                         ).astype(int), 0, _expo.NBINS - 1)
                    cell = np.asarray(
                        self.grid.nonemptymgi_of_cell)[rows["where"]]
                    kap = np.asarray(ctx.expopac_kappa)
                    rho = np.asarray(self.cells.rho)[np.maximum(cell, 0)]
                    krow = kap[np.maximum(cell, 0)]
                    chibb = krow[np.arange(len(bb)), bb] * rho
                    r = np.linalg.norm(rows["pos"], axis=1)
                    self.log(
                        f"  STUCK expo: lam={lam.tolist()} bin={bb.tolist()} "
                        f"kappa={krow[np.arange(len(bb)), bb].tolist()} "
                        f"rho={rho.tolist()} chibb={chibb.tolist()} "
                        f"mfp={(1.0 / np.maximum(chibb, 1e-300)).tolist()} "
                        f"pos_ulp={(r / 2**24).tolist()} "
                        f"kapnb={[krow[np.arange(len(bb)), np.clip(bb + o, 0, _expo.NBINS - 1)].tolist() for o in (-1, 1)]}"
                    )
            if n_act == 0:
                break
            if (self.opts.transport_wall_budget > 0
                    and _time.time() - t0 > self.opts.transport_wall_budget):
                self.log(
                    f"timestep {nts}: transport wall budget reached with "
                    f"{n_act} packets still active (benchmark mode)"
                )
                break
            if use_tail and n_act > 0:
                want_w = _pick_width(n_act)
                if want_w is not None and (not mode_tail or want_w < cur_w):
                    if mode_tail:
                        self.state = _scatter_back(self.state, sub, tail_idx)
                    sub, tail_idx = _gather_active(self.state, t2dev, want_w)
                    cur_w = want_w
                    mode_tail = True
        if mode_tail:
            self.state = _scatter_back(self.state, sub, tail_idx)
        jax.block_until_ready(self.state.ptype)
        dt_transport = _time.time() - t0
        self.log(
            f"timestep {nts}: transport took {dt_transport:.1f}s "
            f"({int(iters)} wavefront iterations, {int(nsteps)} rpkt steps, "
            f"{int(nsteps) / max(dt_transport, 1e-9):.3g} rpkt steps/s)"
        )
        self.total_rpkt_steps = getattr(self, "total_rpkt_steps", 0) + int(nsteps)
        self.total_transport_seconds = getattr(self, "total_transport_seconds", 0.0) + dt_transport
        if not hasattr(self, "transport_log"):
            self.transport_log = []
        self.transport_log.append(dict(
            nts=nts, steps=int(nsteps), seconds=dt_transport,
            iters=int(iters), active_start=n_act0,
        ))

        self.prev_est = self.est
        if self.opts.vpkt_on:
            self._vspec_total = self._vspec_total + np.asarray(
                self.est.vspec, dtype=np.float64
            )
            self._vgrid_total = self._vgrid_total + np.asarray(
                self.est.vgrid, dtype=np.float64
            )
        self.gamma_dep_ts[nts] = float(jnp.sum(self.est.dep_gamma)) * self._e0
        self.cmf_lum_ts[nts] = float(self.est.cmf_lum) * self._e0
        e = self.est
        for k, v in (
            ("electron", jnp.sum(e.dep_electron)), ("positron", jnp.sum(e.dep_positron)),
            ("alpha", jnp.sum(e.dep_alpha)),
            ("electron_discrete", e.electron_dep_discrete),
            ("positron_discrete", e.positron_dep_discrete),
            ("alpha_discrete", e.alpha_dep_discrete),
            ("gamma_emission", getattr(e, "gamma_emission", 0.0)),
            ("positron_emission", e.positron_emission),
            ("electron_emission", e.electron_emission),
            ("alpha_emission", e.alpha_emission),
        ):
            self.dep_ts[k][nts] = float(v) * self._e0

        # accumulate newly escaped rpackets into light curve + spectrum
        esc = (
            (np.asarray(self.state.ptype) == TYPE_ESCAPE)
            & (np.asarray(self.state.escape_type) == TYPE_RPKT)
            & ~self._escaped_counted
        )
        if esc.any():
            pos = np.asarray(self.state.pos)[esc]
            dirv = np.asarray(self.state.dir)[esc]
            esct = np.asarray(self.state.escape_time)[esc]
            nurf = np.asarray(self.state.nu_rf)[esc]
            erf = np.asarray(self.state.e_rf, dtype=np.float64)[esc] * self._e0
            ecmf = np.asarray(self.state.e_cmf, dtype=np.float64)[esc] * self._e0
            spectrum_mod.add_packets_to_lightcurve(
                self.lc_lum, self.lc_lumcmf, pos, dirv, esct, erf, ecmf,
                self.ts.start[:-1], p.tmin, p.tmax, self.grid.vmax,
            )
            spectrum_mod.add_packets_to_spectra(
                self.spec, pos, dirv, esct, nurf, erf, self.ts.start[:-1], p.tmin, p.tmax
            )
            self._escaped_counted |= esc
        if self.opts.write_estimator_files:
            self.write_estimators(nts)
        if self.opts.record_linestat:
            # per-timestep emission/absorption count rows (sn3d.cc:640-660)
            with open(os.path.join(self.rundir, "linestat.out"), "a") as f:
                for row in (np.asarray(self.est.line_emisscount),
                            np.asarray(self.est.line_absorbcount)):
                    f.write(" ".join(str(int(v)) for v in row) + "\n")
        if self.opts.nlte_enabled and self.opts.write_estimator_files:
            self.write_nltepops(nts)
        if self.opts.multibin_radfield and self.opts.write_estimator_files:
            self.write_radfield(nts)
        if self.opts.log_macroatom:
            self.write_macroatom_log(nts)
        counter_txt = stats_mod.format_counters(self.est.counters)
        if counter_txt:
            self.log(f"timestep {nts} event counters:\n{counter_txt}")
        self.log(
            f"timestep {nts}: escaped rpkts so far {int(self._escaped_counted.sum())} "
            f"(cmf_lum {self.cmf_lum_ts[nts] / LSUN / max(float(self.ts.width[nts]), 1e-30):.3e} Lsun)"
        )

    # ------------------------------------------------------------------
    def write_macroatom_log(self, nts: int):
        """Drain the bounded device-side macro-atom event buffer into
        macroatom_0-0.out with the reference's column layout (reference:
        LOG_MACROATOM, macroatom.cc:413-421, 630-641)."""
        n_seen = int(self.est.malog_n)
        cap = int(self.est.malog.shape[0])
        n = min(n_seen, cap)
        path = os.path.join(self.rundir, "macroatom_0-0.out")
        if nts == 0 or not os.path.exists(path):
            with open(path, "w") as f:
                f.write(
                    f"{'timestep':>8} {'modelgridindex':>14} {'Z':>2} "
                    f"{'ionstage_in':>12} {'ionstage_out':>12} {'level_in':>9} "
                    f"{'level_out':>9} {'activline':>9} {'nu_cmf_in':>11} "
                    f"{'nu_cmf_out':>11} {'nu_rf_in':>11} {'nu_rf_out':>11}\n"
                )
        if n == 0:
            return
        rows = np.asarray(self.est.malog[:n], dtype=np.float64)
        lvl_ion = np.asarray(self.dad.level_ion)
        ion_elem = np.asarray(self.dad.ion_element)
        ion_stage = np.asarray(self.dad.ion_stage)
        ion_lvl0 = np.asarray(self.dad.ion_level_start)
        elem_z = np.asarray(self.dad.elem_z)
        li = np.clip(rows[:, 1].astype(np.int64), 0, lvl_ion.shape[0] - 1)
        lo = np.clip(rows[:, 2].astype(np.int64), 0, lvl_ion.shape[0] - 1)
        ion_in, ion_out = lvl_ion[li], lvl_ion[lo]
        with open(path, "a") as f:
            for k in range(n):
                f.write(
                    f"{nts:>8d} {int(rows[k, 0]):>14d} "
                    f"{int(elem_z[ion_elem[ion_in[k]]]):>2d} "
                    f"{int(ion_stage[ion_in[k]]):>12d} "
                    f"{int(ion_stage[ion_out[k]]):>12d} "
                    f"{int(li[k] - ion_lvl0[ion_in[k]]):>9d} "
                    f"{int(lo[k] - ion_lvl0[ion_out[k]]):>9d} "
                    f"{int(rows[k, 3]):>9d} {rows[k, 4]:>11.5e} "
                    f"{rows[k, 5]:>11.5e} {rows[k, 6]:>11.5e} "
                    f"{rows[k, 7]:>11.5e}\n"
                )
        if n_seen > cap:
            self.log(
                f"timestep {nts}: macroatom log overflow — {n_seen - cap} of "
                f"{n_seen} events dropped (log_macroatom_capacity={cap})"
            )

    # ------------------------------------------------------------------
    def _acquire_lockfile(self):
        """Guard against two drivers on one run directory (reference:
        check_already_running, sn3d.h:277-309): refuse to start when a
        lockfile names a still-live pid; otherwise take it over."""
        path = os.path.join(self.rundir, "artis.pid")
        if os.path.exists(path):
            try:
                oldpid = int(open(path).read().split()[0])
            except (ValueError, IndexError):
                oldpid = -1
            alive = False
            if oldpid > 0:
                try:
                    os.kill(oldpid, 0)
                    alive = True
                except (ProcessLookupError, PermissionError):
                    alive = False
            if alive:
                raise RuntimeError(
                    f"ABORTING: another simulation (pid {oldpid}) is already "
                    f"running in {self.rundir} (lockfile {path})"
                )
        with open(path, "w") as f:
            f.write(f"{os.getpid()}\n")
        self._lockpath = path
        import atexit

        atexit.register(self._release_lockfile)

    def _release_lockfile(self):
        if self._lockpath and os.path.exists(self._lockpath):
            try:
                os.remove(self._lockpath)
            except OSError:
                pass
            self._lockpath = None

    def run(self, walltime_hours: float = -1.0):
        """Main timestep loop with walltime-aware soft exit
        (reference: sn3d.cc:879-922, 398-425)."""
        p = self.params
        start_wall = _time.time()
        ts_durations = []
        for nts in range(p.timestep_start, p.timestep_finish):
            ts_t0 = _time.time()
            self.do_timestep(nts)
            ts_durations.append(_time.time() - ts_t0)
            self.write_outputs(partial=True)
            if nts < p.timestep_finish - 1:
                self.save_checkpoint(nts + 1)
            if walltime_hours > 0:
                remaining = walltime_hours * 3600 - (_time.time() - start_wall)
                if remaining < 1.5 * max(ts_durations):
                    self.log(f"RESTART_NEEDED: walltime insufficient for timestep {nts + 1}")
                    return
        self.finish()

    def save_checkpoint(self, next_nts: int):
        """Checkpoint packets + the COMPLETE carried simulation state and
        rewrite input.txt so the run resumes at next_nts (reference:
        sn3d.cc:427-487; grid.cc:2121-2175 saves grid scalars then the
        radfield/nonthermal/nltepop restart blocks — here the full CellState
        and previous-timestep Estimators pytrees cover the same state, since
        every solver re-derives from them)."""
        import dataclasses as _dc

        # retry-on-failure with read-back verification (reference:
        # sn3d.cc:356-375 write retry loop; packet.cc:205-233
        # VERIFY_WRITTEN_PACKETS_FILES)
        pktpath = os.path.join(self.rundir, f"packets_0000_ts{next_nts}.npz")
        for attempt in range(3):
            try:
                packets_mod.save_packets_npz(pktpath, self.state)
                reread = packets_mod.load_packets_npz(pktpath)
                if np.array_equal(np.asarray(reread.e_cmf),
                                  np.asarray(self.state.e_cmf)):
                    break
                raise IOError("packet file read-back mismatch")
            except Exception as exc:  # noqa: BLE001 - disk-full/NFS hiccups
                self.log(f"packet checkpoint write attempt {attempt} failed: {exc}")
                _time.sleep(1.0 + attempt)
        else:
            raise IOError(f"could not write packet checkpoint {pktpath}")
        blob = {}
        for f in _dc.fields(self.cells):
            blob[f"cells_{f.name}"] = np.asarray(getattr(self.cells, f.name))
        if self.prev_est is not None:
            for f in _dc.fields(self.prev_est):
                blob[f"est_{f.name}"] = np.asarray(getattr(self.prev_est, f.name))
        for k, v in self.dep_ts.items():
            blob[f"dep_ts_{k}"] = v
        # cross-timestep Spencer-Fano carry (the reference saves nt_solution
        # in gridsave too, nonthermal restart block) — required for bit-exact
        # resume when sf_max_ts_between_solutions > 0
        if getattr(self, "_sf_carry", None) is not None:
            for k, v in self._sf_carry.items():
                blob[f"sfcarry_{k}"] = np.asarray(v)
        np.savez_compressed(
            os.path.join(self.rundir, f"gridsave_ts{next_nts}.npz"),
            lc_lum=self.lc_lum, lc_lumcmf=self.lc_lumcmf,
            gamma_dep_ts=self.gamma_dep_ts, cmf_lum_ts=self.cmf_lum_ts,
            escaped_counted=self._escaped_counted, spec_flux=self.spec.flux,
            vspec_total=self._vspec_total, vgrid_total=self._vgrid_total,
            **blob,
        )
        inputparams_io.update_parameterfile(
            os.path.join(self.rundir, "input.txt"), next_nts, self.params.timestep_finish, 1
        )
        # delete the previous checkpoint once the new one is complete
        # (reference: sn3d.cc:475-486, KEEP_ALL_RESTART_FILES=false)
        for old in (next_nts - 1,):
            for prefix in ("packets_0000_ts", "gridsave_ts"):
                path = os.path.join(self.rundir, f"{prefix}{old}.npz")
                if os.path.exists(path):
                    os.remove(path)

    def load_checkpoint(self, nts: int):
        """Resume state from a checkpoint (reference: grid.cc:825-916). With
        the deterministic RNG this restores the run bit-exactly (stronger than
        the reference's contract; verified by tests/test_checkpoint.py)."""
        import dataclasses as _dc

        self.state = packets_mod.load_packets_npz(
            os.path.join(self.rundir, f"packets_0000_ts{nts}.npz")
        )
        g = np.load(os.path.join(self.rundir, f"gridsave_ts{nts}.npz"))
        self.cells = self.cells.replace(**{
            f.name: jnp.asarray(g[f"cells_{f.name}"])
            for f in _dc.fields(self.cells) if f"cells_{f.name}" in g
        })
        est = zero_estimators(
            self.grid.nonempty_npts, max(self.ad.nbfcontinua_ground, 1),
            nradfieldbins=self._nradbins, vspec_shape=self._vspec_shape,
            nbfrate=self._nbfrate, nbfrate_cells=self._nbfrate_cells,
            njblue=self._njblue, njblue_cells=self._njblue_cells,
            nion_stats_cells=self._nion_stats_cells,
            nion_stats_ions=self._nion_stats_ions,
            nion_stats=self._nion_stats,
            vgrid_shape=self._vgrid_shape,
            nlinestat=self._nlinestat,
            nmalog=self._nmalog,
        )
        if "est_j" in g:
            est = est.replace(**{
                f.name: jnp.asarray(g[f"est_{f.name}"])
                for f in _dc.fields(est) if f"est_{f.name}" in g
            })
        self.prev_est = est
        if self._f32:
            self.cells = demote_to_f32(self.cells)
            self.state = demote_to_f32(self.state)
            self.prev_est = demote_to_f32(self.prev_est)
        self.lc_lum = g["lc_lum"]
        self.lc_lumcmf = g["lc_lumcmf"]
        self.gamma_dep_ts = g["gamma_dep_ts"]
        self.cmf_lum_ts = g["cmf_lum_ts"]
        self._escaped_counted = g["escaped_counted"]
        self.spec.flux[:] = g["spec_flux"]
        if "vspec_total" in g:
            self._vspec_total = np.asarray(g["vspec_total"], dtype=np.float64)
        if "vgrid_total" in g:
            self._vgrid_total = np.asarray(g["vgrid_total"], dtype=np.float64)
        for k in self.dep_ts:
            if f"dep_ts_{k}" in g:
                self.dep_ts[k] = g[f"dep_ts_{k}"]
        sfkeys = [k for k in g.files if k.startswith("sfcarry_")]
        if sfkeys:
            self._sf_carry = {
                k[len("sfcarry_"):]: jnp.asarray(g[k]) for k in sfkeys}
            if self._f32:
                self._sf_carry = demote_to_f32(self._sf_carry)

    def finish(self):
        """Final outputs: packets file for exspec (reference: sn3d.cc:860-877)."""
        packets_mod.write_packets_text(
            os.path.join(self.rundir, "packets00_0000.out"), self.state, e_scale=self._e0
        )
        if self.opts.vpkt_on and self.vpkt_cfg is not None:
            from .transport import vpkt as vpkt_mod
            vpkt_mod.write_vspecpol(
                os.path.join(self.rundir, "specpol_virtual.out"), self.vpkt_cfg,
                self._vspec_total * self._e0,
            )
            if self.vpkt_cfg.vgrid_on:
                vpkt_mod.write_vpkt_grid(
                    os.path.join(self.rundir, "vpkt_grid.out"), self.vpkt_cfg,
                    self._vgrid_total * self._e0, float(self.grid.vmax),
                )
        self.write_outputs(partial=False)

    def write_deposition(self):
        """deposition.out in the reference's 22-column layout (sn3d.cc:157-191)."""
        p = self.params
        path = os.path.join(self.rundir, "deposition.out")
        mtot = max(self.mtot_input, 1e-30)
        m_cell = self.model.rho_tmin * self._assoc_vol_model
        with open(path + ".tmp", "w") as f:
            f.write(
                "#ts tmid_days tmid_s total_dep_Lsun gammadep_discrete_Lsun gammadep_Lsun "
                "positrondep_Lsun eps_positron_ana_Lsun elecdep_Lsun eps_elec_Lsun "
                "eps_elec_ana_Lsun alphadep_Lsun eps_alpha_Lsun eps_alpha_ana_Lsun "
                "eps_gamma_Lsun Qdot_betaminus_ana_erg/s/g Qdotalpha_ana_erg/s/g "
                "eps_erg/s/g Qdot_ana_erg/s/g positrondep_discrete_Lsun "
                "elecdep_discrete_Lsun alphadep_discrete_Lsun\n"
            )
            for i in range(p.ntimesteps):
                tmid = float(self.ts.mid[i])
                tw = max(float(self.ts.width[i]), 1e-30)
                d = self.dep_ts
                total = (self.gamma_dep_ts[i] + d["positron"][i] + d["electron"][i]
                         + d["alpha"][i])
                eps_pos = float(np.sum(m_cell * decay_mod.get_particle_power_pergram(
                    self.dec, self.initnucmassfrac, tmid, decay_mod.DECAYTYPE_BETAPLUS)))
                eps_el = float(np.sum(m_cell * decay_mod.get_particle_power_pergram(
                    self.dec, self.initnucmassfrac, tmid, decay_mod.DECAYTYPE_BETAMINUS)))
                eps_al = float(np.sum(m_cell * decay_mod.get_particle_power_pergram(
                    self.dec, self.initnucmassfrac, tmid, decay_mod.DECAYTYPE_ALPHA)))
                qdot_bm = float(np.mean(decay_mod.get_qdot(
                    self.dec, self.initnucmassfrac, tmid, decay_mod.DECAYTYPE_BETAMINUS)))
                qdot_a = float(np.mean(decay_mod.get_qdot(
                    self.dec, self.initnucmassfrac, tmid, decay_mod.DECAYTYPE_ALPHA)))
                eps_per_g = (d["gamma_emission"][i] + d["positron_emission"][i]
                             + d["electron_emission"][i] + d["alpha_emission"][i]) / mtot / tw
                f.write(
                    f"{i} {tmid / DAY:g} {tmid:g} {total / tw / LSUN:g} "
                    f"{self.gamma_dep_ts[i] / tw / LSUN:g} {self.gamma_dep_ts[i] / tw / LSUN:g} "
                    f"{d['positron'][i] / tw / LSUN:g} {eps_pos / LSUN:g} "
                    f"{d['electron'][i] / tw / LSUN:g} {d['electron_emission'][i] / tw / LSUN:g} "
                    f"{eps_el / LSUN:g} {d['alpha'][i] / tw / LSUN:g} "
                    f"{d['alpha_emission'][i] / tw / LSUN:g} {eps_al / LSUN:g} "
                    f"{d['gamma_emission'][i] / tw / LSUN:g} {qdot_bm:g} {qdot_a:g} "
                    f"{eps_per_g:g} {qdot_bm + qdot_a:g} "
                    f"{d['positron_discrete'][i] / tw / LSUN:g} "
                    f"{d['electron_discrete'][i] / tw / LSUN:g} "
                    f"{d['alpha_discrete'][i] / tw / LSUN:g}\n"
                )
        os.replace(path + ".tmp", path)

    def write_estimators(self, nts: int):
        """Per-cell estimator snapshot (reference: update_grid.cc:34-118,
        estimators_XXXX.out); one block per non-empty cell."""
        path = os.path.join(self.rundir, f"estimators_{nts:04d}.out")
        te = np.asarray(self.cells.Te); tr = np.asarray(self.cells.TR)
        tj = np.asarray(self.cells.TJ); w = np.asarray(self.cells.W)
        nne = np.asarray(self.cells.nne); thick = np.asarray(self.cells.thick)
        rho = np.asarray(self.cells.rho)
        cool = np.asarray(self.cells.totalcooling)
        with open(path, "w") as f:
            for i in range(self.grid.nonempty_npts):
                mgi = int(self.mgi_of_nonempty[i])
                f.write(
                    f"timestep {nts} modelgridindex {mgi} titeration 0 "
                    f"TR {tr[i]:g} Te {te[i]:g} W {w[i]:g} TJ {tj[i]:g} "
                    f"grey_depth {float(np.asarray(self.cells.grey_depth)[i]):g} "
                    f"nne {nne[i]:g} rho {rho[i]:g} thick {int(thick[i])} "
                    f"totalcooling {cool[i]:g}\n"
                )
                if self.opts.track_ion_stats and self.prev_est is not None:
                    # MC-vs-analytic per-ion rate comparison columns
                    # (reference: update_grid.cc:424-620 TRACK_ION_STATS)
                    ist = np.asarray(self.prev_est.ion_stats)
                    if ist.shape[0] == self.grid.nonempty_npts:
                        z_of_ion = np.asarray(self.ad.elem_z)[
                            np.asarray(self.dad.ion_element)
                        ]
                        stage = np.asarray(self.dad.ion_stage)
                        for ui in range(self.ad.nions_total):
                            row = ist[i, ui]
                            if not np.any(row):
                                continue
                            f.write(
                                f"ionstats Z {int(z_of_ion[ui])} ionstage "
                                f"{int(stage[ui])} photoion_mc {row[stats_mod.ION_PHOTOION]:g} "
                                f"ntion_mc {row[stats_mod.ION_NTION]:g} "
                                f"bb_absorbed {row[stats_mod.ION_BOUNDBOUND_ABSORBED]:g} "
                                f"bb_emitted {row[stats_mod.ION_BOUNDBOUND_MACROATOM]:g} "
                                f"ma_energy_in {row[stats_mod.ION_MACROATOM_ENERGYIN_TOTAL]:g} "
                                f"ma_energy_out {row[stats_mod.ION_MACROATOM_ENERGYOUT_TOTAL]:g}\n"
                            )

    def write_nltepops(self, nts: int):
        """nlte_0000.out (reference: nltepop.cc:1076-1130
        nltepop_write_to_file): per cell per ion per level LTE vs NLTE pops."""
        path = os.path.join(self.rundir, "nlte_0000.out")
        mode = "a" if nts > 0 and os.path.exists(path) else "w"
        if self._last_levelpops is None:
            return
        lp = np.asarray(self._last_levelpops)
        boltz = np.asarray(ltepop_mod.calculate_levelpops(self.dad, self.cells, self.opts))
        z_of_ion = np.asarray(self.ad.elem_z)[np.asarray(self.dad.ion_element)]
        stage = np.asarray(self.dad.ion_stage)
        lvl_start = np.asarray(self.dad.ion_level_start)
        nlv = np.asarray(self.dad.ion_nlevels)
        ionpop = np.zeros((lp.shape[0], self.ad.nions_total))
        np.add.at(ionpop.T, np.asarray(self.dad.level_ion), lp.T)
        with open(path, mode) as f:
            if mode == "w":
                f.write("timestep modelgridindex Z ionstage level n_LTE n_NLTE ion_popfrac\n")
            for i in range(lp.shape[0]):
                mgi = int(self.mgi_of_nonempty[i])
                for ui in range(self.ad.nions_total):
                    tot = ionpop[i].sum()
                    frac = ionpop[i, ui] / tot if tot > 0 else 0.0
                    for l in range(int(nlv[ui])):
                        g = int(lvl_start[ui]) + l
                        f.write(
                            f"{nts} {mgi} {int(z_of_ion[ui])} {int(stage[ui])} "
                            f"{l} {boltz[i, g]:.5e} {lp[i, g]:.5e} {frac:.4e}\n"
                        )

    def write_radfield(self, nts: int):
        """radfield_0000.out (reference: radfield.cc:427-487 write_to_file):
        per cell per bin nu range, J, nuJ, contribcount, fitted T_R and W."""
        path = os.path.join(self.rundir, "radfield_0000.out")
        mode = "a" if nts > 0 and os.path.exists(path) else "w"
        if self.prev_est is None or self.radfieldbin_tr is None:
            return
        nb = self.opts.radfieldbincount
        jb = np.asarray(self.prev_est.radfieldbin_j)
        nujb = np.asarray(self.prev_est.radfieldbin_nuj)
        cb = np.asarray(self.prev_est.radfieldbin_count)
        trb = np.asarray(self.radfieldbin_tr)
        wb = np.asarray(self.radfieldbin_w)
        lower = np.asarray(radfield_mod.bin_nu_lower(nb))
        upper = np.asarray(radfield_mod.bin_nu_upper(nb))
        tr_full = np.asarray(self.cells.TR)
        w_full = np.asarray(self.cells.W)
        with open(path, mode) as f:
            if mode == "w":
                f.write("timestep modelgridindex bin_num nu_lower nu_upper nuJ J J_nu_avg ncontrib T_R W\n")
            for i in range(jb.shape[0]):
                mgi = int(self.mgi_of_nonempty[i])
                f.write(
                    f"{nts} {mgi} -1 0 0 0 0 0 0 {tr_full[i]:.1f} {w_full[i]:.5e}\n"
                )
                for b in range(nb):
                    dnu = max(upper[b] - lower[b], 1e-30)
                    f.write(
                        f"{nts} {mgi} {b} {lower[b]:.5e} {upper[b]:.5e} "
                        f"{nujb[i, b]:.3e} {jb[i, b]:.3e} {jb[i, b] / dnu:.3e} "
                        f"{int(cb[i, b])} {trb[i, b]:.1f} {wb[i, b]:.5e}\n"
                    )

    def write_outputs(self, partial: bool):
        width = np.asarray(self.ts.width[:-1])
        self.write_deposition()
        spectrum_mod.write_light_curve(
            os.path.join(self.rundir, "light_curve.out"), self.ts.mid[:-1],
            self.lc_lum, self.lc_lumcmf, self.gamma_dep_ts, self.cmf_lum_ts, width,
        )
        spectrum_mod.write_spectrum(
            os.path.join(self.rundir, "spec.out"), self.spec, self.ts.mid[:-1]
        )
