"""Fused Pallas TPU kernel for the r-packet crossing loop.

The XLA wavefront pays ~1000s of kernel launches per crossing iteration
(boundary geometry, continuum opacity, line walk, estimator scatters as
separate HLOs). This module fuses the ENTIRE multi-crossing propagation
(reference: rpkt.cc:604-737 do_rpkt_step without the event application)
into one Pallas kernel: per block of lanes, an in-kernel loop advances every
packet through up to ``max_inner`` boundary crossings, accumulating the
J/nuJ/ffheating and LUT photoionisation/bf-heating estimators in VMEM with
one-hot MXU matmuls instead of scatter-adds.

Physics parity: the kernel reproduces ``engine._rpkt_propagate_once``
lane-for-lane (validated by tests/test_pallas_rpkt.py with injected optical
depths). Event application stays in XLA (engine._rpkt_apply_events) and runs
once per outer iteration.

Scope (guarded by `supported()`): spherical-1D / 2D-cylindrical /
3D-Cartesian (1D-model) grids, opacity_case >= 4, detailed line walk OR
binned expansion opacities, no multibin radfield. Other configurations fall
back to the XLA path. Production linelists beyond the VMEM budget are
HBM-streamed: the Sobolev walk DMAs one (ncells, chunk) tau slab per block,
with an early-exit while_loop so a typical crossing touches only the block(s)
around each packet's line cursor. Nebular-scale bf continua (beyond
pallas_bf_stream_threshold) are likewise HBM-streamed: each crossing DMAs
only the chunks intersecting the block's [nu/last_nuovernuedge, nu] window
(the reference's allcontbegin/end window, rpkt.cc:805-811), with a second
windowed pass after the event decision for continuum selection and the
detailed bf-rate estimators.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import CLIGHT, CLIGHTSQUARED, CLIGHT_PROP, SIGMA_T
from ..grid import BOUNDARY_ESCAPE, GridType

F32 = jnp.float32
I32 = jnp.int32

# interpret mode lets the kernel run (slowly) off-TPU for tests
def _interpret_mode():
    """Off-TPU interpret mode for the kernel. Default: the fast generic
    interpreter. Under shard_map that path loses the pltpu primitive
    registrations (prng_seed fails to lower), so shard_map-composition
    tests set ARTIS_PALLAS_MOSAIC_INTERPRET=1 to select the (slower but
    faithful) Mosaic interpreter instead."""
    if jax.default_backend() == "tpu":
        return False
    if os.environ.get("ARTIS_PALLAS_MOSAIC_INTERPRET") == "1":
        return pltpu.InterpretParams()
    return True




def _cumsum_rows(x):
    """Row-wise inclusive cumulative sum via a triangular MXU matmul
    (Mosaic has no cumsum lowering)."""
    n = x.shape[1]
    tri = (
        jax.lax.broadcasted_iota(I32, (n, n), 0)
        <= jax.lax.broadcasted_iota(I32, (n, n), 1)
    ).astype(x.dtype)
    return jnp.dot(x, tri, preferred_element_type=x.dtype)


def _cumsum_rows_excl(x):
    """Row-wise EXCLUSIVE cumulative sum via a strict-triangular MXU matmul.

    Never compute the exclusive sum as inclusive-minus-last: the MXU matmul
    carries bf16-grade rounding, so for a large element (e.g. a Sobolev
    tau ~ 1e5) the subtraction leaves an O(x * 2^-10) residue instead of 0.
    That residue once made (tau_next - s_cum) spuriously negative, turning an
    optically-thick bound-bound encounter into a zero-distance continuum
    event the packet repeated forever (the "immortal packet" bench stall)."""
    n = x.shape[1]
    tri = (
        jax.lax.broadcasted_iota(I32, (n, n), 0)
        < jax.lax.broadcasted_iota(I32, (n, n), 1)
    ).astype(x.dtype)
    return jnp.dot(x, tri, preferred_element_type=x.dtype)


def _col(b):
    """Bool (B,) -> (B,1): Mosaic only inserts minor dims on 32-bit types."""
    return b.astype(I32)[:, None] > 0


def _rowb(b):
    """Bool (B,) -> (1,B) for broadcasting over a (N,B) transposed array."""
    return b.astype(I32)[None, :] > 0


def _first_true_idx(cond, maxn):
    """Index of the first True along axis 1 (clipped to [0, maxn-1]);
    Mosaic's argmax only lowers for f32, so reduce a masked f32 iota."""
    iota = jax.lax.broadcasted_iota(I32, cond.shape, 1).astype(F32)
    first = jnp.min(jnp.where(cond, iota, 1e9), axis=1)
    return jnp.clip(first, 0, maxn - 1).astype(I32)


def _u01(shape):
    """Uniform (0,1] floats from the on-core PRNG."""
    # Mosaic requires >=2D for bitcast: draw (1, n) and take row 0
    bits = pltpu.prng_random_bits((1,) + shape)
    # >>8 keeps 24 bits, which fit an int32 (Mosaic cannot cast uint32->f32)
    top24 = (pltpu.bitcast(bits, jnp.uint32) >> 8).astype(I32)
    u = top24.astype(F32) * (1.0 / (1 << 24))
    return jnp.maximum(u[0], 1e-12)


def _tiled_eligible(opts, grid) -> bool:
    """Tile-sorted dispatch applies to 3D models on their own 3D grid
    (prop cell == model cell, nonemptymgi monotone in cell index by
    construction, grid.py:154+187) — the reference's O(100^3) production
    regime (grid.cc:1048-1096).  Expansion-opacity mode keeps a per-cell
    binned kappa table resident in VMEM and is not tiled yet."""
    return (grid.grid_type == GridType.CARTESIAN3D
            and int(getattr(grid, "model_dim", 1) or 1) == 3
            and not opts.expansionopacities_on)


def pick_tile(opts) -> int:
    """Prop-cell tile width for tile-sorted dispatch: a 128 multiple (the
    tiled prop_tab BlockSpec slices lanes at tile granularity)."""
    return max(-(-max(opts.pallas_tile, 128) // 128) * 128, 128)


def tiled_mpad(opts) -> int:
    """Accumulator/table-slab row count per tile: the nonemptymgi range of a
    tile spans at most `tile` rows, plus up to 7 rows of downward 8-alignment
    of the DMA row offset."""
    return pick_tile(opts) + 8


def use_tiled(opts, dad, grid, ncells: int) -> bool:
    """Whether the engine should dispatch tile-sorted: eligible 3D-model
    grids where the untiled kernel no longer fits the VMEM budget (or
    unconditionally under pallas_force_tiled, for tests)."""
    if not _tiled_eligible(opts, grid):
        return False
    if opts.pallas_force_tiled:
        return True
    nprop = int(grid.npts_model) + 1
    block = pick_block(opts, ncells, nprop)
    return vmem_estimate_bytes(
        opts, dad, ncells, nprop, block) > VMEM_BUDGET_BYTES


def supported(opts, dad, grid, ncells: int) -> bool:
    """Host-side check that this configuration fits the v1 kernel."""
    if not opts.use_pallas_rpkt:
        return False
    if grid.grid_type == GridType.SPHERICAL1D:
        pass
    elif grid.grid_type == GridType.CARTESIAN3D:
        # 3D uniform Cartesian grid: geometry derives from the cell index
        # in-kernel; the model mapping is closed-form for 1D (radial shell
        # search, grid.cc:470-487) and 2D ((rcyl,z) binning, grid.cc:489-517)
        # models; 3D models index the mgi table directly (the VMEM budget
        # below governs how large that table may be)
        pass
    elif grid.grid_type == GridType.CYLINDRICAL2D:
        # uniform (rcyl, z) cells: geometry derives from the cell index
        # in-kernel (grid.cc:1114-1137); the mgi table is per prop cell
        pass
    else:
        return False
    # multibin radfield estimators accumulate in-kernel (one packed one-hot
    # MXU matmul per crossing) — no exclusion needed
    # expansion-opacity bound-bound events defer to the XLA event pass,
    # which handles both the fixed-probability thermalisation mode and the
    # line-resolving THERMALISATION < 0 mode (rpkt.cc:238-262, 700-713)
    # detailed line (J_b_lu) and bf-rate estimators accumulate in-kernel
    # dipole / vpkt configs run the kernel with all events deferred to the
    # XLA event pass (inkernel_scatter=False) — no exclusion needed
    if dad.nlines == 0:
        return False
    if grid.grid_type == GridType.CARTESIAN3D:
        npropcells = int(grid.npts_model) + 1
    elif grid.grid_type == GridType.CYLINDRICAL2D:
        npropcells = int(grid.ncoordgrid[0]) * int(grid.ncoordgrid[1])
    else:
        npropcells = int(grid.ncoordgrid[0])
    # continua beyond pallas_bf_stream_threshold are HBM-streamed in
    # nu-windowed chunks — no hard cap; the VMEM estimate below governs
    # beyond the VMEM-resident budget the tau/nu line tables are HBM-streamed
    # (per-block DMA in the walk); cap only at a few GB of HBM
    if ncells * max(dad.nlines, 1) * 4 > 4_000_000_000:
        return False
    # VMEM budget: tables + estimator accumulators + one-hot temporaries at
    # the block width the wrapper would pick.  Replaces the former blanket
    # 1024-cell cap so multi-thousand-cell 3D models keep the fused kernel.
    block = pick_block(opts, ncells, npropcells)
    if vmem_estimate_bytes(
            opts, dad, ncells, npropcells, block) <= VMEM_BUDGET_BYTES:
        return True
    # O(100^3) models exceed the untiled budget: tile-sorted dispatch keeps
    # the fused kernel with per-tile table slices (PERF.md design)
    if _tiled_eligible(opts, grid):
        tile = pick_tile(opts)
        mpad = tiled_mpad(opts)
        tblock = pick_block(opts, mpad, tile)
        return vmem_estimate_bytes(
            opts, dad, mpad, tile, tblock,
            tiled=True) <= VMEM_BUDGET_BYTES
    return False


VMEM_BUDGET_BYTES = 14 * 1024 * 1024  # ~16 MB/core minus pipeline headroom


def pick_block(opts, ncells: int, npropcells: int) -> int:
    """Kernel lane-block width: narrow blocks for big cell tables so the
    (block, ncells) one-hot temporaries stay inside the VMEM budget."""
    block = -(-max(opts.pallas_block, 256) // 256) * 256
    if max(ncells, npropcells) > 1024:
        block = min(block, 256)
    return block


def pick_bf_chunk(opts) -> int:
    """bf-streaming chunk width: a 128 multiple (DMA lane offsets must be
    128-aligned), shared by the kernel wrapper and the VMEM estimate."""
    return max(-(-max(opts.pallas_bf_chunk, 128) // 128) * 128, 128)


def pick_line_chunk(opts, nlines: int) -> int:
    """Line-walk chunk width shared by the kernel wrapper and the VMEM
    estimate.  Must stay a multiple of 128: Mosaic requires the dynamic lane
    offset of the per-block nu/tau slab loads to be provably 128-aligned
    (a drift between the two call sites caused the dec2d95 Mosaic alignment
    failure — keep this the single source of truth)."""
    if nlines <= 128:
        return 128
    # cap at 1024: in streamed mode each walk block costs one synchronous
    # (mpad, chunk) slab DMA, so larger chunks amortise the DMA latency
    # across 4x the lines (the 256 cap measured 2026-08-21 left detailed
    # big-scene crossings DMA-latency-bound); VMEM stays ~4 MB per slab
    return min(-(-max(opts.linewalk_chunk, 128) // 128) * 128, 1024)


def vmem_estimate_bytes(opts, dad, ncells: int, npropcells: int,
                        block: int, tiled: bool = False) -> int:
    """Rough, conservative VMEM footprint of one kernel block.

    In tiled mode ncells/npropcells are the PER-TILE row counts (mpad/tile)
    and the line + bf tables always stream (slab DMA per tile row range)."""
    ngc = max(int(dad.nbfcontinua_ground), 1)
    ncont = max(int(dad.nbfcontinua), 1)
    bf_chunk = pick_bf_chunk(opts)
    stream_bf = tiled or (
        int(dad.nbfcontinua) > opts.pallas_bf_stream_threshold)
    ncont_pad = _round_up(ncont, bf_chunk if stream_bf else 128)
    ngc_pad = _round_up(ngc, 128)
    nlines = max(int(dad.nlines), 1)
    line_chunk = pick_line_chunk(opts, nlines)
    lpad = _round_up(nlines, line_chunk)
    nchp = _round_up(max(ncont_pad // bf_chunk, 1), 128)
    # estimator accumulator columns carried per nonempty cell
    acc_cols = 8
    if opts.use_lut_photoion:
        acc_cols += ngc_pad
    if opts.use_lut_bfheating:
        acc_cols += ngc_pad
    if opts.multibin_radfield:
        acc_cols += 3 * _round_up(max(opts.radfieldbincount, 1), 128)
    if opts.detailed_bf_estimators_on and int(dad.nbfcontinua) > 0:
        # the o_bfr accumulator stays VMEM-resident even when the bf TABLES
        # stream; huge (ncells x ncont) products fall back to the XLA path
        acc_cols += ncont_pad
    if opts.detailed_line_estimators_on and not opts.expansionopacities_on:
        acc_cols += 2 * 128
    # per-cell tables resident in VMEM
    cell_tab_cols = 6  # nne/Te/kappagrey/rho/thick/chiffpart
    if int(dad.nbfcontinua) > 0:
        # bf_a/bf_dep: full tables resident, or one DMA slab pair streamed
        cell_tab_cols += 2 * (bf_chunk if stream_bf else ncont_pad)
    if opts.expansionopacities_on:
        cell_tab_cols += 128  # binned expansion opacities
    stream = (tiled or ncells * lpad > opts.pallas_stream_threshold) \
        and not opts.expansionopacities_on
    line_cols = line_chunk if stream else lpad
    if not opts.expansionopacities_on:
        cell_tab_cols += line_cols  # tau slab (streamed) or full table
    # one-hot temporaries: a few (block, N) f32 live at once
    onehot = 3 * block * max(ncells, npropcells)
    # per-lane continuum temporaries (sigma/contrib/window etc.); streamed
    # mode works on (block, bf_chunk) slabs plus (block, nchunks) partials
    cont_tmp_cols = (4 * bf_chunk + nchp) if stream_bf else 4 * ncont_pad
    lane_tmp = block * (cont_tmp_cols + line_chunk + 64)
    # phixs/gmap/edge/prob: full tables resident, or streamed slabs
    bf_aux = ((bf_chunk if stream_bf else ncont_pad)
              * (int(dad.nphixspoints) + ngc + 2))
    # prop-cell tables: 3 legacy rows (mgi/cellmin0/cellmax0) plus the
    # 16-row fused VMEM-resident prop_tab gather table
    total = (ncells * (acc_cols + cell_tab_cols)
             + 19 * npropcells + onehot + lane_tmp + bf_aux)
    return total * 4


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(
    # scalar prefetch
    seed_ref,  # (1,) int32
    bt_ref,  # (nblocks,) int32 tile id per block (tiled mode; (1,) dummy)
    bn_ref,  # (nblocks,) int32 8-aligned nonemptymgi row offset per block
    # per-lane blocked inputs
    posx, posy, posz, dirx, diry, dirz, nu_rf, nu_cmf, e_rf, e_cmf,
    prop_time, where_i, next_trans_i, moving_i,
    test_tau,  # (B,) injected -log(u) optical depths (test mode) or dummy
    test_sel,  # (B,) injected selection uniforms (test mode) or dummy
    # replicated tables
    mgi_of_cell,  # (npropcells,) f32 (values: nonemptymgi or -1)
    cellmin0, cellmax0,  # (npropcells,) f32 coord bounds at tmin
    prop_tab,  # (16, nprop) fused gather table: mgi | 6 cell vals | bounds
    nne_t, te_t, kappagrey_t, rho_t, thick_t, chiffpart_t,  # (ncells,)
    line_nu,  # (Lpad,)
    tau_factor,  # (ncells, Lpad)
    jb_map,  # (Lpad,) f32 detailed-line estimator column (njblue = dropped)
    cont_nu_edge,  # (Cpad,)
    bf_a, bf_dep,  # (ncells, Cpad); bf_dep holds LOG departure
    cont_phixs,  # (Cpad, P)
    cont_gmap,  # (Cpad, ngc) one-hot ground map (f32)
    gc_nu_edge,  # (ngc,)
    cont_prob,  # (Cpad,) continuum probability (for bf-rate estimators)
    expo_kappa,  # (ncells, NBpad) binned expansion opacities [cm2/g]
    bf_ctab,  # (2, nbfchunks_pad): per-bf-chunk [start edge, next start edge]
    consts,  # (1, 4) SMEM f32: [t2, tmin, -, -] (traced per timestep)
    # outputs
    o_posx, o_posy, o_posz, o_dirx, o_diry, o_dirz, o_nu_rf, o_nu_cmf,
    o_e_rf, o_e_cmf, o_prop_time, o_where, o_next_trans,
    o_evented, o_escaped, o_thick, o_is_bb, o_act_line, o_bf_idx,
    o_chi_escat, o_chi_ff, o_chi_bf, o_chi_cont, o_mgi,
    o_em_x, o_em_y, o_em_z, o_em_t, o_nsc, o_inkscat,
    o_est,  # (1, ncells, 8): j, nuj, ffheating, ncross (cols 0-3)
    o_gamma,  # (1, ncells, ngc_pad)
    o_bfheat,  # (1, ncells, ngc_pad)
    o_rb,  # (1, ncells, 3*nbpad): multibin radfield j | nuj | count
    o_bfr,  # (1, ncells, Cpad128): detailed bf-rate estimators
    o_jb,  # (1, ncells, 2*njbpad): J_b_lu raw | count
    o_misc,  # (1, 8): nadv, nesc, cmf_lum
    # scratch (present only when stream_lines): tau slab, nu slab, DMA sems
    *scratch,
    nlines: int,
    ncont: int,
    nprop: int,
    ncells: int,
    ngc: int,
    nphixs: int,
    line_chunk: int,
    max_inner: int,
    relativistic: bool,
    phixs_dnu: float,
    last_nuovernuedge: float,
    want_gamma: bool,
    want_bfheat: bool,
    test_mode: bool,
    block: int,
    expansion_mode: bool = False,
    nbins_expo: int = 0,
    cart3d: bool = False,
    cyl2d: bool = False,
    nx: int = 1,
    ny: int = 1,
    nz: int = 1,
    stream_lines: bool = False,
    stream_bf: bool = False,
    bf_chunk: int = 256,
    inkernel_scatter: bool = True,
    multibin: bool = False,
    nradbins: int = 0,
    want_bfrate: bool = False,
    want_jblue: bool = False,
    model_dim: int = 1,
    n_rcyl_m: int = 1,
    n_z_m: int = 1,
    tiled: bool = False,
    tile: int = 0,
    ablate: tuple = (),
):
    B = block
    blk = pl.program_id(0)
    if tiled:
        # tile-sorted dispatch: every lane of this block lives in prop cells
        # [tile0, tile0+tile) whose nonemptymgi values span at most `ncells`
        # (= mpad) rows starting at ne0 (monotone by construction for 3D
        # models, grid.py:154+187); prop_tab arrives as this tile's
        # (16, tile) slice via its BlockSpec, the per-mgi tables are
        # DMA-row-sliced at ne0 below
        tile0 = bt_ref[pl.program_id(0)] * tile
        # bn_ref carries ne0/8; multiplying back makes the row offset of the
        # per-mgi slab DMAs provably 8-aligned (Mosaic rejects dynamic
        # dim-0 slices it cannot prove divisible by the sublane tiling)
        ne0 = bn_ref[pl.program_id(0)] * 8
        # blocks arrive sorted by tile, so all blocks of one tile are a
        # consecutive grid-step run revisiting the same (1, mpad, k)
        # accumulator slice; the run's FIRST block zeroes it, later blocks
        # accumulate on top, and Pallas writes it back to HBM when the out
        # index map changes (the standard grid-reduction pattern)
        first_visit = jnp.logical_or(
            blk == 0, bt_ref[blk] != bt_ref[jnp.maximum(blk - 1, 0)])
    # lane refs are blocked per grid step (BlockSpec (B,) with index map):
    # each block DMAs only its own B-lane slice in and out.  Full-array lane
    # specs cost ~0.6 ms/block in HBM<->VMEM traffic (measured round 3) —
    # the entire fixed overhead of a dispatch.
    lane = lambda ref: ref[0, :]  # lane refs are (1, B): 2-D keeps the
    # XLA<->Mosaic layouts compatible at ANY block width (1-D f32 params get
    # an XLA T(1024) layout that Mosaic rejects for narrower blocks)
    if not test_mode:
        pltpu.prng_seed(seed_ref[0] + blk * 7919)

    t2 = consts[0, 0]
    tmin = consts[0, 1]
    max_path_step = consts[0, 2]
    nu_lastline = consts[0, 4]
    Lpad = line_nu.shape[1]
    nlineblocks = Lpad // line_chunk

    if stream_bf:
        # bf tables live in HBM; the windowed chi/selection loops DMA one
        # bf_chunk-wide slab set per touched chunk (few chunks per crossing:
        # the nu window spans [nu/last_nuovernuedge, nu] of the ascending
        # edge list, the TPU analogue of the reference's allcontbegin/end
        # binary search, rpkt.cc:805-811)
        (bfa_slab, bfdep_slab, phixs_slab, gmap_slab, bfedge_slab,
         bfprob_slab, bf_sems) = scratch[-7:]
        scratch = scratch[:-7]

        def fetch_bf_chunk(c0):
            if tiled:
                bfa_src = bf_a.at[pl.ds(ne0, ncells), pl.ds(c0, bf_chunk)]
                bfdep_src = bf_dep.at[pl.ds(ne0, ncells), pl.ds(c0, bf_chunk)]
            else:
                bfa_src = bf_a.at[:, pl.ds(c0, bf_chunk)]
                bfdep_src = bf_dep.at[:, pl.ds(c0, bf_chunk)]
            cps = [
                pltpu.make_async_copy(bfa_src, bfa_slab, bf_sems.at[0]),
                pltpu.make_async_copy(bfdep_src, bfdep_slab, bf_sems.at[1]),
                pltpu.make_async_copy(
                    cont_phixs.at[pl.ds(c0, bf_chunk), :], phixs_slab,
                    bf_sems.at[2]),
                pltpu.make_async_copy(
                    cont_nu_edge.at[:, pl.ds(c0, bf_chunk)], bfedge_slab,
                    bf_sems.at[3]),
                pltpu.make_async_copy(
                    cont_prob.at[:, pl.ds(c0, bf_chunk)], bfprob_slab,
                    bf_sems.at[4]),
                pltpu.make_async_copy(
                    cont_gmap.at[pl.ds(c0, bf_chunk), :], gmap_slab,
                    bf_sems.at[5]),
            ]
            for cp in cps:
                cp.start()
            for cp in cps:
                cp.wait()

    if stream_lines:
        # line tables live in HBM; each walk block DMAs one (ncells, chunk)
        # tau slab + (1, chunk) nu/jb slabs into VMEM scratch (synchronous
        # per block — the early-exit walk touches few blocks per crossing).
        # A per-slab last-l0 cache in SMEM skips the refetch when consecutive
        # crossings of a dispatch revisit the same line window, which in a
        # dense forest is the common case (the walk mostly sits in one block
        # while nu drifts through it) — measured 2026-08-21: detailed
        # big-scene crossings were DMA-latency-bound.
        tau_slab, nu_slab, jb_slab, slab_last, dma_sems = scratch
        slab_last[0] = -1  # nu slab cache key (fresh per grid block)
        slab_last[1] = -1  # tau slab
        slab_last[2] = -1  # jb slab

        def fetch_nu(l0):
            @pl.when(slab_last[0] != l0)
            def _():
                cp = pltpu.make_async_copy(
                    line_nu.at[:, pl.ds(l0, line_chunk)], nu_slab,
                    dma_sems.at[0])
                cp.start()
                cp.wait()
                slab_last[0] = l0

            return nu_slab[0]

        def fetch_tau(l0):
            @pl.when(slab_last[1] != l0)
            def _():
                src = (tau_factor.at[pl.ds(ne0, ncells), pl.ds(l0, line_chunk)]
                       if tiled else tau_factor.at[:, pl.ds(l0, line_chunk)])
                cp = pltpu.make_async_copy(src, tau_slab, dma_sems.at[1])
                cp.start()
                cp.wait()
                slab_last[1] = l0

            return tau_slab[:, :]

        def fetch_jb(l0):
            @pl.when(slab_last[2] != l0)
            def _():
                cp = pltpu.make_async_copy(
                    jb_map.at[:, pl.ds(l0, line_chunk)], jb_slab,
                    dma_sems.at[2])
                cp.start()
                cp.wait()
                slab_last[2] = l0

            return jb_slab[0]
    else:
        def fetch_nu(l0):
            return line_nu[0, pl.ds(l0, line_chunk)]

        def fetch_tau(l0):
            return tau_factor[:, pl.ds(l0, line_chunk)]

        def fetch_jb(l0):
            return jb_map[0, pl.ds(l0, line_chunk)]

    # mutable per-lane state as loop carry
    state = dict(
        px=lane(posx), py=lane(posy), pz=lane(posz),
        dx=lane(dirx), dy=lane(diry), dz=lane(dirz),
        nurf=lane(nu_rf), nucmf=lane(nu_cmf), erf=lane(e_rf),
        ecmf=lane(e_cmf),
        t=lane(prop_time),
        # Kahan compensation for the time accumulator: diffusion-trapped
        # packets take scatter steps with dt below the float32 ulp of the
        # absolute time (~0.06s at t~6d); without compensation t never
        # advances and the packet becomes immortal. The residual is carried
        # across the in-kernel crossings of one dispatch (at most ~1 ulp of
        # drift is lost between dispatches).
        terr=jnp.zeros((B,), F32),
        cell=lane(where_i),
        ntr=lane(next_trans_i),
        # tiled: a lane outside this block's tile must not advance (the
        # engine masks stragglers already — this is the in-kernel guarantee
        # that an out-of-tile lane can never read the wrong prop_tab slice)
        moving=((lane(moving_i) > 0)
                & ((lane(where_i) >= tile0)
                   & (lane(where_i) < tile0 + tile) if tiled else True)
                ).astype(I32),
        evented=jnp.zeros((B,), I32),
        escaped=jnp.zeros((B,), I32),
        ev_thick=jnp.zeros((B,), I32),
        ev_isbb=jnp.zeros((B,), I32),
        ev_act=jnp.full((B,), -99, I32),
        ev_bfidx=jnp.zeros((B,), I32),
        ev_esc=jnp.zeros((B,), F32), ev_ff=jnp.zeros((B,), F32),
        ev_bf=jnp.zeros((B,), F32), ev_cont=jnp.zeros((B,), F32),
        ev_mgi=jnp.zeros((B,), I32),
        em_x=jnp.zeros((B,), F32), em_y=jnp.zeros((B,), F32),
        em_z=jnp.zeros((B,), F32), em_t=jnp.zeros((B,), F32),
        nsc=jnp.zeros((B,), I32), inkscat=jnp.zeros((B,), I32),
        est=jnp.zeros((ncells, 8), F32),
        gam=jnp.zeros((ncells, o_gamma.shape[2]), F32),
        bfh=jnp.zeros((ncells, o_bfheat.shape[2]), F32),
        rb=jnp.zeros((ncells, o_rb.shape[2]), F32),
        # streamed-bf kernels accumulate bf-rate estimators straight into the
        # o_bfr output ref (zero-initialised below) instead of a VMEM carry
        bfr=jnp.zeros((1, 128) if stream_bf else (ncells, o_bfr.shape[2]),
                      F32),
        jba=jnp.zeros((ncells, o_jb.shape[2]), F32),
        # per-lane counters, reduced ONCE after the crossing loop: a full
        # (B,)->scalar reduce every crossing measured as real per-crossing
        # cost in the round-3 ablation
        nadv=jnp.zeros((B,), F32), nesc=jnp.zeros((B,), F32),
        lum=jnp.zeros((B,), F32),
        n_escat=jnp.zeros((B,), F32), n_thickscat=jnp.zeros((B,), F32),
        ncrossb=jnp.zeros((B,), F32),
    )

    celliota = jax.lax.broadcasted_iota(I32, (B, ncells), 1)
    propiotaT = jax.lax.broadcasted_iota(I32, (nprop, B), 0)
    celliotaT = jax.lax.broadcasted_iota(I32, (ncells, B), 0)

    def one_crossing(it, s):
        mask = s["moving"] > 0
        tstart_e = s["t"]
        if cart3d:
            # --- 3D Cartesian: cell coords from the index (uniform cubic
            # grid, grid.cc:1419-1445); model cell from the MIDPOINT by the
            # model dimensionality: 1D radial shell search
            # (grid.cc:470-487), 2D (rcyl, z) binning (grid.cc:489-517),
            # 3D direct index ---
            rmax_c = consts[0, 3]
            cellf = s["cell"].astype(F32)
            nxy = float(nx * ny)
            i2f = jnp.floor(cellf / nxy)
            remf = cellf - i2f * nxy
            i1f = jnp.floor(remf / float(nx))
            i0f = remf - i1f * float(nx)
            wid = 2.0 * rmax_c / float(nx)
            pmin0 = -rmax_c + i0f * wid
            pmin1 = -rmax_c + i1f * wid
            pmin2 = -rmax_c + i2f * wid
            m0 = pmin0 + 0.5 * wid
            m1 = pmin1 + 0.5 * wid
            m2 = pmin2 + 0.5 * wid
            if model_dim == 2:
                vmax_c = rmax_c / tmin
                vrcyl = jnp.sqrt(m0 * m0 + m1 * m1) / tmin
                irm = jnp.floor(vrcyl / vmax_c * float(n_rcyl_m))
                izm = jnp.floor(
                    (m2 / tmin + vmax_c) / (2.0 * vmax_c) * float(n_z_m))
                valid_m = ((irm >= 0) & (irm < float(n_rcyl_m))
                           & (izm >= 0) & (izm < float(n_z_m)))
                mgi_model = jnp.where(
                    valid_m, izm * float(n_rcyl_m) + irm,
                    jnp.float32(nprop - 1)).astype(I32)
            elif model_dim == 3:
                mgi_model = s["cell"]
            else:
                # cellmin0 slot holds vout_model (pad +inf)
                cellvmid = jnp.sqrt(m0 * m0 + m1 * m1 + m2 * m2) / tmin
                mgi_model = jnp.sum(
                    jnp.where(cellmin0[0][None, :] < cellvmid[:, None], 1, 0),
                    axis=1, dtype=I32,
                )
            # cellmax0 slot holds nonemptymgi_of_mgi (float, -1 empty/pad);
            # the fused prop_tab is keyed by the model-grid index here
            gkey = mgi_model
        else:
            gkey = s["cell"]
        if tiled:
            # the fused prop_tab arrives as this block's (16, tile) slice
            gkey = gkey - tile0
        # transposed one-hot (nprop, B): the fused-gather dot result then
        # keeps B on the LANE dimension, so per-lane values are sublane-row
        # slices (no relayout)
        ohT_prop = (propiotaT == gkey[None, :]).astype(F32)
        if "nogather" in ablate:  # profiling only: constant cell values
            mgi = s["cell"]
            nonempty = mgi >= 0
            if tiled:
                lmgi = mgi - ne0
                nonempty = nonempty & (lmgi >= 0) & (lmgi < ncells)
                safe_mgi = jnp.clip(lmgi, 0, ncells - 1)
            else:
                safe_mgi = jnp.maximum(mgi, 0)
            oh = (celliota == safe_mgi[:, None]).astype(F32)
            one = jnp.float32(1.0)
            nne_p = s["px"] * 0.0 + nne_t[0, 0]
            te_p = s["px"] * 0.0 + te_t[0, 0]
            kgrey_p = s["px"] * 0.0 + kappagrey_t[0, 0]
            rho_p = s["px"] * 0.0 + rho_t[0, 0]
            thickf_p = s["px"] * 0.0
            chiffpart_p = s["px"] * 0.0 + chiffpart_t[0, 0]
            # mirror the production condition: thick==2 is the vpkt-only
            # flag and must NOT take the grey branch here
            thick = nonempty & (thickf_p > 0.5) & (thickf_p < 1.5)
            if not cart3d and not cyl2d:
                coordmin0 = s["px"] * 0.0 + cellmin0[0, 0]
                coordmax0 = s["px"] * 0.0 + cellmax0[0, nprop - 1]
        else:
            # --- fused cell-table gather: ONE one-hot MXU dot fetches mgi,
            # the six cell values and the 1D coord bounds together; the
            # (16, B) result keeps lanes on the lane dimension so each
            # value below is a free sublane-row slice ---
            gvT = jnp.dot(prop_tab[...], ohT_prop,
                          preferred_element_type=F32)
            mgi = jnp.round(gvT[0]).astype(I32)
            nonempty = mgi >= 0
            if tiled:
                # one-hots and accumulators are tile-local: row = mgi - ne0
                lmgi = mgi - ne0
                nonempty = nonempty & (lmgi >= 0) & (lmgi < ncells)
                safe_mgi = jnp.clip(lmgi, 0, ncells - 1)
            else:
                safe_mgi = jnp.maximum(mgi, 0)
            oh = (celliota == safe_mgi[:, None]).astype(F32)  # (B, ncells)

            nne_p, te_p, kgrey_p, rho_p, thickf_p, chiffpart_p = (
                gvT[1], gvT[2], gvT[3], gvT[4], gvT[5], gvT[6]
            )
            # grey transport only for thick==1; thick==2 is the vpkt-only
            # flag (update_grid.cc:1031-1035) and transports r-packets
            # normally
            thick = nonempty & (thickf_p > 0.5) & (thickf_p < 1.5)

            if not cart3d and not cyl2d:
                coordmin0, coordmax0 = gvT[7], gvT[8]

        # transposed cell one-hot for the estimator scatter dots: built
        # directly from mgi (a per-crossing transpose of `oh` would cost a
        # full relayout)
        ohT = (celliotaT == safe_mgi[None, :]).astype(F32)  # (ncells, B)

        # --- optical depth target ---
        if test_mode:
            tau_next = lane(test_tau)
        elif "norng" in ablate:  # profiling only
            tau_next = s["px"] * 0.0 + 0.693
        else:
            tau_next = -jnp.log(_u01((B,)))

        # --- spherical boundary distance (grid.cc:2349-2597) ---
        pos2 = s["px"] * s["px"] + s["py"] * s["py"] + s["pz"] * s["pz"]
        pdotd = s["px"] * s["dx"] + s["py"] * s["dy"] + s["pz"] * s["dz"]
        speed = CLIGHT_PROP  # |dir| == 1
        tstart = s["t"]
        big = jnp.float32(3.0e38)

        if cart3d:
            # --- 3D Cartesian boundary distance (grid.cc:2448-2597): the
            # six cell planes expand homologously; distance to the plane the
            # packet moves toward along each axis, min over axes ---
            sdist = big
            snext = jnp.full((B,), -1, I32)
            incs = (1, nx, nx * ny)
            nsz = (nx, ny, nz)
            pvals = (s["px"], s["py"], s["pz"])
            dvals = (s["dx"], s["dy"], s["dz"])
            ivals = (i0f, i1f, i2f)
            pmins = (pmin0, pmin1, pmin2)
            for ax in range(3):
                pd = pvals[ax]
                veld = dvals[ax] * CLIGHT_PROP
                up = (veld * tstart) > pd
                cb = jnp.where(up, pmins[ax] + wid, pmins[ax])
                # t_bound = (pd - veld t)/(cb - veld tmin) * tmin - t
                # (grid.cc:2448+ cellcrossing time in homologous coords)
                denom = cb - veld * tmin
                t_bound = (pd - veld * tstart) / jnp.where(
                    jnp.abs(denom) > 0, denom, 1e-30
                ) * tmin - tstart
                db = CLIGHT_PROP * t_bound
                ok = (db >= 0) & (db < sdist)
                # NOTE: select between two i1 vectors lowers to an i8
                # materialisation + trunci that Mosaic rejects on hardware
                # ("Unsupported target bitwidth for truncation") — use
                # logical ops instead of jnp.where on bools
                at_edge = (up & (ivals[ax] >= float(nsz[ax] - 1))) | (
                    ~up & (ivals[ax] <= 0.0))
                stp = jnp.where(up, jnp.int32(incs[ax]), jnp.int32(-incs[ax]))
                sdist = jnp.where(ok, db, sdist)
                snext = jnp.where(
                    ok,
                    jnp.where(at_edge, jnp.int32(BOUNDARY_ESCAPE),
                              s["cell"] + stp),
                    snext,
                )
        elif cyl2d:
            # --- 2D cylindrical boundary distance (grid.cc:2448-2597 /
            # grid.py boundary_distance CYLINDRICAL2D): expanding-shell
            # intersection in the xy-plane for the rcyl bounds plus a
            # Cartesian-style homologous plane crossing in z ---
            rmax_c = consts[0, 3]
            n0f = float(nx)
            n1f = float(ny)
            cellf = s["cell"].astype(F32)
            izf = jnp.floor(cellf / n0f)
            irf = cellf - izf * n0f
            dr = rmax_c / n0f
            dzw = 2.0 * rmax_c / n1f
            rin_t = irf * dr          # at tmin
            rout_t = (irf + 1.0) * dr
            zmin_c = -rmax_c + izf * dzw
            zmax_c = zmin_c + dzw

            dirxylen = jnp.sqrt(s["dx"] * s["dx"] + s["dy"] * s["dy"])
            has_xy = dirxylen > 1e-8
            sdl = jnp.maximum(dirxylen, 1e-8)
            dxn = s["dx"] / sdl
            dyn = s["dy"] / sdl
            xyspeed = sdl * CLIGHT_PROP
            pos2xy = s["px"] * s["px"] + s["py"] * s["py"]
            pdotdxy = s["px"] * dxn + s["py"] * dyn

            # squared radial-velocity sign test (see the spherical branch):
            # exact power-of-two prescale keeps the squares inside float32
            kgeo = jnp.float32(2.0 ** -33)
            sxy_k = (xyspeed * kgeo) * tstart  # (B,)

            def shell_xy(radius_t, inner):
                a = 1.0 - (radius_t / tstart / xyspeed) ** 2
                b = 2.0 * (pdotdxy - radius_t**2 / tstart / xyspeed)
                c = pos2xy - radius_t**2
                disc = b * b - 4.0 * a * c
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                inv2a = 0.5 / a
                d1 = (-b + sq) * inv2a
                d2 = (-b - sq) * inv2a

                rk = radius_t * kgeo

                def vr_parts(d):
                    fx = s["px"] + d * dxn
                    fy = s["py"] + d * dyn
                    r2k = jnp.maximum(fx * fx + fy * fy, 1.0) * (kgeo * kgeo)
                    dotf = (dxn * fx + dyn * fy) * kgeo
                    return dotf, (dotf * dotf) * (sxy_k * sxy_k), (rk * rk) * r2k

                dotf1, a21, b21 = vr_parts(d1)
                dotf2, a22, b22 = vr_parts(d2)
                if inner:
                    bad1 = (dotf1 > 0) & (a21 > b21)
                    bad2 = (dotf2 > 0) & (a22 > b22)
                else:
                    bad1 = (dotf1 <= 0) | (a21 < b21)
                    bad2 = (dotf2 <= 0) | (a22 < b22)
                eps = 2e-6 * radius_t
                d1 = jnp.where(bad1 | (d1 < eps), -1.0, d1)
                d2 = jnp.where(bad2 | (d2 < eps), -1.0, d2)
                both_neg = (d1 < 0) & (d2 < 0)
                dmin = jnp.where((d1 >= 0) & ((d2 < 0) | (d1 <= d2)), d1, d2)
                res = jnp.where(both_neg, -1.0, dmin)
                return jnp.where(disc > 0, res, -1.0)

            big3 = jnp.float32(3.0e38)
            sdist = jnp.full((B,), big3, F32)
            snext = jnp.full((B,), -1, I32)

            d_rcyl_max = shell_xy(rout_t, False)
            d_out = d_rcyl_max / sdl  # unit 3D dir: full dist = planar / sin
            ok = has_xy & (d_rcyl_max >= 0) & (d_out > 0) & (d_out < sdist)
            sdist = jnp.where(ok, d_out, sdist)
            snext = jnp.where(
                ok,
                jnp.where(irf >= n0f - 1.0, jnp.int32(BOUNDARY_ESCAPE),
                          s["cell"] + 1),
                snext,
            )

            d_rcyl_min = shell_xy(rin_t, True)
            d_rcyl_min = jnp.where(rin_t > 0, d_rcyl_min, -1.0)
            d_in = d_rcyl_min / sdl
            ok = has_xy & (d_rcyl_min >= 0) & (d_in < sdist)
            sdist = jnp.where(ok, d_in, sdist)
            snext = jnp.where(
                ok,
                jnp.where(irf <= 0.0, jnp.int32(BOUNDARY_ESCAPE),
                          s["cell"] - 1),
                snext,
            )

            velz = s["dz"] * CLIGHT_PROP
            up = (velz * tstart) > s["pz"]
            cb = jnp.where(up, zmax_c, zmin_c)
            denom = cb - velz * tmin
            t_zb = (s["pz"] - velz * tstart) / jnp.where(
                jnp.abs(denom) > 0, denom, 1e-30
            ) * tmin - tstart
            db = CLIGHT_PROP * t_zb
            ok = (db >= 0) & (db < sdist)
            # logical ops, not where-on-bools (Mosaic i1-select limitation)
            at_edge = (up & (izf >= n1f - 1.0)) | (~up & (izf <= 0.0))
            stp = jnp.where(up, jnp.int32(nx), jnp.int32(-nx))
            sdist = jnp.where(ok, db, sdist)
            snext = jnp.where(
                ok,
                jnp.where(at_edge, jnp.int32(BOUNDARY_ESCAPE), s["cell"] + stp),
                snext,
            )
        else:
            # scale factor for the squared radial-velocity sign test below:
            # an exact power of two, so the rescale costs no precision
            kgeo = jnp.float32(2.0 ** -33)
            st_k = (speed * kgeo) * tstart  # (B,) speed*tstart, prescaled

            def shell(radius_t, inner):
                a = 1.0 - (radius_t / tstart / speed) ** 2
                b = 2.0 * (pdotd - radius_t**2 / tstart / speed)
                c = pos2 - radius_t**2
                disc = b * b - 4.0 * a * c
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                inv2a = 0.5 / a
                d1 = (-b + sq) * inv2a
                d2 = (-b - sq) * inv2a

                # sign test v_r(d) > v_shell without radial()'s sqrt+div
                # chain: v_r = (dir.f) c / max(r,1), v_shell = radius_t /
                # tstart; both sides are scaled by the positive
                # max(r,1)*tstart and squared (the dot-product sign keeps
                # the inequality direction). All linear factors carry an
                # exact 2^-33 rescale so the squares stay inside float32.
                rk = radius_t * kgeo

                def vr_gt(d):
                    fx = s["px"] + d * s["dx"]
                    fy = s["py"] + d * s["dy"]
                    fz = s["pz"] + d * s["dz"]
                    r2k = jnp.maximum(
                        fx * fx + fy * fy + fz * fz, 1.0) * (kgeo * kgeo)
                    dotf = (s["dx"] * fx + s["dy"] * fy + s["dz"] * fz) * kgeo
                    # both sides carry the same k^4 scale: the comparison
                    # is exact up to float32 rounding of the products
                    a2 = (dotf * dotf) * (st_k * st_k)
                    return dotf, a2, (rk * rk) * r2k

                if inner:
                    dotf1, a21, b21 = vr_gt(d1)
                    dotf2, a22, b22 = vr_gt(d2)
                    bad1 = (dotf1 > 0) & (a21 > b21)
                    bad2 = (dotf2 > 0) & (a22 > b22)
                else:
                    dotf1, a21, b21 = vr_gt(d1)
                    dotf2, a22, b22 = vr_gt(d2)
                    bad1 = (dotf1 <= 0) | (a21 < b21)
                    bad2 = (dotf2 <= 0) | (a22 < b22)
                # float32 ping-pong guard: a packet sitting on the shell it
                # just crossed re-intersects it at d ~ roundoff and never
                # advances in time; intersections closer than a few ulps of the
                # shell radius are not physical (the reference runs in float64,
                # grid.cc:1222-1312)
                eps = 2e-6 * radius_t
                d1 = jnp.where(bad1 | (d1 < eps), -1.0, d1)
                d2 = jnp.where(bad2 | (d2 < eps), -1.0, d2)
                both_neg = (d1 < 0) & (d2 < 0)
                dmin = jnp.where(
                    (d1 >= 0) & ((d2 < 0) | (d1 <= d2)), d1, d2
                )
                res = jnp.where(both_neg, -1.0, dmin)
                # disc <= 0: no (or tangential) intersection (grid.cc:1240)
                return jnp.where(disc > 0, res, -1.0)

            r_outer = coordmax0 * tstart / tmin
            d_max = shell(r_outer, False)
            sdist = jnp.where((d_max >= 0) & (d_max < big), d_max, big)
            at_outer = s["cell"] == (nprop - 1)
            snext = jnp.where(
                d_max >= 0,
                jnp.where(at_outer, jnp.int32(BOUNDARY_ESCAPE), s["cell"] + 1),
                jnp.int32(-1),
            )
            r_inner = coordmin0 * tstart / tmin
            d_min = jnp.where(r_inner > 0, shell(r_inner, True), -1.0)
            take_min = (d_min >= 0) & (d_min < sdist)
            sdist = jnp.where(take_min, d_min, sdist)
            snext = jnp.where(
                take_min,
                jnp.where(s["cell"] == 0, jnp.int32(BOUNDARY_ESCAPE), s["cell"] - 1),
                snext,
            )

        if "nogeom" in ablate:  # profiling only: fixed small step, no shell
            sdist = s["px"] * 0.0 + max_path_step
            snext = s["cell"]

        # intra-cell step cap (grid.cc:2592-2594)
        capped = sdist > max_path_step
        sdist = jnp.where(capped, max_path_step, sdist)
        snext = jnp.where(capped, s["cell"], snext)

        tdist = jnp.maximum((t2 - tstart) * CLIGHT_PROP, 0.0)
        abort_dist = jnp.minimum(sdist, tdist)

        # --- doppler + abort-point frequency (rpkt.cc:49-61) ---
        def doppler_at(px, py, pz, t):
            if "nodop" in ablate:  # profiling only
                return 1.0 - px * 1e-30
            ndotv = (s["dx"] * px + s["dy"] * py + s["dz"] * pz) / t
            dop = 1.0 - ndotv / CLIGHT
            if relativistic:
                betasq = (px * px + py * py + pz * pz) / (t * t) / CLIGHTSQUARED
                dop = dop / jnp.sqrt(jnp.maximum(1.0 - betasq, 1e-30))
            return dop

        doppler = doppler_at(s["px"], s["py"], s["pz"], tstart)
        apx = s["px"] + s["dx"] * abort_dist
        apy = s["py"] + s["dy"] * abort_dist
        apz = s["pz"] + s["dz"] * abort_dist
        atime = tstart + abort_dist / CLIGHT_PROP
        nu_cmf_abort = s["nurf"] * doppler_at(apx, apy, apz, atime)
        dnudl = (nu_cmf_abort - s["nucmf"]) / jnp.maximum(abort_dist, 1e-30)
        dnudl = jnp.where(dnudl < 0, dnudl, -1e-30)

        need_chi = mask & nonempty & ~thick
        nu = jnp.where(need_chi, s["nucmf"], 1e15)

        # --- continuum opacities (rpkt.cc:972-1032) ---
        chi_escat = SIGMA_T * nne_p
        # nu**3 (~1e45) overflows float32: fold an exact power-of-two rescale
        # exactly as transport/opacity.calculate_chi_ffheating does; the
        # sqrt(T_e) and charge^2 sums live in chi_ff_nnionpart already
        nu3_scaled = (nu * 2.0**-50) ** 3
        # the 2**-150 rescale must be applied as two float32-representable
        # halves (2**-150 itself underflows a float32 literal to zero)
        # Mosaic has no expm1 lowering; the argument is O(1) so plain
        # exp is adequate in float32 here
        chi_ff = (chiffpart_p * 2.0**-75) * (nne_p * 2.0**-75) / nu3_scaled * (
            1.0 - jnp.exp(-4.799243681e-11 * nu / te_p)
        )

        hnu_kt = 4.799243681e-11 * nu / te_p  # (H/KB) nu / Te

        def _bf_slab_terms(edge_k, phixs_k, K):
            """in_window and the interpolated cross-section for one (B, K)
            slab of continua; sigma interp is a hat-function sum (dynamic
            fori keeps the module small — a static unroll of NPHIXS blocks
            made the Mosaic compile explode; the column is extracted with a
            masked reduce since dynamic lane offsets must be 128-aligned)."""
            in_w = (nu[:, None] >= edge_k) & (
                edge_k * last_nuovernuedge >= nu[:, None]
            ) & _col(need_chi)
            ireal_k = (nu[:, None] / edge_k - 1.0) / phixs_dnu  # (B, K)
            # phixs_k may carry 128-aligned column padding; the iota matches
            # its actual width and the fori bound (nphixs) never selects a
            # padded column
            piota_k = jax.lax.broadcasted_iota(I32, phixs_k.shape, 1)

            def phixs_term(p, sig):
                w = jnp.maximum(1.0 - jnp.abs(ireal_k - p.astype(F32)), 0.0)
                col = jnp.sum(jnp.where(piota_k == p, phixs_k, 0.0), axis=1)
                return sig + w * col[None, :]

            if "nophixs" in ablate:  # profiling only: constant cross-section
                sigma_k = jnp.zeros((B, K), F32) + phixs_k[:, 0][None, :]
            else:
                sigma_k = jax.lax.fori_loop(0, nphixs, phixs_term,
                                            jnp.zeros((B, K), F32))
            # Kramers tail above the table, zero below the edge
            numax_k = edge_k * last_nuovernuedge
            kram = phixs_k[:, nphixs - 1][None, :] * (
                numax_k / jnp.maximum(nu[:, None], 1e-30)) ** 3
            sigma_k = jnp.where(ireal_k < 0, 0.0, jnp.where(
                ireal_k < nphixs - 1, sigma_k, kram))
            return in_w, sigma_k

        # bf continuum selection uniform (also reused as the event-split
        # draw in test mode further down)
        if test_mode:
            sel_u = lane(test_sel)
        elif "norng" in ablate:  # profiling only
            sel_u = tau_next * 0.7
        else:
            sel_u = _u01((B,))

        if stream_bf:
            # windowed streaming: only the bf chunks intersecting the block's
            # [nu/last_nuovernuedge, nu] window are DMAed and evaluated (the
            # TPU analogue of the reference's allcontbegin/allcontend window,
            # rpkt.cc:805-811); per-chunk partial sums feed the deferred
            # selection pass after the event decision
            nchp = bf_ctab.shape[1]
            row0 = bf_ctab[0, :][None, :]  # chunk start edge (+inf pad)
            row1 = bf_ctab[1, :][None, :]  # next chunk start (+inf at end)
            nu_lo_w = nu / last_nuovernuedge
            c_first = jnp.sum(
                jnp.where(row1 <= nu_lo_w[:, None], 1.0, 0.0), axis=1)
            c_lastx = jnp.sum(
                jnp.where(row0 <= nu[:, None], 1.0, 0.0), axis=1)
            lane_has = need_chi & (c_lastx > c_first)
            bf_cb = jnp.minimum(
                jnp.min(jnp.where(lane_has, c_first, 1e9)),
                jnp.max(jnp.where(lane_has, c_lastx, 0.0))).astype(I32)
            bf_ce = jnp.max(jnp.where(lane_has, c_lastx, 0.0)).astype(I32)
            nch_iota_f = jax.lax.broadcasted_iota(I32, (1, nchp), 1).astype(F32)

            def bf_chi_body(c, carry):
                chi_acc, gam_acc, part = carry
                c0 = c * bf_chunk
                fetch_bf_chunk(c0)
                edge_k = bfedge_slab[0][None, :]
                in_w, sigma_k = _bf_slab_terms(edge_k, phixs_slab[:, :],
                                               bf_chunk)
                a_g = jnp.dot(oh, bfa_slab[:, :],
                              preferred_element_type=F32)
                dep_g = jnp.dot(oh, bfdep_slab[:, :],
                                preferred_element_type=F32)
                corr_k = jnp.maximum(
                    0.0, 1.0 - jnp.exp(jnp.clip(
                        dep_g - hnu_kt[:, None], -80.0, 80.0)))
                contrib_k = jnp.where(in_w, a_g * sigma_k * corr_k, 0.0)
                if "nobf" in ablate:  # profiling only
                    contrib_k = jnp.zeros((B, bf_chunk), F32)
                csum = jnp.sum(contrib_k, axis=1)
                chi_acc = chi_acc + csum
                part = part + csum[:, None] * (
                    nch_iota_f == c.astype(F32)).astype(F32)
                if want_gamma or want_bfheat:
                    contr_nl = jnp.where(
                        in_w, sigma_k * corr_k * bfprob_slab[0][None, :], 0.0)
                    gam_acc = gam_acc + jnp.dot(
                        contr_nl, gmap_slab[:, :ngc],
                        preferred_element_type=F32)
                return chi_acc, gam_acc, part

            chi_bf, gamma_contr_acc, bfpart = jax.lax.fori_loop(
                bf_cb, bf_ce, bf_chi_body,
                (jnp.zeros((B,), F32), jnp.zeros((B, ngc), F32),
                 jnp.zeros((B, nchp), F32)))
            gamma_contr = (gamma_contr_acc if (want_gamma or want_bfheat)
                           else None)
            bf_idx = jnp.zeros((B,), I32)  # resolved in the selection pass
            sigma = corr = in_window = None
        else:
            nu_edge_c = cont_nu_edge[0, :ncont][None, :]  # (1, C)
            in_window, sigma = _bf_slab_terms(
                nu_edge_c, cont_phixs[:ncont, :], ncont)
            a_g = jnp.dot(oh, bf_a[:, :ncont], preferred_element_type=F32)
            dep_g = jnp.dot(oh, bf_dep[:, :ncont], preferred_element_type=F32)
            corr = jnp.maximum(
                0.0, 1.0 - jnp.exp(jnp.clip(
                    dep_g - hnu_kt[:, None], -80.0, 80.0)))
            contrib_bf = jnp.where(in_window, a_g * sigma * corr, 0.0)
            if "nobf" in ablate:  # profiling only
                contrib_bf = jnp.zeros((B, ncont), F32)
            chi_bf = jnp.sum(contrib_bf, axis=1)

            if "nosel" in ablate:  # profiling only
                bf_idx = jnp.zeros((B,), I32)
            else:
                target = sel_u * chi_bf
                cumc = _cumsum_rows(contrib_bf)
                hit = cumc > target[:, None]
                first = _first_true_idx(hit, ncont)
                bf_idx = jnp.where(jnp.any(hit, axis=1), first, 0)

            # per-ground-continuum contributions for the LUT estimators:
            # sigma * probability * corrfactor (reference: rpkt.cc:870-880 —
            # multi-target continua contribute prob-weighted, NOT once each)
            if want_gamma or want_bfheat:
                contr_nolevel = jnp.where(
                    in_window, sigma * corr * cont_prob[0, :ncont][None, :],
                    0.0)
                # fold multi-target continua onto their ground continuum col
                gamma_contr = jnp.dot(
                    contr_nolevel, cont_gmap[:ncont, :],
                    preferred_element_type=F32,
                )  # (B, ngc)
            else:
                gamma_contr = None

        chi_cont_cmf = chi_escat + chi_ff + chi_bf
        chi_cont = chi_cont_cmf * doppler

        if expansion_mode:
            # --- binned expansion-opacity walk (port of
            # expansionopacity.get_event_expansion_batch; reference:
            # rpkt.cc:199-290) ---
            nb = expo_kappa.shape[-1]
            safe_chi = jnp.maximum(chi_cont, 1e-30)
            bidx = jax.lax.broadcasted_iota(I32, (1, nb), 1).astype(F32)
            valid_bin = bidx < jnp.float32(nbins_expo)
            # bin b's lower-nu edge at lambda = LMIN + (b+1) dl
            from .expansionopacity import DELTA_LAMBDA, LAMBDA_MIN
            lam_lo = LAMBDA_MIN + (bidx + 1.0) * DELTA_LAMBDA
            lam_hi = LAMBDA_MIN + bidx * DELTA_LAMBDA
            nu_lo_e = jnp.float32(1e8 * CLIGHT) / lam_lo  # (1, nb)
            nu_hi_e = jnp.where(
                bidx > 0, jnp.float32(1e8 * CLIGHT) / jnp.maximum(lam_hi, 1e-3),
                jnp.float32(0.0),
            )
            if relativistic:
                d_edge = (nu_lo_e - nu[:, None]) / dnudl[:, None]
                d_prev = jnp.where(
                    bidx > 0, (nu_hi_e - nu[:, None]) / dnudl[:, None], 0.0
                )
            else:
                d_edge = CLIGHT_PROP * tstart[:, None] * (nu[:, None] / nu_lo_e - 1.0)
                d_prev = jnp.where(
                    bidx > 0,
                    CLIGHT_PROP * tstart[:, None]
                    * (nu[:, None] / jnp.maximum(nu_hi_e, 1.0) - 1.0),
                    0.0,
                )
            d_edge = jnp.clip(d_edge, 0.0, 1e30)
            d_prev = jnp.clip(d_prev, 0.0, 1e30)
            seg = jnp.where(valid_bin, jnp.maximum(d_edge - d_prev, 0.0), 0.0)
            kap_rows = jnp.dot(oh, expo_kappa[:, :],
                               preferred_element_type=F32)  # (B, nb)
            chi_bb_b = kap_rows * (rho_p * doppler)[:, None]
            chi_t_b = safe_chi[:, None] + chi_bb_b
            dtau = chi_t_b * seg
            cum = _cumsum_rows_excl(dtau)
            hit = ((cum + dtau) >= tau_next[:, None]) & (seg > 0)
            any_hit = jnp.any(hit, axis=1)
            jsel_e = _first_true_idx(hit, nb)
            ohje = (jax.lax.broadcasted_iota(I32, (B, nb), 1)
                    == jsel_e[:, None])

            def picke(x):
                return jnp.sum(jnp.where(ohje, x, 0.0), axis=1)

            edist_x = picke(d_prev) + (tau_next - picke(cum)) / jnp.maximum(
                picke(chi_t_b), 1e-30
            )
            bb_frac = jnp.where(
                any_hit,
                picke(chi_bb_b) / jnp.maximum(picke(chi_t_b), 1e-30), 0.0,
            )
            if test_mode:
                u_bb = sel_u
            else:
                u_bb = _u01((B,))
            ev_edist = jnp.where(any_hit & need_chi,
                                 jnp.maximum(edist_x, 0.0), big)
            ev_isbb = any_hit & need_chi & (u_bb <= bb_frac)
            ev_ntr = jnp.full((B,), -1, I32)
            ev_act = jnp.full((B,), -99, I32)

        if not expansion_mode:
            # --- Sobolev line walk (port of linewalk.get_event_batch) ---
            # initial cursor: count of lines with nu > nu_cmf (descending
            # list). Only freshly (re-)emitted lanes carry ntr <= 0, so the
            # O(nlines) scan is skipped entirely on crossings where every
            # active lane already holds a cursor (the common case after the
            # first crossing of a dispatch).
            def count_body(bidx, acc):
                l0 = bidx * line_chunk
                nu_k = fetch_nu(l0)
                valid = (jax.lax.broadcasted_iota(I32, (1, line_chunk), 1)[0]
                         + l0) < nlines
                cnt = jnp.sum(
                    jnp.where(valid[None, :] & (nu_k[None, :] > nu[:, None]), 1, 0),
                    axis=1, dtype=I32,
                )
                return acc + cnt

            need_search = jnp.any((s["ntr"] <= 0) & need_chi)
            if "nowalk" in ablate:  # profiling only
                need_search = need_search & False
            searched = jax.lax.cond(
                need_search,
                lambda: jax.lax.fori_loop(0, nlineblocks, count_body,
                                          jnp.zeros((B,), I32)),
                lambda: jnp.zeros((B,), I32),
            )
            cursor0 = jnp.where(s["ntr"] > 0, s["ntr"], searched)
            cond_nolines = (s["ntr"] > nlines - 1) | (nu < nu_lastline)
            if "nowalk" in ablate:  # profiling only: every lane skips the walk
                cond_nolines = cond_nolines | (nu > 0)
            cursor0 = jnp.where(cond_nolines, nlines,
                                jnp.minimum(cursor0, nlines)).astype(I32)
            fresh_nolines = cursor0 >= nlines
            no_lines = cursor0 >= nlines

            safe_chi = jnp.maximum(chi_cont, 1e-30)
            nl_contdist = jnp.maximum(tau_next / safe_chi, 0.0)
            nl_cont = no_lines & need_chi & (nl_contdist <= abort_dist)
            nl_noev = no_lines & need_chi & ~nl_cont

            lw = dict(
                tau_cum=jnp.zeros((B,), F32),
                lastD=jnp.zeros((B,), F32),
                done=(~need_chi | no_lines).astype(I32),
                edist=jnp.where(nl_cont, nl_contdist, big),
                ntr=jnp.where(
                    nl_cont, jnp.int32(nlines + 1),
                    jnp.where(nl_noev & ~fresh_nolines, jnp.int32(nlines),
                              s["ntr"])).astype(I32),
                isbb=jnp.zeros((B,), I32),
                act=jnp.full((B,), -99, I32),
            )
            if want_jblue:
                lw["jba"] = s["jba"]
                # e_cmf/nu_cmf is invariant along free flight: the J_b_lu
                # increment at each swept line is t_line * CLIGHT * e0/nu0
                # (reference: rpkt.cc:151-167; linewalk.py jblue block)
                e_over_nu = jnp.where(
                    need_chi,
                    jnp.float32(CLIGHT) * s["ecmf"] / jnp.maximum(nu, 1.0),
                    0.0,
                )
                njbp = o_jb.shape[2] // 2
                jbcol = jax.lax.broadcasted_iota(I32, (line_chunk, njbp), 1).astype(F32)

            karange = jax.lax.broadcasted_iota(I32, (B, line_chunk), 1)

            def walk_body(bidx, w):
                l0 = bidx * line_chunk
                nu_k = fetch_nu(l0)[None, :]
                tau_blk_all = fetch_tau(l0)
                tau_blk = jnp.dot(oh, tau_blk_all, preferred_element_type=F32)
                l_glob = karange + l0
                below = l_glob < cursor0[:, None]
                beyond = l_glob > nlines - 1
                wdone = w["done"] > 0
                validk = ~below & ~beyond & ~_col(wdone)
                if relativistic:
                    relD = (nu_k - nu[:, None]) / dnudl[:, None]
                else:
                    relD = CLIGHT_PROP * tstart[:, None] * (nu[:, None] / nu_k - 1.0)
                # clamp: dnudl ~ -0 when abort_dist ~ 0 would give inf here, and
                # 0 * inf then NaN-poisons the whole walk
                relD = jnp.clip(relD, 0.0, 1e30)
                relD = jnp.where(validk, relD, 0.0)
                relD_prev = jnp.concatenate(
                    [w["lastD"][:, None], relD[:, :-1]], axis=1)
                t_prev = tstart[:, None] + relD_prev / CLIGHT_PROP
                tau_line = jnp.where(validk, tau_blk * t_prev, 0.0)
                s_cum = _cumsum_rows_excl(tau_line) + w["tau_cum"][:, None]
                # clamp: at the first terminal line the numerator is >= 0 in
                # exact arithmetic, but a -ulp rounding over 1e-30 opacity would
                # give a huge negative event distance
                contdist = jnp.maximum(
                    (tau_next[:, None] - s_cum) / safe_chi[:, None], 0.0)
                # logical form: Mosaic cannot select between i1 vectors
                ev_cont = (validk & (contdist <= relD)) | (
                    ~validk & (contdist <= abort_dist[:, None]))
                ev_abort = validk & (nu_k < nu_cmf_abort[:, None])
                ev_bb = validk & (
                    tau_next[:, None] - s_cum <= safe_chi[:, None] * relD + tau_line)
                terminal = ~below & (ev_cont | ev_abort | ev_bb | beyond) \
                    & ~_col(wdone)
                any_term = jnp.any(terminal, axis=1)
                jsel = _first_true_idx(terminal, line_chunk)
                ohj = (karange == jsel[:, None])

                def pick(x):
                    return jnp.sum(jnp.where(ohj, x, 0), axis=1)

                def pickb(x):
                    return jnp.any(ohj & x, axis=1)

                j_valid = pickb(validk)
                j_cont = pickb(ev_cont)
                j_abort = pickb(ev_abort) & ~j_cont
                j_bb = pickb(ev_bb) & ~j_cont & ~j_abort & j_valid
                j_cont_invalid = ~j_valid & j_cont
                j_noevent = ~j_valid & ~j_cont
                lineindex_j = jnp.clip(l0 + jsel, 0, nlines - 1).astype(I32)
                contdist_j = pick(contdist)
                relD_j = pick(relD)
                newly = any_term & ~wdone
                edist = jnp.where(newly & (j_cont | j_cont_invalid), contdist_j,
                                  w["edist"])
                edist = jnp.where(newly & j_bb, relD_j, edist)
                ntr = w["ntr"]
                ntr = jnp.where(newly & j_valid & (j_cont | j_abort), lineindex_j, ntr)
                ntr = jnp.where(newly & j_bb, lineindex_j + 1, ntr)
                ntr = jnp.where(newly & j_cont_invalid, jnp.int32(nlines + 1), ntr)
                ntr = jnp.where(
                    newly & j_noevent,
                    jnp.where(fresh_nolines, w["ntr"], lineindex_j), ntr)
                isbb = (newly & j_bb) | (~newly & (w["isbb"] > 0))
                act = jnp.where(newly & j_bb, lineindex_j, w["act"])
                not_term = ~any_term & ~wdone
                tau_cum = jnp.where(
                    not_term, w["tau_cum"] + jnp.sum(tau_line, axis=1), w["tau_cum"])
                lastD = jnp.where(
                    not_term, jnp.maximum(w["lastD"], jnp.max(relD, axis=1)),
                    w["lastD"])
                out_w = dict(tau_cum=tau_cum, lastD=lastD,
                             done=(wdone | any_term).astype(I32), edist=edist,
                             ntr=ntr, isbb=isbb.astype(I32), act=act)
                if want_jblue:
                    # lines swept before the terminal (plus the activating
                    # line on a bound-bound event) feed the J_b_lu detailed
                    # estimators: inc @ line→column one-hot, then cell-wise
                    # accumulation (reference: rpkt.cc:151-167)
                    passed = validk & (
                        ~_col(any_term) | (karange < jsel[:, None])
                        | ((karange == jsel[:, None]) & _col(j_bb))
                    )
                    t_line = tstart[:, None] + relD / CLIGHT_PROP
                    inc = jnp.where(passed, t_line * e_over_nu[:, None], 0.0)
                    ohmap = (fetch_jb(l0)[:, None] == jbcol).astype(F32)
                    tmp_inc = jnp.dot(inc, ohmap, preferred_element_type=F32)
                    tmp_cnt = jnp.dot(passed.astype(F32), ohmap,
                                      preferred_element_type=F32)
                    jrows = jnp.concatenate([tmp_inc, tmp_cnt], axis=1)
                    out_w["jba"] = w["jba"] + jnp.dot(
                        ohT, jrows, preferred_element_type=F32)
                return out_w

            # early-exit walk: skip blocks wholly below every lane's cursor
            # and stop as soon as every lane has terminated — the common
            # crossing touches one or two blocks of a production-size
            # linelist instead of all of them (the reference's per-packet
            # walk has the same early-out, rpkt.cc:92-196)
            start_blk = jnp.min(
                jnp.where(lw["done"] > 0, jnp.int32(nlineblocks * line_chunk),
                          cursor0)
            ) // line_chunk

            def walk_cond(c):
                bidx, w = c
                return jnp.logical_and(bidx < nlineblocks,
                                       jnp.any(w["done"] == 0))

            def walk_step(c):
                bidx, w = c
                return bidx + 1, walk_body(bidx, w)

            _, lw = jax.lax.while_loop(
                walk_cond, walk_step,
                (jnp.minimum(start_blk, nlineblocks).astype(I32), lw),
            )

            ev_edist, ev_ntr, ev_isbb, ev_act = (
                lw["edist"], lw["ntr"], lw["isbb"] > 0, lw["act"])
            if want_jblue:
                jba_new = lw["jba"]

        # thick cells: grey opacity
        chi_grey = kgrey_p * rho_p * doppler
        edist_thick = tau_next / jnp.maximum(chi_grey, 1e-30)
        edist = jnp.where(thick, edist_thick,
                          jnp.where(nonempty, ev_edist, big))
        next_trans = jnp.where(thick, jnp.int32(-1),
                               jnp.where(nonempty, ev_ntr, jnp.int32(-1)))
        is_bb = ~thick & nonempty & ev_isbb

        take_boundary = mask & (sdist <= tdist) & (sdist <= edist)
        take_event = mask & ~take_boundary & (edist <= tdist)
        take_tlimit = mask & ~take_boundary & ~take_event
        # overshoot boundary crossings by a few float32 ulps of the radius so
        # the packet lands firmly inside the next cell — rounding that leaves
        # it on the crossed shell makes it ping-pong between the two cells
        # forever (the reference's float64 positions make this a non-issue)
        r_here = jnp.sqrt(pos2)
        dist = jnp.where(take_boundary, sdist + 3e-6 * r_here,
                         jnp.where(take_event, edist, tdist))
        dist = jnp.maximum(dist, 0.0)

        # split continuum events: electron scattering and thick-cell grey
        # scattering are pure isotropic redirects handled IN-KERNEL so that
        # scatter-dominated straggler packets advance many events per
        # dispatch (the engine gates this path off when dipole or vpkt
        # machinery needs the full XLA event application)
        ev_cont_any = take_event & ~thick & ~is_bb & nonempty
        if test_mode or "norng" in ablate:
            u_split = sel_u
        else:
            u_split = _u01((B,))
        if inkernel_scatter:
            is_escat = ev_cont_any & (u_split * chi_cont_cmf < chi_escat)
            ev_thick_k = take_event & thick
        else:
            # dipole scattering / vpkt spawning live in the XLA event pass:
            # defer every event instead of redirecting in-kernel
            is_escat = ev_cont_any & (ev_cont_any != ev_cont_any)
            ev_thick_k = is_escat
        inkscat = is_escat | ev_thick_k
        take_event = take_event & ~inkscat

        # --- two half-moves with midpoint estimators ---
        h = dist * 0.5
        mx = s["px"] + s["dx"] * h
        my = s["py"] + s["dy"] * h
        mz = s["pz"] + s["dz"] * h
        mt = tstart + h / CLIGHT_PROP
        dop_mid = doppler_at(mx, my, mz, mt)
        nucmf1 = jnp.minimum(s["nurf"] * dop_mid, s["nucmf"])
        ecmf1 = s["erf"] * dop_mid
        seg = mask & nonempty
        contrib = jnp.where(seg, dist * ecmf1, 0.0)

        # ALL per-cell estimator scatters fuse into ONE one-hot MXU dot per
        # crossing (round-5: J/nuJ/ffheat + gamma-LUT + bfheating-LUT +
        # multibin-radfield + detailed-bf-rate previously each paid their own
        # (ncells, B) dot; merging streams the one-hot through the MXU once).
        # Masking lives in the row VALUES — every column is already zeroed on
        # inactive lanes via `contrib`/`de`/`w_bfr`/`ohb` — so the former
        # per-pass (ncells, B) one-hot maskings were redundant vector work
        # and are dropped.
        est_rows = jnp.stack(
            [contrib, contrib * nucmf1,
             jnp.where(seg & ~thick, contrib * chi_ff, 0.0),
             jnp.zeros_like(contrib),
             jnp.zeros_like(contrib), jnp.zeros_like(contrib),
             jnp.zeros_like(contrib), jnp.zeros_like(contrib)], axis=1,
        )  # (B, 8)
        gam_new = s["gam"]
        bfh_new = s["bfh"]
        rb_new = s["rb"]
        bfr_new = s["bfr"]
        if "noest" in ablate:  # profiling only: skip every estimator scatter
            est_new = s["est"]
        else:
            parts = [est_rows]
            widths = []  # (name, width) slices after the fused dot
            if want_gamma or want_bfheat:
                seg_ok = seg & ~thick
                de = jnp.where(_col(seg_ok),
                               contrib[:, None] * gamma_contr, 0.0)
                if want_gamma:
                    gadd = de / jnp.maximum(nucmf1, 1e-30)[:, None]
                    parts.append(jnp.concatenate(
                        [gadd, jnp.zeros((B, s["gam"].shape[1] - ngc), F32)],
                        axis=1))
                    widths.append(("gam", s["gam"].shape[1]))
                if want_bfheat:
                    badd = de * jnp.maximum(
                        1.0 - gc_nu_edge[0, :ngc][None, :]
                        / jnp.maximum(nucmf1, 1e-30)[:, None], 0.0)
                    parts.append(jnp.concatenate(
                        [badd, jnp.zeros((B, s["bfh"].shape[1] - ngc), F32)],
                        axis=1))
                    widths.append(("bfh", s["bfh"].shape[1]))
            if multibin:
                # per-bin J/nuJ/count at the segment midpoint (reference:
                # radfield.cc:731-759; engine XLA _rpkt_accumulate multibin)
                from ..plasma.radfield import (
                    NU_LOWER_FIRST, NU_UPPER_LAST, NU_UPPER_SUPERBIN,
                )
                nbp = o_rb.shape[2] // 3
                delta_nu = (NU_UPPER_LAST - NU_LOWER_FIRST) / (nradbins - 1)
                bsel = jnp.floor((nucmf1 - jnp.float32(NU_LOWER_FIRST))
                                 / jnp.float32(delta_nu))
                bsel = jnp.where(nucmf1 >= jnp.float32(NU_UPPER_LAST),
                                 jnp.float32(nradbins - 1), bsel)
                bsel = jnp.clip(bsel, 0.0, float(nradbins - 1))
                inside = seg & (nucmf1 >= jnp.float32(NU_LOWER_FIRST)) & (
                    nucmf1 < jnp.float32(NU_UPPER_SUPERBIN))
                biota = jax.lax.broadcasted_iota(I32, (B, nbp), 1).astype(F32)
                ohb = jnp.where(
                    _col(inside), (biota == bsel[:, None]).astype(F32), 0.0)
                parts.append(jnp.concatenate([
                    ohb * contrib[:, None],
                    ohb * (contrib * nucmf1)[:, None],
                    ohb,
                ], axis=1))
                widths.append(("rb", 3 * nbp))
            if want_bfrate and not stream_bf:
                # detailed per-continuum photoionisation-rate estimators
                # (reference: radfield.cc:204-233; XLA counterpart
                # opacity.accumulate_bf_estimators), reusing the sigma/corr
                # window already computed for chi_bf
                seg_nothick = seg & ~thick
                w_bfr = jnp.where(
                    seg_nothick,
                    contrib / jnp.maximum(nucmf1, 1e-30) * doppler, 0.0)
                bfr_rows = jnp.where(
                    in_window, sigma * corr * cont_prob[0, :ncont][None, :],
                    0.0) * w_bfr[:, None]
                Cp = o_bfr.shape[2]
                if Cp > ncont:
                    bfr_rows = jnp.concatenate(
                        [bfr_rows, jnp.zeros((B, Cp - ncont), F32)], axis=1)
                parts.append(bfr_rows)
                widths.append(("bfr", Cp))
            fused = jnp.dot(
                ohT, parts[0] if len(parts) == 1
                else jnp.concatenate(parts, axis=1),
                preferred_element_type=F32)
            est_new = s["est"] + fused[:, :8]
            off = 8
            outs = {}
            for name, w in widths:
                outs[name] = fused[:, off:off + w]
                off += w
            if "gam" in outs:
                gam_new = s["gam"] + outs["gam"]
            if "bfh" in outs:
                bfh_new = s["bfh"] + outs["bfh"]
            if "rb" in outs:
                rb_new = s["rb"] + outs["rb"]
            if "bfr" in outs:
                bfr_new = s["bfr"] + outs["bfr"]

        if not (want_jblue and not expansion_mode):
            jba_new = s["jba"]

        if stream_bf:
            # second windowed pass: continuum selection for the lanes that
            # took a continuum event this crossing, plus (optionally) the
            # detailed bf-rate accumulation — both need per-chunk sigma/corr
            # again, and the bf-rate weight needs the segment length, so
            # this pass runs after the event decision
            sel_need = take_event & ~thick & ~is_bb & nonempty
            targetc = sel_u * chi_bf
            cumpart = _cumsum_rows(bfpart)
            hitc = cumpart > targetc[:, None]
            nchp2 = bfpart.shape[1]
            cstar = _first_true_idx(hitc, nchp2)
            has_hitc = jnp.any(hitc, axis=1)
            cum_excl = cumpart - bfpart
            nch_iota_i = jax.lax.broadcasted_iota(I32, (B, nchp2), 1)
            residc = targetc - jnp.sum(
                jnp.where(nch_iota_i == cstar[:, None], cum_excl, 0.0),
                axis=1)
            want_sel = sel_need & has_hitc
            if want_bfrate:
                seg_nothick = seg & ~thick
                w_bfr = jnp.where(
                    seg_nothick,
                    contrib / jnp.maximum(nucmf1, 1e-30) * doppler, 0.0)
                any_bfr = jnp.any(seg_nothick)
            else:
                any_bfr = jnp.zeros((), bool)

            def bf_sel_body(c, bfidx_c):
                c0 = c * bf_chunk
                pred = jnp.any(want_sel & (cstar == c)) | any_bfr

                def do(bfidx_c):
                    fetch_bf_chunk(c0)
                    edge_k = bfedge_slab[0][None, :]
                    in_w, sigma_k = _bf_slab_terms(edge_k, phixs_slab[:, :],
                                                   bf_chunk)
                    a_g = jnp.dot(oh, bfa_slab[:, :],
                                  preferred_element_type=F32)
                    dep_g = jnp.dot(oh, bfdep_slab[:, :],
                                    preferred_element_type=F32)
                    corr_k = jnp.maximum(
                        0.0, 1.0 - jnp.exp(jnp.clip(
                            dep_g - hnu_kt[:, None], -80.0, 80.0)))
                    contrib_k = jnp.where(in_w, a_g * sigma_k * corr_k, 0.0)
                    cum_k = _cumsum_rows(contrib_k)
                    here = want_sel & (cstar == c)
                    hit_k = cum_k > residc[:, None]
                    idx_k = _first_true_idx(hit_k, bf_chunk)
                    bfidx_c = jnp.where(
                        here & jnp.any(hit_k, axis=1), c0 + idx_k, bfidx_c)
                    if want_bfrate:
                        # rows are self-masked through w_bfr; raw ohT is safe
                        bfr_rows = jnp.where(
                            in_w,
                            sigma_k * corr_k * bfprob_slab[0][None, :],
                            0.0) * w_bfr[:, None]
                        add = jnp.dot(ohT, bfr_rows,
                                      preferred_element_type=F32)
                        cur = o_bfr[0, :, pl.ds(c0, bf_chunk)]
                        o_bfr[0, :, pl.ds(c0, bf_chunk)] = cur + add
                    return bfidx_c

                return jax.lax.cond(pred, do, lambda b: b, bfidx_c)

            bf_idx = jax.lax.fori_loop(bf_cb, bf_ce, bf_sel_body, bf_idx)
        # (non-stream bf-rate and multibin scatters now ride the fused
        # estimator dot above)

        # second half-move
        fx = mx + s["dx"] * h
        fy = my + s["dy"] * h
        fz = mz + s["dz"] * h
        ft = mt + h / CLIGHT_PROP
        dop2 = doppler_at(fx, fy, fz, ft)
        nucmf2 = jnp.minimum(s["nurf"] * dop2, nucmf1)
        ecmf2 = s["erf"] * dop2

        # compensated t += dist/c (ft is kept for positions/doppler; it can
        # differ from the Kahan-accurate time by at most one ulp)
        kah_y = dist / CLIGHT_PROP - s["terr"]
        kah_t = tstart + kah_y
        kah_err = (kah_t - tstart) - kah_y
        new_t = jnp.where(take_tlimit, t2,
                          jnp.where(mask, kah_t, s["t"]))
        new_terr = jnp.where(take_tlimit, 0.0,
                             jnp.where(mask, kah_err, s["terr"]))
        px = jnp.where(mask, fx, s["px"])
        py = jnp.where(mask, fy, s["py"])
        pz = jnp.where(mask, fz, s["pz"])
        nucmf_out = jnp.where(mask, nucmf2, s["nucmf"])
        ecmf_out = jnp.where(mask, ecmf2, s["ecmf"])
        ntr_keep = jnp.where(mask & ~thick & nonempty, next_trans, s["ntr"])
        ntr_keep = jnp.where(mask & ~nonempty, jnp.int32(-1), ntr_keep)

        escaping = take_boundary & (snext == BOUNDARY_ESCAPE)
        crossing = take_boundary & (snext >= 0)
        cell_out = jnp.where(crossing, snext, s["cell"])
        if tiled:
            # a packet crossing out of this block's tile pauses (moving=0):
            # the next dispatch re-sorts it into a block of its new tile —
            # free in diffusion-dominated cells, bounded by the tile's
            # surface-to-volume ratio in streaming regimes (PERF.md design)
            out_tile = crossing & (
                (snext < tile0) | (snext >= tile0 + tile))
        else:
            out_tile = crossing & (crossing != crossing)  # all-False

        # isotropic re-emission in the cmf at the post-move position
        # (reference: rpkt.cc:945-970 emit_rpkt; rpkt.cc:292-409 isotropic
        # branch of electron_scatter_rpkt)
        if test_mode:
            z1 = jnp.full((B,), 0.37, F32)
            z2 = jnp.full((B,), 0.81, F32)
        elif "norng" in ablate:  # profiling only
            z1 = s["px"] * 0.0 + 0.37
            z2 = s["px"] * 0.0 + 0.81
        else:
            z1 = _u01((B,))
            z2 = _u01((B,))
        if "noemit" in ablate:  # profiling only: keep the old direction
            ndx, ndy, ndz = s["dx"], s["dy"], s["dz"]
            dop_sc = 1.0 + z1 * 1e-30
        else:
            zmu = 2.0 * z1 - 1.0
            zphi = 2.0 * jnp.float32(np.pi) * z2
            sinm = jnp.sqrt(jnp.maximum(1.0 - zmu * zmu, 0.0))
            cdx = sinm * jnp.cos(zphi)
            cdy = sinm * jnp.sin(zphi)
            cdz = zmu
            # aberration with v = -pos/t (vectors.h:61-74)
            inv_t = 1.0 / ft
            vx = -fx * inv_t
            vy = -fy * inv_t
            vz = -fz * inv_t
            vsqr = (vx * vx + vy * vy + vz * vz) / CLIGHTSQUARED
            grel = 1.0 / jnp.sqrt(jnp.maximum(1.0 - vsqr, 1e-30))
            ndotv = cdx * vx + cdy * vy + cdz * vz
            fact1 = grel * (1.0 - ndotv / CLIGHT)
            fact2 = (grel - grel * grel * ndotv / (grel + 1.0) / CLIGHT) / CLIGHT
            ndx = (cdx - vx * fact2) / fact1
            ndy = (cdy - vy * fact2) / fact1
            ndz = (cdz - vz * fact2) / fact1
            nlen = jnp.sqrt(ndx * ndx + ndy * ndy + ndz * ndz)
            ndx = ndx / nlen
            ndy = ndy / nlen
            ndz = ndz / nlen
            ndotv_sc = (ndx * fx + ndy * fy + ndz * fz) / ft
            dop_sc = 1.0 - ndotv_sc / CLIGHT
            if relativistic:
                beta2_sc = (fx * fx + fy * fy + fz * fz) / (ft * ft) / CLIGHTSQUARED
                dop_sc = dop_sc / jnp.sqrt(jnp.maximum(1.0 - beta2_sc, 1e-30))

        upd = lambda name, val: jnp.where(take_event, val, s[name])
        return dict(
            px=px, py=py, pz=pz,
            dx=jnp.where(inkscat, ndx, s["dx"]),
            dy=jnp.where(inkscat, ndy, s["dy"]),
            dz=jnp.where(inkscat, ndz, s["dz"]),
            nurf=jnp.where(inkscat, nucmf_out / dop_sc, s["nurf"]),
            nucmf=nucmf_out,
            erf=jnp.where(inkscat, ecmf_out / dop_sc, s["erf"]),
            ecmf=ecmf_out,
            t=new_t, terr=new_terr, cell=cell_out,
            ntr=ntr_keep,
            em_x=jnp.where(inkscat, fx, s["em_x"]),
            em_y=jnp.where(inkscat, fy, s["em_y"]),
            em_z=jnp.where(inkscat, fz, s["em_z"]),
            em_t=jnp.where(inkscat, ft, s["em_t"]),
            nsc=s["nsc"] + inkscat.astype(I32),
            inkscat=(inkscat | (s["inkscat"] > 0)).astype(I32),
            moving=(mask & ~take_event & ~take_tlimit & ~escaping
                    & ~out_tile).astype(I32),
            evented=((s["evented"] > 0) | take_event).astype(I32),
            escaped=((s["escaped"] > 0) | escaping).astype(I32),
            ev_thick=((take_event & thick)
                      | (~take_event & (s["ev_thick"] > 0))).astype(I32),
            ev_isbb=((take_event & is_bb)
                     | (~take_event & (s["ev_isbb"] > 0))).astype(I32),
            ev_act=upd("ev_act", ev_act),
            ev_bfidx=upd("ev_bfidx", bf_idx),
            ev_esc=upd("ev_esc", chi_escat),
            ev_ff=upd("ev_ff", chi_ff),
            ev_bf=upd("ev_bf", chi_bf),
            ev_cont=upd("ev_cont", chi_cont_cmf),
            ev_mgi=upd("ev_mgi", mgi),
            est=est_new,
            gam=gam_new, bfh=bfh_new, rb=rb_new, bfr=bfr_new, jba=jba_new,
            nadv=s["nadv"] + mask.astype(F32),
            nesc=s["nesc"] + escaping.astype(F32),
            lum=s["lum"] + jnp.where(escaping, ecmf_out, 0.0),
            n_escat=s["n_escat"] + is_escat.astype(F32),
            n_thickscat=s["n_thickscat"] + ev_thick_k.astype(F32),
            ncrossb=s["ncrossb"] + crossing.astype(F32),
        )

    def crossing_cond(c):
        it, s = c
        return jnp.logical_and(it < max_inner, jnp.any(s["moving"] > 0))

    def crossing_body(c):
        it, s = c
        return it + 1, one_crossing(it, s)

    if stream_bf:
        # streamed-bf kernels read-modify-write o_bfr inside the loop: in
        # tiled mode only the first block of each tile run may zero it
        if tiled:
            @pl.when(first_visit)
            def _zero_bfr():
                o_bfr[0] = jnp.zeros((ncells, o_bfr.shape[2]), F32)
        else:
            o_bfr[0] = jnp.zeros((ncells, o_bfr.shape[2]), F32)

    _, state = jax.lax.while_loop(crossing_cond, crossing_body,
                                  (jnp.int32(0), state))

    if tiled:
        # revisited per-tile accumulators: zero on the run's first block,
        # then accumulate this block's loop-carried contributions
        def acc(ref, val):
            ref[0] = jnp.where(first_visit, 0.0, ref[0]) + val
    else:
        def acc(ref, val):
            ref[0] = val

    o_posx[0, :] = state["px"]; o_posy[0, :] = state["py"]
    o_posz[0, :] = state["pz"]
    o_dirx[0, :] = state["dx"]; o_diry[0, :] = state["dy"]
    o_dirz[0, :] = state["dz"]
    o_nu_rf[0, :] = state["nurf"]; o_nu_cmf[0, :] = state["nucmf"]
    o_e_rf[0, :] = state["erf"]; o_e_cmf[0, :] = state["ecmf"]
    o_prop_time[0, :] = state["t"]
    o_where[0, :] = state["cell"]; o_next_trans[0, :] = state["ntr"]
    o_evented[0, :] = state["evented"]
    o_escaped[0, :] = state["escaped"]
    o_thick[0, :] = state["ev_thick"]
    o_is_bb[0, :] = state["ev_isbb"]
    o_act_line[0, :] = state["ev_act"]
    o_bf_idx[0, :] = state["ev_bfidx"]
    o_chi_escat[0, :] = state["ev_esc"]; o_chi_ff[0, :] = state["ev_ff"]
    o_chi_bf[0, :] = state["ev_bf"]; o_chi_cont[0, :] = state["ev_cont"]
    o_mgi[0, :] = state["ev_mgi"]
    o_em_x[0, :] = state["em_x"]; o_em_y[0, :] = state["em_y"]
    o_em_z[0, :] = state["em_z"]; o_em_t[0, :] = state["em_t"]
    o_nsc[0, :] = state["nsc"]; o_inkscat[0, :] = state["inkscat"]
    # total boundary-crossing count rides in est[0, 3] (see engine unpack)
    acc(o_est, state["est"] + (
        (jax.lax.broadcasted_iota(I32, (ncells, 8), 0) == 0)
        & (jax.lax.broadcasted_iota(I32, (ncells, 8), 1) == 3)
    ).astype(F32) * jnp.sum(state["ncrossb"]))
    acc(o_gamma, state["gam"])
    acc(o_bfheat, state["bfh"])
    acc(o_rb, state["rb"])
    if not stream_bf:
        acc(o_bfr, state["bfr"])
    acc(o_jb, state["jba"])
    mrow = jax.lax.broadcasted_iota(I32, (1, 8, 128), 1)
    mcol = jax.lax.broadcasted_iota(I32, (1, 8, 128), 2)
    misc = jnp.zeros((1, 8, 128), F32)
    for slot, val in enumerate(
        (jnp.sum(state["nadv"]), jnp.sum(state["nesc"]),
         jnp.sum(state["lum"]), t2, tmin,
         jnp.sum(state["n_escat"]), jnp.sum(state["n_thickscat"]))
    ):
        misc = misc + jnp.where((mrow == slot) & (mcol == 0), val, 0.0)
    o_misc[:] = misc


@partial(
    jax.jit,
    static_argnames=(
        "nlines", "ncont", "nprop", "ncells", "ngc", "nphixs", "line_chunk",
        "max_inner", "relativistic", "want_gamma", "want_bfheat",
        "test_mode", "block", "phixs_dnu", "last_nuovernuedge",
        "expansion_mode", "nbins_expo", "cart3d", "cyl2d", "nx", "ny", "nz",
        "stream_lines", "stream_bf", "bf_chunk", "inkernel_scatter",
        "multibin", "nradbins",
        "want_bfrate", "want_jblue", "njblue",
        "model_dim", "n_rcyl_m", "n_z_m", "tiled", "tile", "ablate",
    ),
)
def propagate_blocked(
    seed,  # int32 scalar
    lane_f32,  # dict of (N,) float32 arrays
    lane_i32,  # dict of (N,) int32 arrays (where, next_trans, moving)
    tables,  # dict of table arrays (f32 / with mgi map as f32)
    test_tau, test_sel,  # (N,) f32 (ignored unless test_mode)
    t2, tmin, max_path_step,  # traced f32 scalars
    *, nlines, ncont, nprop, ncells, ngc, nphixs, line_chunk, max_inner,
    relativistic, phixs_dnu, last_nuovernuedge,
    want_gamma, want_bfheat, test_mode, block,
    expansion_mode=False, nbins_expo=0,
    cart3d=False, cyl2d=False, nx=1, ny=1, nz=1, rmax=0.0,
    stream_lines=False, stream_bf=False, bf_chunk=256,
    inkernel_scatter=True,
    multibin=False, nradbins=0, want_bfrate=False,
    want_jblue=False, njblue=0,
    model_dim=1, n_rcyl_m=1, n_z_m=1,
    tiled=False, tile=0, block_tile=None, block_ne0=None, ablate=(),
):
    """In tiled mode (tile-sorted dispatch for O(100^3) 3D models):
    `ncells` is the PER-TILE accumulator row count (mpad), `nprop` == tile,
    block_tile/block_ne0 are (nblocks,) scalar-prefetch arrays, lanes arrive
    pre-sorted by tile with tile-homogeneous blocks, and the per-mgi tables
    in `tables` arrive GLOBAL-height (row-padded by mpad for the slab DMA).
    stream_lines/stream_bf must be set by the caller whenever the respective
    table is non-trivial (the kernel only row-slices the streamed forms)."""
    n = lane_f32["posx"].shape[0]
    assert n % block == 0
    nblocks = n // block
    ngc_pad = _round_up(max(ngc, 1), 128)
    if block_tile is None:
        block_tile = jnp.zeros((1,), I32)
    if block_ne0 is None:
        block_ne0 = jnp.zeros((1,), I32)
    if tiled:
        # caller passes GLOBAL ncells/nprop; the kernel's static dims are
        # per-tile: one (16, tile) prop_tab slice and mpad accumulator rows
        mpad = tile + 8
        ntiles = -(-nprop // tile)
        k_ncells, k_nprop = mpad, tile
        assert stream_lines and not expansion_mode
    else:
        mpad = ntiles = 0
        k_ncells, k_nprop = ncells, nprop

    if stream_bf:
        # pad the bf tables to a whole number of DMA chunks and build the
        # (2, nchunks) chunk-edge table the kernel uses to bound each
        # crossing's nu window (edges ascend; pads are +inf = never in
        # window)
        cpad_bf = _round_up(max(ncont, 1), bf_chunk)
        nch = cpad_bf // bf_chunk

        def _padlast(x, width, fill=0.0):
            if x.shape[-1] < width:
                padw = [(0, 0)] * (x.ndim - 1) + [(0, width - x.shape[-1])]
                return jnp.pad(x, padw, constant_values=fill)
            return x

        def _padrows(x, rows, fill=0.0):
            if x.shape[0] < rows:
                return jnp.pad(x, ((0, rows - x.shape[0]), (0, 0)),
                               constant_values=fill)
            return x

        tables = dict(tables)
        tables["cont_nu_edge"] = _padlast(
            jnp.reshape(tables["cont_nu_edge"], (1, -1)), cpad_bf,
            fill=float("inf"))
        tables["bf_a"] = _padlast(tables["bf_a"], cpad_bf)
        tables["bf_dep"] = _padlast(tables["bf_dep"], cpad_bf)
        tables["cont_prob"] = _padlast(
            jnp.reshape(tables["cont_prob"], (1, -1)), cpad_bf)
        # DMA-sliced slabs need 128-aligned column widths too (Mosaic:
        # "Slice shape along dimension 1 must be aligned to tiling (128)"),
        # so pad the phixs/gmap column dims; in-kernel math masks by the
        # logical widths (nphixs/ngc) so zero-padded columns are inert
        tables["cont_phixs"] = _padlast(
            _padrows(tables["cont_phixs"], cpad_bf), _round_up(nphixs, 128))
        tables["cont_gmap"] = _padlast(
            _padrows(tables["cont_gmap"], cpad_bf),
            _round_up(max(ngc, 1), 128))
        nchp = _round_up(nch, 128)
        edges_flat = tables["cont_nu_edge"][0]
        starts = edges_flat[:: bf_chunk]  # (nch,)
        nexts = jnp.concatenate(
            [starts[1:], jnp.full((1,), jnp.inf, F32)])
        bf_ctab = jnp.stack([
            jnp.concatenate(
                [starts, jnp.full((nchp - nch,), jnp.inf, F32)]),
            jnp.concatenate(
                [nexts, jnp.full((nchp - nch,), jnp.inf, F32)]),
        ])  # (2, nchp)
    else:
        bf_ctab = jnp.full((2, 128), jnp.inf, F32)

    lane_names = ["posx", "posy", "posz", "dirx", "diry", "dirz", "nu_rf",
                  "nu_cmf", "e_rf", "e_cmf", "prop_time"]
    int_names = ["where", "next_trans", "moving"]

    # per-block lane slices: each grid step only moves its own B lanes
    lane_spec = pl.BlockSpec((1, block), lambda i, *_: (0, i),
                             memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    def as_row(x):
        return x.reshape(1, -1) if x.ndim == 1 else x

    # --- fused gather table: one (16, nprop) @ (nprop, B) MXU dot per
    # crossing fetches mgi + the six cell values (+ the 1D coord bounds)
    # together.  It is stored TRANSPOSED so each per-lane value is a
    # sublane-row slice of the (16, B) result: extracting a lane COLUMN
    # to a (B,) vector forces a sublane<->lane relayout in Mosaic, which
    # measured as the dominant per-crossing cost (round-3 ablation).
    # Row key: prop cell for 1D/2D grids, model-grid index for 3D (whose
    # cellmax0 slot holds nonemptymgi_of_mgi).
    key = (tables["cellmax0"] if cart3d
           else tables["mgi_of_cell"]).reshape(-1)[:nprop].astype(F32)
    safe = jnp.clip(jnp.round(key).astype(I32), 0, max(ncells - 1, 0))

    def _bymgi(name):
        return tables[name].reshape(-1)[safe].astype(F32)

    zcol = jnp.zeros((nprop,), F32)
    if cart3d:
        bmin, bmax = zcol, zcol
    else:
        bmin = tables["cellmin0"].reshape(-1)[:nprop].astype(F32)
        bmax = tables["cellmax0"].reshape(-1)[:nprop].astype(F32)
    prop_tab = jnp.stack(
        [key, _bymgi("nne"), _bymgi("Te"), _bymgi("kappagrey"),
         _bymgi("rho"), _bymgi("thick"), _bymgi("chiffpart"), bmin, bmax]
        + [zcol] * 7, axis=0)  # (16, nprop)
    tables = {k: as_row(v) for k, v in tables.items()}
    if tiled:
        # pad prop_tab width to whole tiles; pad cells read as empty (mgi -1)
        wpad = ntiles * tile
        if prop_tab.shape[1] < wpad:
            w = wpad - prop_tab.shape[1]
            prop_tab = jnp.concatenate(
                [prop_tab,
                 jnp.concatenate([jnp.full((1, w), -1.0, F32),
                                  jnp.zeros((15, w), F32)])], axis=1)
        # the kernel reads cell values only through prop_tab on eligible
        # (cart3d 3D-model) grids: drop the global per-cell/per-prop tables
        # so they don't occupy VMEM (nogather ablation reads [0, 0] only)
        z128 = jnp.zeros((1, 128), F32)
        for nm in ("mgi_of_cell", "cellmin0", "cellmax0", "nne", "Te",
                   "kappagrey", "rho", "thick", "chiffpart"):
            tables[nm] = z128
        # slab DMAs read rows [ne0, ne0+mpad): row-pad the per-mgi tables.
        # Idempotent (targets ncells+mpad rows): the driver pre-pads the big
        # tau table once per timestep so no multi-GB pad copy lands in every
        # dispatch program
        def _rowpad(x):
            target = ncells + mpad
            if x.shape[0] >= target:
                return x
            return jnp.pad(x, ((0, target - x.shape[0]), (0, 0)))
        tables["tau_factor"] = _rowpad(tables["tau_factor"])
        if stream_bf:
            tables["bf_a"] = _rowpad(tables["bf_a"])
            tables["bf_dep"] = _rowpad(tables["bf_dep"])
        else:
            # no bf continua in this config: per-tile dummies keep the
            # resident-path dot shapes consistent (in_window is all-False)
            tables["bf_a"] = jnp.zeros((mpad, 128), F32)
            tables["bf_dep"] = jnp.zeros((mpad, 128), F32)
    tables["prop_tab"] = prop_tab

    # production linelists: the (ncells, Lpad) tau table and the line
    # frequencies stay in HBM and are DMA-streamed per walk block
    stream_lines = stream_lines and not expansion_mode
    line_spec = (pl.BlockSpec(memory_space=pl.ANY) if stream_lines
                 else table_spec)
    # nebular-scale bf continua: the bf tables stay in HBM, windowed chunks
    # DMA-streamed per crossing (lifts the former 512-continuum VMEM cap)
    bf_spec = (pl.BlockSpec(memory_space=pl.ANY) if stream_bf
               else table_spec)
    # tile-sorted dispatch: each block sees only its tile's (16, tile)
    # prop_tab slice, selected by the per-block tile id (scalar prefetch)
    prop_spec = (
        pl.BlockSpec((16, tile), lambda i, s, bt, bn: (0, bt[i]),
                     memory_space=pltpu.VMEM)
        if tiled else table_spec)
    in_specs = (
        [lane_spec] * (len(lane_names) + len(int_names) + 2)
        + [table_spec] * 3 + [prop_spec] + [table_spec] * 6
        + [line_spec, line_spec, line_spec] + [bf_spec]
    )
    table_list = [
        tables["mgi_of_cell"], tables["cellmin0"], tables["cellmax0"],
        tables["prop_tab"],
        tables["nne"], tables["Te"], tables["kappagrey"], tables["rho"],
        tables["thick"], tables["chiffpart"], tables["line_nu"],
        tables["tau_factor"], tables["jb_map"], tables["cont_nu_edge"],
    ]
    # bf_a, bf_dep, cont_phixs, cont_gmap, gc_nu_edge appended below
    in_specs += [bf_spec, bf_spec, bf_spec, bf_spec, table_spec, bf_spec,
                 table_spec, table_spec] + [
        pl.BlockSpec(memory_space=pltpu.SMEM)
    ]
    nu_lastline = tables["line_nu"][
        0, min(max(nlines - 1, 0), tables["line_nu"].shape[-1] - 1)
    ].astype(F32)
    table_list += [
        tables["bf_a"], tables["bf_dep"], tables["cont_phixs"],
        tables["cont_gmap"], tables["gc_nu_edge"], tables["cont_prob"],
        tables["expo_kappa"], bf_ctab,
        jnp.stack([t2.astype(F32), jnp.asarray(tmin, F32),
                   jnp.asarray(max_path_step, F32),
                   jnp.asarray(rmax, F32), nu_lastline]).reshape(1, 5),
    ]

    f32_out = jax.ShapeDtypeStruct((1, n), F32)
    i32_out = jax.ShapeDtypeStruct((1, n), I32)
    # estimator accumulators: per-block rows untiled; per-TILE rows tiled
    # (blocks sorted by tile revisit one (1, mpad, k) slice per tile run,
    # zeroed on first visit — memory stays ~ the global estimator size
    # instead of scaling with nblocks)
    acc_dim = ntiles if tiled else nblocks
    acc_cols = [
        8, ngc_pad, ngc_pad, 3 * _round_up(max(nradbins, 1), 128),
        (_round_up(ncont, bf_chunk if stream_bf else 128)
         if want_bfrate else 128),
        (2 * _round_up(max(njblue, 1), 128) if want_jblue else 128),
    ]
    out_shape = (
        [f32_out] * 11  # state floats
        + [i32_out] * 2  # where, next_trans
        + [i32_out] * 6  # evented, escaped, thick, is_bb, act_line, bf_idx
        + [f32_out] * 4  # chi_escat, chi_ff, chi_bf, chi_cont
        + [i32_out]  # mgi
        + [f32_out] * 4 + [i32_out] * 2  # em_xyz/t, nsc, inkscat
        + [jax.ShapeDtypeStruct((acc_dim, k_ncells, c), F32)
           for c in acc_cols]
        + [jax.ShapeDtypeStruct((nblocks, 8, 128), F32)]
    )
    if tiled:
        def _acc_map(i, s, bt, bn):
            return (bt[i], 0, 0)
    else:
        def _acc_map(i, *_):
            return (i, 0, 0)
    out_specs = (
        [lane_spec] * 30
        + [pl.BlockSpec((1, k_ncells, c), _acc_map,
                        memory_space=pltpu.VMEM) for c in acc_cols]
        + [pl.BlockSpec((1, 8, 128), lambda i, *_: (i, 0, 0),
                        memory_space=pltpu.VMEM)]
    )

    kern = partial(
        _kernel,
        nlines=nlines, ncont=ncont, nprop=k_nprop, ncells=k_ncells, ngc=ngc,
        nphixs=nphixs, line_chunk=line_chunk, max_inner=max_inner,
        relativistic=relativistic, phixs_dnu=phixs_dnu,
        last_nuovernuedge=last_nuovernuedge, want_gamma=want_gamma,
        want_bfheat=want_bfheat, test_mode=test_mode, block=block,
        expansion_mode=expansion_mode, nbins_expo=nbins_expo,
        cart3d=cart3d, cyl2d=cyl2d, nx=nx, ny=ny, nz=nz,
        stream_lines=stream_lines, stream_bf=stream_bf, bf_chunk=bf_chunk,
        inkernel_scatter=inkernel_scatter,
        multibin=multibin, nradbins=nradbins, want_bfrate=want_bfrate,
        want_jblue=want_jblue,
        model_dim=model_dim, n_rcyl_m=n_rcyl_m, n_z_m=n_z_m,
        tiled=tiled, tile=tile,
        ablate=ablate,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=(
            (
                [
                    pltpu.VMEM((k_ncells, line_chunk), F32),
                    pltpu.VMEM((1, line_chunk), F32),
                    pltpu.VMEM((1, line_chunk), F32),
                    pltpu.SMEM((3,), I32),  # per-slab last-l0 cache keys
                    pltpu.SemaphoreType.DMA((3,)),
                ]
                if stream_lines else []
            )
            + (
                [
                    pltpu.VMEM((k_ncells, bf_chunk), F32),  # bf_a slab
                    pltpu.VMEM((k_ncells, bf_chunk), F32),  # bf_dep slab
                    pltpu.VMEM((bf_chunk, _round_up(nphixs, 128)),
                               F32),  # phixs slab (cols 128-aligned for DMA)
                    pltpu.VMEM((bf_chunk, _round_up(max(ngc, 1), 128)),
                               F32),  # gmap slab
                    pltpu.VMEM((1, bf_chunk), F32),  # edge slab
                    pltpu.VMEM((1, bf_chunk), F32),  # prob slab
                    pltpu.SemaphoreType.DMA((6,)),
                ]
                if stream_bf else []
            )
        ),
    )
    inputs = (
        [lane_f32[k].reshape(1, -1) for k in lane_names]
        + [lane_i32[k].reshape(1, -1) for k in int_names]
        + [test_tau.reshape(1, -1), test_sel.reshape(1, -1)]
        + table_list
    )
    outs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret_mode(),
    )(jnp.asarray([seed], I32), block_tile.astype(I32),
      block_ne0.astype(I32), *inputs)
    outs = list(outs)
    for i in range(30):  # (1, n) lane outputs back to the caller's (n,)
        outs[i] = outs[i].reshape(-1)
    return tuple(outs)
