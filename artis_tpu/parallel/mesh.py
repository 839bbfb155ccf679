"""Packet-axis sharding of the transport engine via shard_map.

Design (reference: SURVEY.md section 2 'Parallelism'): the reference's primary
strategy is data parallelism over independent per-rank packet sets with
summed estimators. Here the SAME batched transport kernel runs on every
device over its packet shard; per-cell estimator arrays are psum'd over the
mesh axis at the end (ICI collective instead of MPI_Allreduce), and the solved
cell state stays replicated. Scaling to multi-host/multi-slice follows from
the same mesh spanning DCN.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..estimators import Estimators
from ..transport import engine as engine_mod

PACKET_AXIS = "pkts"


def make_mesh(devices=None, axis_name: str = PACKET_AXIS) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    import numpy as np

    return Mesh(np.array(devices), (axis_name,))


def transport_timestep_sharded(
    mesh: Mesh,
    key,
    st,
    est: Estimators,
    grid,
    dad,
    aux,
    rc,
    rates,
    cells,
    ctx,
    opts,
    gamma_kappagrey: float,
    opacity_case: int,
    kpktdiffusion_timescale: float,
    apply_kpkt_diffusion: bool,
    max_iters: int = 4096,
):
    """Run one timestep's transport with the packet batch sharded over the mesh.

    Packet-axis arrays of ``st`` are split across devices; everything else is
    replicated. Estimators come back fully reduced (replicated), matching the
    reference's estimator Allreduce semantics.
    """

    pkt_spec = jax.tree_util.tree_map(lambda _: P(PACKET_AXIS), st)
    repl = lambda tree: jax.tree_util.tree_map(lambda _: P(), tree)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), pkt_spec, repl(est), repl(grid), repl(rc), repl(rates),
                  repl(cells), repl(ctx)),
        out_specs=(pkt_spec, repl(est), P(), P()),
        # the transport while_loops allocate fresh (unvarying) carries inside
        # the loop body (event contexts, step counters) that become varying
        # mid-loop; disable the varying-manual-axes type check rather than
        # threading pvary through every loop in the engine
        check_vma=False,
    )
    def _run(key, st_shard, est0, grid_, rc_, rates_, cells_, ctx_):
        # decorrelate the RNG stream per shard (replaces the reference's
        # rank-offset seed, input.cc:1599-1607)
        shard_key = jax.random.fold_in(key, jax.lax.axis_index(PACKET_AXIS))
        st_out, est_out, iters, nsteps = engine_mod.transport_timestep(
            shard_key, st_shard, est0, grid_, dad, aux, rc_, rates_, cells_,
            ctx_, opts, gamma_kappagrey, opacity_case, kpktdiffusion_timescale,
            apply_kpkt_diffusion, max_iters,
        )
        # one collective replaces MPI_Allreduce(SUM) (sn3d.cc:263-348)
        est_out = jax.tree_util.tree_map(
            lambda x: jax.lax.psum(x, PACKET_AXIS), est_out
        )
        iters = jax.lax.pmax(iters, PACKET_AXIS)
        nsteps = jax.lax.psum(nsteps, PACKET_AXIS)
        return st_out, est_out, iters, nsteps

    return _run(key, st, est, grid, rc, rates, cells, ctx)


def packet_sharding(mesh: Mesh, st):
    """NamedSharding pytree laying the packet SoA over the packet axis."""
    from jax.sharding import NamedSharding

    return jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P(PACKET_AXIS)), st
    )


def make_transport_dispatch(mesh: Mesh):
    """Build a jitted sharded transport dispatcher with the SAME call
    signature as ``jax.jit(engine_mod.transport_timestep)`` so the production
    driver's chunked wavefront loop (driver.do_timestep) runs unchanged on a
    multi-device mesh.

    This is the TPU-native form of the reference's MPI-per-timestep transport
    (sn3d.cc:554-682 do_timestep; sn3d.cc:263-348 mpi_reduce_estimators):
    the packet batch is sharded over the mesh axis, each device advances its
    shard with a decorrelated RNG stream, and the estimator DELTA accumulated
    this call is psum'd — the incoming accumulator is already replicated, so
    summing the full output would multiply it by the device count.
    """

    @partial(
        jax.jit,
        static_argnames=("opts", "gamma_kappagrey", "opacity_case",
                         "kpktdiffusion_timescale", "apply_kpkt_diffusion",
                         "max_iters"),
    )
    def dispatch(key, st, est, grid, dad, aux, rc, rates, cells, ctx, opts,
                 gamma_kappagrey, opacity_case, kpktdiffusion_timescale,
                 apply_kpkt_diffusion, max_iters=4096):
        pkt_spec = jax.tree_util.tree_map(lambda _: P(PACKET_AXIS), st)
        repl = lambda tree: jax.tree_util.tree_map(lambda _: P(), tree)

        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), pkt_spec, repl(est), repl(grid), repl(dad),
                      repl(aux), repl(rc), repl(rates), repl(cells),
                      repl(ctx)),
            out_specs=(pkt_spec, repl(est), P(), P()),
            check_vma=False,
        )
        def _run(key_, st_shard, est0, grid_, dad_, aux_, rc_, rates_,
                 cells_, ctx_):
            shard_key = jax.random.fold_in(
                key_, jax.lax.axis_index(PACKET_AXIS))
            st_out, est_out, iters, nsteps = engine_mod.transport_timestep(
                shard_key, st_shard, est0, grid_, dad_, aux_, rc_, rates_,
                cells_, ctx_, opts, gamma_kappagrey, opacity_case,
                kpktdiffusion_timescale, apply_kpkt_diffusion, max_iters,
            )
            # psum of this call's DELTA only (est0 is replicated)
            est_out = jax.tree_util.tree_map(
                lambda o, i: i + jax.lax.psum(o - i, PACKET_AXIS),
                est_out, est0,
            )
            iters = jax.lax.pmax(iters, PACKET_AXIS)
            nsteps = jax.lax.psum(nsteps, PACKET_AXIS)
            return st_out, est_out, iters, nsteps

        return _run(key, st, est, grid, dad, aux, rc, rates, cells, ctx)

    return dispatch


CELL_AXIS = "cells"


def make_cell_mesh(devices=None) -> Mesh:
    return make_mesh(devices, axis_name=CELL_AXIS)


def plasma_update_sharded(mesh: Mesh, plasma_fn, dad, rc, cells, opts,
                          j_norm, nuj_norm, t_mid, ffheating_norm,
                          dep_heating, **kwargs):
    """Cell-domain decomposition of the fused grid update: each device solves
    its slice of the cell batch, results come back as globally sharded
    arrays that downstream consumers resharding-replicate on demand.

    TPU-native equivalent of the reference's cell-ownership partitioning for
    update_grid (grid.cc:977-1046 get_nstart/get_ndo; update_grid.cc:1116-1124
    each rank solves only its cells; sn3d.cc:197-261 results broadcast to
    all). The per-cell solves are independent, so the shard boundary is free
    of collectives; the "broadcast" is XLA's automatic resharding when the
    transport step consumes the tables replicated.

    ``plasma_fn`` is the partial-applied ``_plasma_update_device`` (with
    nlte_indices/ntd/vpkt_exclude bound); static options are passed through
    ``kwargs`` (mode, radfield_use_bins) plus any per-cell estimator-norm
    keyword arrays.
    """
    ncells = int(cells.Te.shape[0])
    ndev = mesh.devices.size
    assert ncells % ndev == 0, (
        f"cell count {ncells} must divide the mesh size {ndev} "
        "(pad nonempty cells to a multiple of the device count)"
    )

    def spec_for(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == ncells:
            return P(CELL_AXIS)
        return P()

    def _holds_arrays(v):
        leaves = jax.tree_util.tree_leaves(v)
        return bool(leaves) and all(hasattr(x, "ndim") for x in leaves)

    static_kwargs = {k: v for k, v in kwargs.items() if not _holds_arrays(v)}
    array_kwargs = {k: v for k, v in kwargs.items() if _holds_arrays(v)}
    akw_names = sorted(array_kwargs)
    akw_vals = [array_kwargs[k] for k in akw_names]

    cells_spec = jax.tree_util.tree_map(spec_for, cells)
    in_spec = (
        cells_spec,
        jax.tree_util.tree_map(spec_for, j_norm),
        jax.tree_util.tree_map(spec_for, nuj_norm),
        jax.tree_util.tree_map(spec_for, ffheating_norm),
        jax.tree_util.tree_map(spec_for, dep_heating),
        tuple(jax.tree_util.tree_map(spec_for, v) for v in akw_vals),
    )

    # output sharding: an output whose leading dim scales with the input
    # cell count (global eval shape ncells -> local eval shape nlocal) is a
    # per-cell table; anything shape-invariant is replicated
    nlocal = ncells // ndev

    def _eval(batch):
        return jax.eval_shape(
            lambda c, jn, nj, fh, dh, av: plasma_fn(
                dad, rc, c, opts, jn, nj, t_mid, fh, dh,
                **dict(zip(akw_names, av)), **static_kwargs),
            _slice_tree(cells, ncells, batch),
            _slice_tree(j_norm, ncells, batch),
            _slice_tree(nuj_norm, ncells, batch),
            _slice_tree(ffheating_norm, ncells, batch),
            _slice_tree(dep_heating, ncells, batch),
            tuple(_slice_tree(v, ncells, batch) for v in akw_vals),
        )

    eval_global = _eval(ncells)
    eval_local = _eval(nlocal)

    def out_spec_for(g, l):
        if (hasattr(g, "ndim") and g.ndim >= 1
                and g.shape[0] == ncells and l.shape[0] == nlocal):
            return P(CELL_AXIS)
        return P()

    out_specs = jax.tree_util.tree_map(out_spec_for, eval_global, eval_local)

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=in_spec, out_specs=out_specs, check_vma=False,
    )
    def _run(cells_, j_, nuj_, fh_, dh_, akw_):
        return plasma_fn(dad, rc, cells_, opts, j_, nuj_, t_mid, fh_, dh_,
                         **dict(zip(akw_names, akw_)), **static_kwargs)

    return _run(cells, j_norm, nuj_norm, ffheating_norm, dep_heating,
                tuple(akw_vals))


def make_plasma_dispatch(mesh: Mesh, plasma_fn):
    """Build a jitted cell-domain-decomposed plasma dispatcher with the SAME
    call signature as the driver's ``_plasma_jit`` (reference cell ownership:
    grid.cc:977-1046, update_grid.cc:1116-1124; results rebroadcast
    sn3d.cc:197-261 — here XLA reshards the solved tables on demand).

    The nonempty-cell count need not divide the device count: per-cell arrays
    are edge-padded (replicating the last cell, whose solve is benign) up to
    a multiple, solved sharded, and sliced back.
    """
    cell_mesh = Mesh(mesh.devices.reshape(-1), (CELL_AXIS,))
    ndev = cell_mesh.devices.size

    @partial(
        jax.jit,
        static_argnames=("opts", "mode", "radfield_use_bins", "nt_sf_skip"),
    )
    def dispatch(dad, rc, cells, opts, j_norm, nuj_norm, t_mid,
                 ffheating_norm, dep_heating, **kwargs):
        ncells = int(cells.Te.shape[0])
        pad = (-ncells) % ndev
        npadded = ncells + pad

        def padc(x):
            if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == ncells and pad:
                return jnp.concatenate(
                    [x, jnp.broadcast_to(x[-1:], (pad,) + x.shape[1:])], axis=0)
            return x

        def pad_tree(t):
            return jax.tree_util.tree_map(padc, t)

        out = plasma_update_sharded(
            cell_mesh, plasma_fn, dad, rc, pad_tree(cells), opts,
            pad_tree(j_norm), pad_tree(nuj_norm), t_mid,
            pad_tree(ffheating_norm), pad_tree(dep_heating),
            **{k: pad_tree(v) for k, v in kwargs.items()},
        )
        if pad:
            out = jax.tree_util.tree_map(
                lambda x: x[:ncells]
                if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == npadded
                else x,
                out,
            )
        return out

    return dispatch


def _slice_tree(tree, ncells, nlocal):
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct((nlocal,) + x.shape[1:], x.dtype)
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == ncells
        else (jax.ShapeDtypeStruct(x.shape, x.dtype)
              if hasattr(x, "ndim") else x),
        tree,
    )
