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
