"""Multi-device packet-axis sharding correctness.

Runs one transport timestep (a) single-device and (b) shard_map'd over the
8-device virtual CPU mesh, and checks the psum'd estimators agree with the
equivalent single-device accumulation. The RNG streams differ by construction
(per-shard fold_in replaces the reference's rank-offset seed,
input.cc:1599-1607), so physical agreement is statistical; structural
invariants (finiteness, conservation, packet-count bookkeeping) are exact.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from make_run import make_run


N_DEV = 8


@pytest.fixture(scope="module")
def sim_pair(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mc"))
    make_run(d, ncells=6, ntimesteps=4, tmax_days=2.0, ngreyts=2)
    from artis_tpu.driver import Simulation
    from artis_tpu.options import GridType, kilonova_lte

    opts = kilonova_lte(
        npkts=64 * N_DEV, grid_type=GridType.SPHERICAL1D, mintemp=1000.0,
        maxtemp=20000.0, tablesize=20, linewalk_chunk=64,
    )
    sim = Simulation(d, opts, datadir="/root/reference/data")
    ctx = sim.update_grid(0)
    return sim, opts, ctx


def _run_sharded(sim, opts, ctx, n_devices):
    from artis_tpu.parallel import make_mesh, transport_timestep_sharded

    devices = jax.devices()[:n_devices]
    assert len(devices) == n_devices
    mesh = make_mesh(devices)
    p = sim.params
    return transport_timestep_sharded(
        mesh, jax.random.PRNGKey(7), sim.state, sim.est, sim.grid, sim.dad,
        sim.aux, sim.rc, sim.rates, sim.cells, ctx, opts,
        gamma_kappagrey=float(p.gamma_kappagrey),
        opacity_case=int(p.opacity_case),
        kpktdiffusion_timescale=float(p.kpktdiffusion_timescale),
        apply_kpkt_diffusion=True,
        max_iters=512,
    )


def test_sharded_transport_runs_and_reduces(sim_pair):
    sim, opts, ctx = sim_pair
    st, est, iters, nsteps = _run_sharded(sim, opts, ctx, N_DEV)
    jax.block_until_ready(st.ptype)

    # the sharded step actually advanced packets
    assert int(nsteps) > 0
    assert int(iters) > 0

    # estimators came back reduced (replicated) and finite
    j = np.asarray(est.j)
    assert np.all(np.isfinite(j))
    assert float(jnp.sum(est.j)) > 0

    # every packet left the wavefront: escaped or parked at t2
    t2 = float(ctx.t2)
    ptype = np.asarray(st.ptype)
    prop_time = np.asarray(st.prop_time)
    from artis_tpu.packets import TYPE_ESCAPE, TYPE_RADIOACTIVE_PELLET

    done = (ptype == TYPE_ESCAPE) | (prop_time >= t2 * (1 - 1e-6))
    # pellets that decay later are parked at t2 as well
    assert done.all() or (ptype[~done] == TYPE_RADIOACTIVE_PELLET).all()


def test_sharded_estimators_match_single_device(sim_pair):
    """psum of per-shard estimator deposits == the same physics run on one
    device with the identical per-shard RNG streams.

    We emulate the 8-shard run on one device by running each shard's packet
    block with its shard key sequentially and summing the estimators — this
    must equal the sharded run bit-for-bit (modulo float reduction order, so
    tolerances are tight but not exact).
    """
    from artis_tpu.parallel.mesh import PACKET_AXIS
    from artis_tpu.transport import engine as engine_mod
    from artis_tpu.estimators import zero_estimators

    sim, opts, ctx = sim_pair
    st, est_sharded, iters, nsteps = _run_sharded(sim, opts, ctx, N_DEV)

    p = sim.params
    npkts = opts.npkts
    shard = npkts // N_DEV
    est_accum = None
    total_nsteps = 0
    key = jax.random.PRNGKey(7)
    for i in range(N_DEV):
        sub = jax.tree_util.tree_map(
            lambda x: x[i * shard:(i + 1) * shard], sim.state
        )
        shard_key = jax.random.fold_in(key, i)
        st_i, est_i, it_i, ns_i = jax.jit(
            engine_mod.transport_timestep,
            static_argnames=("opts", "gamma_kappagrey", "opacity_case",
                             "kpktdiffusion_timescale", "apply_kpkt_diffusion",
                             "max_iters"),
        )(
            shard_key, sub, sim.est, sim.grid, sim.dad, sim.aux, sim.rc,
            sim.rates, sim.cells, ctx, sim.opts,
            gamma_kappagrey=float(p.gamma_kappagrey),
            opacity_case=int(p.opacity_case),
            kpktdiffusion_timescale=float(p.kpktdiffusion_timescale),
            apply_kpkt_diffusion=True,
            max_iters=512,
        )
        total_nsteps += int(ns_i)
        est_accum = est_i if est_accum is None else jax.tree_util.tree_map(
            lambda a, b: a + b, est_accum, est_i
        )

    assert total_nsteps == int(nsteps)
    np.testing.assert_allclose(
        np.asarray(est_sharded.j), np.asarray(est_accum.j), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(est_sharded.nuj), np.asarray(est_accum.nuj), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(est_sharded.cmf_lum), float(est_accum.cmf_lum), rtol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(est_sharded.counters), np.asarray(est_accum.counters)
    )
