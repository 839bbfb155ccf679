"""Kernel micro-profiler: isolates where rpkt transport wall time goes.

Run on the real TPU. Measures, in order:
  1. host<->device round-trip latency (tunnel RTT) on a tiny jitted op;
  2. the fused Pallas crossing kernel alone at several max_inner settings
     (separating fixed dispatch overhead from per-crossing cost);
  3. one full rpkt_step_pallas (kernel + XLA event-apply pass);
  4. one full transport chunk (dispatch_chunk_iters while-loop iterations).

Prints one line per measurement; no JSON contract (bench.py is the metric).
"""

import os
import sys
import tempfile
import time

os.environ.setdefault("ARTIS_X64", "0")
os.environ.setdefault(
    "ARTIS_RATECOEFF_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".rc_cache"))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=3, warm=1, **kw):
    # a real device->host value fetch is the completion barrier: on the relay
    # backend block_until_ready can resolve before execution finishes
    for _ in range(warm):
        out = fn(*args, **kw)
        np.asarray(jax.tree_util.tree_leaves(out)[-1])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args, **kw)
        np.asarray(jax.tree_util.tree_leaves(out)[-1])
    return (time.time() - t0) / reps, out


def main() -> None:
    from artis_tpu.driver import Simulation
    from artis_tpu.options import GridType, kilonova_lte
    from artis_tpu.synthdata import make_run
    import artis_tpu.transport.engine as engine_mod

    npkts = int(sys.argv[1]) if len(sys.argv) > 1 else 65536

    # 1. tunnel RTT
    tiny = jax.jit(lambda x: x * 2.0 + 1.0)
    rtt, _ = timed(tiny, jnp.ones((8, 128), jnp.float32), reps=10, warm=3)
    print(f"RTT: tiny jitted op round-trip {rtt * 1e3:.1f} ms", flush=True)

    d = tempfile.mkdtemp(prefix="profk")
    make_run(d, ncells=16, ntimesteps=6, tmin_days=5.0, tmax_days=9.0,
             ngreyts=1, logrho0=-9.0, logrho_slope=-0.15)
    opts = kilonova_lte(
        npkts=npkts, grid_type=GridType.SPHERICAL1D, mintemp=1000.0,
        maxtemp=20000.0, tablesize=20, transport_dtype="float32",
        dispatch_chunk_iters=24, use_pallas_rpkt=True,
        rpkt_crossings_per_dispatch=64,
    )
    t0 = time.time()
    sim = Simulation(d, opts, datadir="/root/reference/data")
    print(f"setup {time.time() - t0:.1f}s", flush=True)

    captured = {}
    orig = sim._transport_jit

    def capture(*a, **kw):
        captured["a"] = a
        captured["kw"] = kw
        return orig(*a, **kw)

    sim._transport_jit = capture
    t0 = time.time()
    sim.do_timestep(0)
    print(f"timestep 0 (incl. compile) {time.time() - t0:.1f}s", flush=True)
    (key, st, est, grid, dad, aux, rc, rates, cells, ctx) = captured["a"][:10]
    kw = captured["kw"]
    sim._transport_jit = orig

    # force an all-rpkt in-flight state at full occupancy
    from artis_tpu.packets import TYPE_RPKT

    rng = np.random.default_rng(0)
    n = st.npkts
    tmid = float(ctx.ts)
    ncell = int(grid.ncoordgrid[0])
    cell = rng.integers(0, ncell, n)
    rmin = np.asarray(grid.cell_pos_min[:ncell, 0]) * tmid / float(grid.tmin)
    rmax = np.asarray(grid.cell_pos_max[:ncell, 0]) * tmid / float(grid.tmin)
    r = rmin[cell] + (rmax[cell] - rmin[cell]) * rng.uniform(0.02, 0.98, n)
    u = rng.normal(size=(n, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    dv = rng.normal(size=(n, 3))
    dv /= np.linalg.norm(dv, axis=1, keepdims=True)
    nu = 10 ** rng.uniform(14.2, 15.4, n)
    f32 = np.float32
    st = st.replace(
        ptype=jnp.full(n, TYPE_RPKT, jnp.int32),
        pos=jnp.asarray(u * r[:, None], f32), dir=jnp.asarray(dv, f32),
        where=jnp.asarray(cell, jnp.int32),
        prop_time=jnp.full(n, tmid, f32),
        nu_rf=jnp.asarray(nu, f32), nu_cmf=jnp.asarray(nu * 0.98, f32),
        e_rf=jnp.ones(n, f32), e_cmf=jnp.full(n, 0.98, f32),
        next_trans=jnp.zeros(n, jnp.int32),
    )

    # 2. kernel-only cost vs max_inner
    opacity_case = kw["opacity_case"]
    for mi in (1, 16, 64, 256):
        o = opts.replace(rpkt_crossings_per_dispatch=mi)
        step = jax.jit(
            lambda k, s: engine_mod.rpkt_step_pallas(
                k, s, est, ctx, grid, dad, cells, o, opacity_case)
        )
        dt, out = timed(step, jax.random.PRNGKey(1), st, reps=3, warm=1)
        nadv = int(out[-1])
        print(
            f"rpkt_step_pallas max_inner={mi}: {dt * 1e3:.1f} ms, "
            f"{nadv} lane-advances, {nadv / dt / 1e6:.2f} M adv/s",
            flush=True,
        )

    # 3. XLA fallback step for comparison
    o = opts.replace(rpkt_crossings_per_dispatch=64, use_pallas_rpkt=False)
    step_x = jax.jit(
        lambda k, s: engine_mod.rpkt_step(
            k, s, est, ctx, grid, dad, cells, o, opacity_case)
    )
    dt, out = timed(step_x, jax.random.PRNGKey(1), st, reps=2, warm=1)
    nadv = int(out[-1])
    print(
        f"rpkt_step XLA max_inner=64: {dt * 1e3:.1f} ms, {nadv} lane-advances, "
        f"{nadv / dt / 1e6:.2f} M adv/s",
        flush=True,
    )

    # 4. one full transport chunk at full occupancy
    t2d = jnp.asarray(float(ctx.t2), jnp.float32)
    kw_chunk = {k: v for k, v in kw.items() if k != "max_iters"}
    dt, _ = timed(
        orig, jax.random.PRNGKey(2), st, est, grid, dad, aux, rc, rates,
        cells, ctx, opts, reps=2, warm=1,
        max_iters=opts.dispatch_chunk_iters, **kw_chunk,
    )
    print(f"full transport chunk ({opts.dispatch_chunk_iters} iters): "
          f"{dt * 1e3:.1f} ms", flush=True)

    # 5. variant sweep: localise per-crossing cost (block width, in-kernel
    # LUT estimator scatters, line-walk chunk) at a fixed max_inner
    def run_variant(label, o):
        step = jax.jit(
            lambda k, s: engine_mod.rpkt_step_pallas(
                k, s, est, ctx, grid, dad, cells, o, opacity_case)
        )
        dt, out = timed(step, jax.random.PRNGKey(1), st, reps=3, warm=1)
        nadv = int(out[-1])
        print(
            f"variant {label}: {dt * 1e3:.1f} ms, {nadv} adv, "
            f"{nadv / dt / 1e6:.2f} M adv/s",
            flush=True,
        )

    base = opts.replace(rpkt_crossings_per_dispatch=64)
    for blk in (256, 512, 1024):
        run_variant(f"block={blk}", base.replace(pallas_block=blk))
    run_variant("lut_estimators=off", base.replace(
        use_lut_photoion=False, use_lut_bfheating=False))
    for chunk in (128, 256):
        run_variant(f"linewalk_chunk={chunk}",
                    base.replace(linewalk_chunk=chunk))


if __name__ == "__main__":
    main()
