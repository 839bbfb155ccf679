"""Ablation profiler: separates the fused Pallas kernel from the XLA
event-application pass inside rpkt_step_pallas.

Measures, at full rpkt occupancy on the bench scene:
  a. propagate_blocked alone (the Pallas kernel, no event application);
  b. rpkt_step_pallas (kernel + gated event pass + estimator reduction);
  c. the XLA event pass in isolation (b - a, plus a direct timing).

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


def timed(fn, *args, reps=5, warm=2, **kw):
    """Times with a real device->host fetch inside the window: on a relay
    backend block_until_ready can resolve before execution completes, so a
    value fetch is the only trustworthy completion barrier."""
    for _ in range(warm):
        out = fn(*args, **kw)
        np.asarray(out[-1])
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args, **kw)
        np.asarray(out[-1])
        ts.append(time.time() - t0)
    return min(ts), np.median(ts), out


def main() -> None:
    from artis_tpu.driver import Simulation
    from artis_tpu.options import GridType, kilonova_lte
    from artis_tpu.synthdata import make_run
    import artis_tpu.transport.engine as engine_mod

    npkts = int(sys.argv[1]) if len(sys.argv) > 1 else 65536

    d = tempfile.mkdtemp(prefix="profa")
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
    ctx = sim.update_grid(0)
    grid, dad, cells, est = sim.grid, sim.dad, sim.cells, sim._zero_est()
    opacity_case = int(sim.params.opacity_case)

    # force an all-rpkt in-flight state at full occupancy
    from artis_tpu.packets import TYPE_RPKT

    rng = np.random.default_rng(0)
    st = sim.state
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

    def run_one(label, o):
        step_f = jax.jit(
            lambda k, s: engine_mod.rpkt_step_pallas(
                k, s, est, ctx, grid, dad, cells, o, opacity_case))
        tmin_f, tmed_f, out_f = timed(step_f, jax.random.PRNGKey(1), st)
        nadv_f = int(out_f[-1])
        print(
            f"{label}: {tmin_f * 1e3:7.1f} ms (med {tmed_f * 1e3:7.1f}) "
            f"{nadv_f} adv, {nadv_f / tmin_f / 1e6:7.2f} M adv/s",
            flush=True,
        )

    mi_list = tuple(
        int(v) for v in os.environ.get("ARTIS_ABLATE_MI", "1,16,64").split(",")
        if v)
    for mi in mi_list:
        run_one(f"mi={mi:3d} full", opts.replace(rpkt_crossings_per_dispatch=mi))

    for blk in (
        int(v) for v in os.environ.get("ARTIS_ABLATE_BLOCKS", "").split(",")
        if v
    ):
        run_one(f"mi=64 block={blk:5d}",
                opts.replace(rpkt_crossings_per_dispatch=64, pallas_block=blk))

    # section ablations at mi=64 (each is a fresh Mosaic compile)
    ab_list = tuple(
        t for t in os.environ.get(
            "ARTIS_ABLATE_LIST",
            "nophixs|nobf,nosel|nosel|nowalk|noest|"
            "nophixs,nobf,nosel,nowalk,noest").split("|")
        if t)
    for ab in ab_list:
        os.environ["ARTIS_PALLAS_ABLATE"] = ab
        try:
            run_one(f"mi=64 ablate={ab:34s}",
                    opts.replace(rpkt_crossings_per_dispatch=64))
        finally:
            os.environ.pop("ARTIS_PALLAS_ABLATE", None)


if __name__ == "__main__":
    main()
