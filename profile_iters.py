"""Marginal wavefront-iteration cost on the real bench scene.

Runs transport from the REAL timestep-0 initial state (pellets pending) with
a max_iters sweep, from the same initial state each time, so

    cost(iters=n) - cost(iters=m)

is the device cost of iterations m..n at their true (declining) occupancy —
no RTT confusion, no synthetic states.  Variants toggle the moving-lane
compaction sort and the in-kernel crossings count, which is where the
round-4 ts0 regression (0.3 s -> 1.35 s judged round-3 vs round-4) must
live.  Prints one line per measurement; no JSON contract (bench.py is the
metric).
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


def timed(fn, *args, reps=3, warm=1, fetch=lambda out: out[-1], **kw):
    for _ in range(warm):
        out = fn(*args, **kw)
        np.asarray(fetch(out))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args, **kw)
        np.asarray(fetch(out))
        ts.append(time.time() - t0)
    return min(ts), out


def main() -> None:
    from artis_tpu.driver import Simulation
    from artis_tpu.options import GridType, kilonova_lte
    from artis_tpu.synthdata import make_run

    npkts = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    d = tempfile.mkdtemp(prefix="profi")
    make_run(d, ncells=16, ntimesteps=6, tmin_days=5.0, tmax_days=9.0,
             ngreyts=1, logrho0=-9.0, logrho_slope=-0.15)
    opts = kilonova_lte(
        npkts=npkts, grid_type=GridType.SPHERICAL1D, mintemp=1000.0,
        maxtemp=20000.0, tablesize=20, transport_dtype="float32",
        dispatch_chunk_iters=24, use_pallas_rpkt=True,
        rpkt_crossings_per_dispatch=64,
        tail_crossings_per_dispatch=1024, tail_chunk_iters=48,
    )
    t0 = time.time()
    sim = Simulation(d, opts, datadir="/root/reference/data")
    print(f"setup {time.time() - t0:.1f}s", flush=True)
    ctx = sim.update_grid(0)
    est = sim._zero_est()
    kwargs = sim._transport_kwargs(0)
    st0 = sim.state

    iter_sweep = tuple(
        int(v) for v in os.environ.get("ARTIS_PROFI_ITERS", "1,2,4,8,16").split(","))
    variants = []
    for spec in os.environ.get(
            "ARTIS_PROFI_VARIANTS", "mi64,mi64nc,mi8").split(","):
        if spec == "mi64":
            variants.append(("mi64  sort", opts))
        elif spec == "mi64nc":
            variants.append(("mi64nosort", opts.replace(pallas_compact_moving=False)))
        elif spec == "mi8":
            variants.append(("mi8   sort", opts.replace(rpkt_crossings_per_dispatch=8)))
        elif spec == "mi8nc":
            variants.append(("mi8 nosort", opts.replace(
                rpkt_crossings_per_dispatch=8, pallas_compact_moving=False)))

    for label, o in variants:
        prev_ms, prev_steps, prev_it = 0.0, 0, 0
        for n_it in iter_sweep:
            tmin, out = timed(
                lambda s: sim._transport_jit(
                    jax.random.PRNGKey(3), s, est, sim.grid, sim.dad, sim.aux,
                    sim.rc, sim.rates, sim.cells, ctx, o,
                    max_iters=n_it, **kwargs),
                st0, fetch=lambda out: out[3])
            steps = int(out[3])
            it_done = int(out[2])
            ms = tmin * 1e3
            d_ms = ms - prev_ms
            d_steps = steps - prev_steps
            marg = (f"  marginal {d_ms / max(it_done - prev_it, 1):7.1f} ms/it "
                    f"{d_steps / max(tmin, 1e-9) / 1e6:6.2f}" if prev_ms else "")
            print(f"{label} iters={n_it:3d} (ran {it_done:3d}): {ms:8.1f} ms "
                  f"{steps:8d} steps  "
                  f"{steps / tmin / 1e6:6.2f} M steps/s{marg}", flush=True)
            prev_ms, prev_steps, prev_it = ms, steps, it_done
            if it_done < n_it:
                break


if __name__ == "__main__":
    main()
