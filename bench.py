"""Benchmark: rpkt transport event-steps per second on one chip.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): 5e6 rpkt steps/sec/chip on a v5p-8; no
published reference numbers exist, so vs_baseline is value/target.
"""

import json
import os
import sys
import tempfile
import time

os.environ.setdefault("ARTIS_X64", "0")  # TPU path: all-f32 device arrays

import jax


def main() -> None:
    from artis_tpu.driver import Simulation
    from artis_tpu.options import GridType, kilonova_lte
    from artis_tpu.synthdata import make_run
    from artis_tpu.transport import engine as engine_mod

    npkts = int(sys.argv[1]) if len(sys.argv) > 1 else 65536

    d = tempfile.mkdtemp(prefix="bench")
    make_run(d, ncells=16, ntimesteps=6, tmax_days=2.5, ngreyts=1)
    opts = kilonova_lte(
        npkts=npkts, grid_type=GridType.SPHERICAL1D, mintemp=1000.0,
        maxtemp=20000.0, tablesize=20, transport_dtype="float32",
    )
    sim = Simulation(d, opts, datadir="/root/reference/data")

    p = sim.params
    fn = jax.jit(
        engine_mod.transport_timestep,
        static_argnames=("opts", "gamma_kappagrey", "opacity_case",
                         "kpktdiffusion_timescale", "apply_kpkt_diffusion", "max_iters"),
    )

    def run_ts(nts, state, est):
        sim.est = est
        sim.prev_est = est if nts > 0 else None
        ctx = sim.update_grid(nts)
        key = jax.random.fold_in(sim.base_key, 1000 + nts)
        return fn(
            key, state, est, sim.grid, sim.dad, sim.aux, sim.rc, sim.rates,
            sim.cells, ctx, opts,
            gamma_kappagrey=float(p.gamma_kappagrey),
            opacity_case=int(p.opacity_case),
            kpktdiffusion_timescale=float(p.kpktdiffusion_timescale),
            apply_kpkt_diffusion=bool(nts < p.n_kpktdiffusion_timesteps),
        )

    # timestep 0 is mostly pellets; timestep 1+ exercises the rpkt loop.
    state, est, _, _ = run_ts(0, sim.state, sim.est)
    jax.block_until_ready(state.ptype)

    # warm-up (compile) then timed run of timestep 1
    state1, est1, iters, nsteps = run_ts(1, state, est)
    jax.block_until_ready(state1.ptype)

    t0 = time.perf_counter()
    state2, est2, iters, nsteps = run_ts(2, state1, est1)
    jax.block_until_ready(state2.ptype)
    dt = time.perf_counter() - t0

    steps_per_sec = int(nsteps) / dt
    target = 5e6
    print(json.dumps({
        "metric": "rpkt_transport_steps_per_sec_per_chip",
        "value": steps_per_sec,
        "unit": "steps/s",
        "vs_baseline": steps_per_sec / target,
    }))


if __name__ == "__main__":
    main()
