"""Benchmark: rpkt transport event-steps per second on one chip.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): 5e6 rpkt steps/sec/chip; no published
reference numbers exist, so vs_baseline is value/target.
"""

import json
import os
import sys
import tempfile

os.environ.setdefault("ARTIS_X64", "0")  # TPU path: all-f32 device arrays


def main() -> None:
    from artis_tpu.driver import Simulation
    from artis_tpu.options import GridType, kilonova_lte
    from artis_tpu.synthdata import make_run

    npkts = int(sys.argv[1]) if len(sys.argv) > 1 else 65536

    d = tempfile.mkdtemp(prefix="bench")
    # photospheric-phase scene at moderate optical depth (tau ~ few): every
    # packet does real line+continuum transport work and the wavefront stays
    # at high lane occupancy, so the number measures transport throughput
    # rather than the straggler-diffusion tail
    make_run(d, ncells=16, ntimesteps=5, tmin_days=5.0, tmax_days=9.0, ngreyts=1,
             logrho0=-8.0, logrho_slope=-0.15)
    opts = kilonova_lte(
        npkts=npkts, grid_type=GridType.SPHERICAL1D, mintemp=1000.0,
        maxtemp=20000.0, tablesize=20, transport_dtype="float32",
        dispatch_chunk_iters=256,
        use_pallas_rpkt=True, rpkt_crossings_per_dispatch=64,
        tail_crossings_per_dispatch=1024, tail_chunk_iters=8,
    )
    sim = Simulation(d, opts, datadir="/root/reference/data")

    # timestep 0 is mostly pellet decays + compile warm-up; timesteps 1-2
    # exercise the full rpkt/kpkt/macro-atom loop
    sim.do_timestep(0)
    sim.total_rpkt_steps = 0
    sim.total_transport_seconds = 0.0
    sim.do_timestep(1)
    sim.do_timestep(2)

    steps_per_sec = sim.total_rpkt_steps / max(sim.total_transport_seconds, 1e-9)
    target = 5e6
    print(json.dumps({
        "metric": "rpkt_transport_steps_per_sec_per_chip",
        "value": steps_per_sec,
        "unit": "steps/s",
        "vs_baseline": steps_per_sec / target,
    }))


if __name__ == "__main__":
    main()
