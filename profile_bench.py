"""Quick profiling harness: where does transport time go (compile vs run)?"""
import json
import os
import sys
import time
import tempfile

os.environ.setdefault("ARTIS_X64", "0")
os.environ.setdefault(
    "ARTIS_RATECOEFF_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".rc_cache"))
os.environ.setdefault("ARTIS_DEBUG_CHUNKS", "1")

import jax


def main() -> None:
    from artis_tpu.driver import Simulation
    from artis_tpu.options import GridType, kilonova_lte
    from artis_tpu.synthdata import make_run

    npkts = int(sys.argv[1]) if len(sys.argv) > 1 else 8192

    d = tempfile.mkdtemp(prefix="bench")
    make_run(d, ncells=16, ntimesteps=5, tmin_days=5.0, tmax_days=9.0, ngreyts=1,
             logrho0=-7.0, logrho_slope=-0.15)
    opts = kilonova_lte(
        npkts=npkts, grid_type=GridType.SPHERICAL1D, mintemp=1000.0,
        maxtemp=20000.0, tablesize=20, transport_dtype="float32",
        dispatch_chunk_iters=256, compact_micro_iters=32,
        wavefront_compact_divisor=4,
        use_pallas_rpkt=True, rpkt_crossings_per_dispatch=64,
    )
    t0 = time.time()
    sim = Simulation(d, opts, datadir="/root/reference/data")
    print(f"setup: {time.time()-t0:.1f}s", flush=True)

    with jax.log_compiles():
        for ts in range(3):
            t0 = time.time()
            sim.do_timestep(ts)
            print(f"timestep {ts} total: {time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
