"""Phase ablation of the FULL transport dispatch at the real ts0 state.

Round-5 finding: the fused kernel alone sustains ~10 M adv/s
(profile_ablate), yet the bench ts0 dispatch costs ~2 s per wavefront
iteration. The gap must live in the non-rpkt phases (pellet conversions,
gamma flight, kpkt, macro-atom) or in the dispatch glue — this sweep times
transport_timestep at a fixed iteration count with each phase removed.

Run on the chip: `python profile_phases.py [npkts] [iters]`.
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
import numpy as np


def main() -> None:
    from artis_tpu.driver import Simulation
    from artis_tpu.options import GridType, kilonova_lte
    from artis_tpu.synthdata import make_run

    npkts = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    d = tempfile.mkdtemp(prefix="profp")
    make_run(d, ncells=16, ntimesteps=6, tmin_days=5.0, tmax_days=9.0,
             ngreyts=1, logrho0=-9.0, logrho_slope=-0.15)
    base = kilonova_lte(
        npkts=npkts, grid_type=GridType.SPHERICAL1D, mintemp=1000.0,
        maxtemp=20000.0, tablesize=20, transport_dtype="float32",
        dispatch_chunk_iters=iters, use_pallas_rpkt=True,
        rpkt_crossings_per_dispatch=64, exit_below=0,
    )
    sim = Simulation(d, base, datadir="/root/reference/data")
    ctx = sim.update_grid(0)
    est = sim._zero_est()
    kwargs = sim._transport_kwargs(0)
    st0 = sim.state
    key = jax.random.PRNGKey(5)

    variants = [("full", ())]
    for ph in ("conv", "gamma", "kpkt", "ma", "rpkt"):
        variants.append((f"no-{ph}", (ph,)))
    variants.append(("rpkt-only", ("conv", "gamma", "kpkt", "ma")))
    variants.append(("none", ("conv", "gamma", "kpkt", "ma", "rpkt")))

    for label, ablate in variants:
        o = base.replace(phase_ablate=tuple(ablate))
        ts = []
        out = None
        for rep in range(3):  # rep 0 = compile+settle, keep min of the rest
            t0 = time.time()
            out = sim._transport_jit(
                key, st0, est, sim.grid, sim.dad, sim.aux, sim.rc,
                sim.rates, sim.cells, ctx, o, max_iters=iters, **kwargs)
            ns = int(out[3])
            ts.append(time.time() - t0)
        print(f"{label:10s}: min {min(ts[1:]) * 1e3:8.1f} ms "
              f"(first {ts[0] * 1e3:8.1f}) steps {ns}", flush=True)


if __name__ == "__main__":
    main()
