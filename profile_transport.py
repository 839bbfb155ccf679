"""Transport-iteration profiler: one level above profile_ablate.py.

profile_ablate.py times the fused Pallas kernel in isolation; the judge-run
numbers showed the kernel sustaining 12.7M adv/s while end-to-end transport
delivered 1.84M at full occupancy — the gap lives in the orchestration
between engine.transport_timestep's per-iteration structure and the kernel.

This script attributes per-iteration milliseconds to each wavefront phase
(pellet/NT conversions, kpkt, gamma, rpkt kernel, rpkt event pass,
macro-atom) by trace-time phase ablation (opts.phase_ablate), on three
wavefront states:

  full   - synthetic all-rpkt state at 100% lane occupancy
  mixed  - a real mid-timestep-0 state (pellets decayed, mixed types)
  tail   - a drained-tail-width buffer with few active packets

plus the per-chunk host count-fetch cost.  Prints one line per measurement;
no JSON contract (bench.py is the metric).
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


def timed(fn, *args, reps=5, warm=2, fetch=lambda out: out[-1], **kw):
    """Times with a real device->host fetch inside the window: on a relay
    backend block_until_ready can resolve before execution completes, so a
    value fetch is the only trustworthy completion barrier."""
    for _ in range(warm):
        out = fn(*args, **kw)
        np.asarray(fetch(out))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args, **kw)
        np.asarray(fetch(out))
        ts.append(time.time() - t0)
    return min(ts), np.median(ts), out


PHASES = ("conv", "kpkt", "gamma", "rpkt", "ma", "eventpass")


def main() -> None:
    from artis_tpu.driver import Simulation, _gather_active, _pack_counts
    from artis_tpu.options import GridType, kilonova_lte
    from artis_tpu.synthdata import make_run
    from artis_tpu.packets import TYPE_RPKT, TYPE_ESCAPE

    npkts = int(sys.argv[1]) if len(sys.argv) > 1 else 65536

    d = tempfile.mkdtemp(prefix="proft")
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
    grid, dad, cells = sim.grid, sim.dad, sim.cells
    est = sim._zero_est()
    kwargs = sim._transport_kwargs(0)
    t2dev = jnp.asarray(float(ctx.t2), sim.state.prop_time.dtype)

    # --- state A: synthetic all-rpkt full occupancy (profile_ablate's) ---
    rng = np.random.default_rng(0)
    st0 = sim.state
    n = st0.npkts
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
    st_full = st0.replace(
        ptype=jnp.full(n, TYPE_RPKT, jnp.int32),
        pos=jnp.asarray(u * r[:, None], f32), dir=jnp.asarray(dv, f32),
        where=jnp.asarray(cell, jnp.int32),
        prop_time=jnp.full(n, tmid, f32),
        nu_rf=jnp.asarray(nu, f32), nu_cmf=jnp.asarray(nu * 0.98, f32),
        e_rf=jnp.ones(n, f32), e_cmf=jnp.full(n, 0.98, f32),
        next_trans=jnp.zeros(n, jnp.int32),
    )

    # --- state B: real mixed state after 2 chunks of timestep 0 ---
    key = jax.random.PRNGKey(7)
    st_mixed = st0
    for chunk in range(2):
        st_mixed, est2, _, _ = sim._transport_jit(
            jax.random.fold_in(key, chunk), st_mixed, est, grid, dad, sim.aux,
            sim.rc, sim.rates, cells, ctx, opts,
            max_iters=opts.dispatch_chunk_iters, **kwargs)
    types, counts = np.unique(np.asarray(st_mixed.ptype), return_counts=True)
    print(f"mixed state types: {dict(zip(types.tolist(), counts.tolist()))}",
          flush=True)

    # --- state C: drained tail (few active packets in a 1024 buffer) ---
    keep = 48
    esc_types = np.asarray(st_mixed.ptype).copy()
    rpkt_idx = np.flatnonzero(
        (esc_types == TYPE_RPKT)
        & (np.asarray(st_mixed.prop_time) < float(ctx.t2)))[keep:]
    esc_types[rpkt_idx] = TYPE_ESCAPE
    st_drain = st_mixed.replace(ptype=jnp.asarray(esc_types))
    tail_widths, tail_opts_of = sim._tail_plan()
    tw = tail_widths[-1] if tail_widths else 1024
    st_tail, _ = _gather_active(st_drain, t2dev, tw)

    phases_sel = tuple(
        p for p in os.environ.get(
            "ARTIS_PROFT_PHASES", ",".join(PHASES)).split(",") if p)

    def run_state(label, st_s, o, iters):
        base = None
        for ab in (None, *phases_sel):
            o_ab = o if ab is None else o.replace(
                phase_ablate=tuple(t for t in PHASES if t == ab))
            try:
                # estimator shapes are per-cell, independent of buffer width
                tmin_s, tmed_s, out = timed(
                    lambda s: sim._transport_jit(
                        jax.random.PRNGKey(3), s, est, grid, dad, sim.aux,
                        sim.rc, sim.rates, cells, ctx, o_ab,
                        max_iters=iters, **kwargs),
                    st_s, fetch=lambda out: out[3])
            except Exception as exc:  # noqa: BLE001 - report and continue
                print(f"{label} ablate={ab}: FAILED {exc}", flush=True)
                continue
            nsteps = int(out[3])
            ms = tmin_s * 1e3
            if ab is None:
                base = ms
                print(f"{label} iters={iters} FULL: {ms:8.1f} ms "
                      f"({nsteps} steps, "
                      f"{nsteps / tmin_s / 1e6:6.2f} M steps/s)", flush=True)
            else:
                print(f"{label} iters={iters} -{ab:9s}: {ms:8.1f} ms "
                      f"(delta {base - ms:+8.1f} ms)", flush=True)

    # ARTIS_PROFT_STATES / ARTIS_PROFT_PHASES select a subset (each phase
    # ablation is a fresh XLA+Mosaic compile — a full sweep takes a while)
    states = os.environ.get("ARTIS_PROFT_STATES", "full,mixed,tail").split(",")
    if "full" in states:
        run_state("full ", st_full, opts, 1)
    if "mixed" in states:
        run_state("mixed", st_mixed, opts, 1)
    if "tail" in states:
        o_tail = tail_opts_of(tw)
        run_state(f"tail{tw}", st_tail, o_tail, 1)
        run_state(f"tail{tw}", st_tail, o_tail, 8)

    # --- count-fetch cost (the per-chunk host round-trip) ---
    it_c = jnp.zeros((), jnp.int32)
    ns_c = jnp.zeros((), jnp.int32)
    tmin_f, tmed_f, _ = timed(
        lambda: np.asarray(_pack_counts(it_c, ns_c, st_mixed, t2dev)),
        fetch=lambda out: out)
    print(f"count-fetch: {tmin_f * 1e3:7.1f} ms (med {tmed_f * 1e3:7.1f})",
          flush=True)


if __name__ == "__main__":
    main()
