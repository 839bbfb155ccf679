"""Command-line drivers: artis-sn3d (simulation) and artis-exspec (spectra).

TPU-native rebuild of the reference binaries (reference: sn3d.cc:686-946 main,
exspec.cc:155-248 main). Where the reference bakes physics flags into the
binary via artisoptions.h, the preset is selected at runtime with --preset
plus field overrides (--set key=value).
"""

from __future__ import annotations

import argparse
import ast
import os
import sys

from . import options as options_mod


def _build_opts(args) -> "options_mod.Options":
    preset_fn = {
        "kilonova_lte": options_mod.kilonova_lte,
        "classic": options_mod.classic,
        "nltenebular": options_mod.nltenebular,
        "nltewithoutnonthermal": options_mod.nltewithoutnonthermal,
        "christinenonthermal": options_mod.christinenonthermal,
    }[args.preset]
    overrides = {}
    for item in args.set or []:
        key, _, val = item.partition("=")
        try:
            parsed = ast.literal_eval(val)
        except (SyntaxError, ValueError):
            parsed = val
        if key == "grid_type":
            parsed = options_mod.GridType[str(val)]
        overrides[key] = parsed
    return preset_fn(**overrides)


def main_sn3d(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="artis-sn3d", description="TPU-native ARTIS simulation")
    ap.add_argument("--rundir", default=".", help="directory with input.txt, model.txt, atomic data")
    ap.add_argument("--datadir", default=None, help="decay/gamma-line data directory")
    ap.add_argument("--preset", default="kilonova_lte",
                    choices=["kilonova_lte", "classic", "nltenebular",
                             "nltewithoutnonthermal", "christinenonthermal"])
    ap.add_argument("--set", action="append", metavar="KEY=VALUE",
                    help="override an Options field, e.g. --set npkts=100000")
    ap.add_argument("-w", "--walltimehours", type=float, default=-1.0,
                    help="soft walltime limit; checkpoint and exit in time (sn3d.cc:749-760)")
    ap.add_argument("--mesh", default="auto",
                    help="device mesh: 'auto' = shard over all available "
                         "devices (the reference's MPI ranks, sn3d.cc:197-348),"
                         " 'off' = single device, or an integer device count")
    args = ap.parse_args(argv)

    from .driver import Simulation
    from .parallel.distributed import maybe_init_distributed

    # multi-host (DCN) world, when the launcher configured one — must run
    # before the first backend query (the MPI_Init analogue, sn3d.cc:693)
    maybe_init_distributed()

    opts = _build_opts(args)
    mesh = None if args.mesh == "off" else (
        "auto" if args.mesh == "auto" else int(args.mesh))
    if mesh == "auto":
        import jax
        ndev = len(jax.devices())
        if ndev > 1 and opts.npkts % ndev:
            # round the packet count up so the packet axis tiles the mesh
            opts = opts.replace(npkts=-(-opts.npkts // ndev) * ndev)
    sim = Simulation(args.rundir, opts, datadir=args.datadir, lockfile=True,
                     mesh=mesh)
    sim.run(walltime_hours=args.walltimehours)
    return 0


def main_exspec(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="artis-exspec", description="spectrum/light-curve extraction")
    ap.add_argument("--rundir", default=".")
    ap.add_argument("--preset", default="kilonova_lte",
                    choices=["kilonova_lte", "classic", "nltenebular",
                             "nltewithoutnonthermal", "christinenonthermal"])
    ap.add_argument("--set", action="append", metavar="KEY=VALUE")
    args = ap.parse_args(argv)

    from .exspec import run_exspec

    opts = _build_opts(args)
    run_exspec(args.rundir, opts)
    return 0


if __name__ == "__main__":
    sys.exit(main_sn3d())
