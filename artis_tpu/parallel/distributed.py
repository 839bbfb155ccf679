"""Multi-host (DCN) bring-up for the production driver.

TPU-native counterpart of the reference's MPI world setup
(reference: globals.h:319-358 setup_mpi_vars — node/internode communicator
split; sn3d.cc:686-733 MPI_Init + rank bookkeeping). On TPU the roles map as:

- MPI ranks            -> JAX processes (one per host), joined through
                          ``jax.distributed.initialize`` over DCN
- intra-node shared
  windows              -> unnecessary: read-only tables are replicated per
                          device; ICI carries the intra-slice collectives
- MPI_Allreduce/Bcast  -> psum/resharding over a global Mesh spanning
                          ``jax.devices()`` (which is global after init)

The mesh layout is deliberately ONE axis for packets (and a same-device
one-axis mesh for the cell-domain plasma decomposition) rather than a 2-D
(packets x cells) mesh: the transport and plasma phases are sequential —
never concurrent — so a second mesh axis would only fragment each phase's
collectives; both phases want every chip. With multiple hosts the single
axis simply grows to nprocs * local_devices, and XLA routes the estimator
psum hierarchically (ICI within a slice, DCN across), exactly as the
reference's Allreduce rides shared memory within a node and the network
across (SURVEY.md section 5.8).

Configuration is by environment (set by the launcher, mirroring how SLURM
feeds the reference's scripts/artis-*.sh):

- ``ARTIS_COORDINATOR``   host:port of process 0 (absent -> single process,
                          no-op)
- ``ARTIS_NUM_PROCESSES`` world size (int)
- ``ARTIS_PROCESS_ID``    this process's rank (int)

On cloud TPU pods where the runtime provides its own discovery, set
``ARTIS_COORDINATOR=auto`` to call ``jax.distributed.initialize()`` with no
arguments and let JAX autodetect.
"""

from __future__ import annotations

import os


def maybe_init_distributed(log=print) -> bool:
    """Join the multi-host world if the launcher configured one.

    Must run before any backend query (``jax.devices`` etc.). Returns True
    when a multi-host world was initialized.
    """
    coord = os.environ.get("ARTIS_COORDINATOR")
    if not coord:
        return False
    import jax

    if coord == "auto":
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["ARTIS_NUM_PROCESSES"]),
            process_id=int(os.environ["ARTIS_PROCESS_ID"]),
        )
    log(
        f"distributed: process {jax.process_index()}/{jax.process_count()}, "
        f"{jax.local_device_count()} local of {jax.device_count()} devices"
    )
    return True
