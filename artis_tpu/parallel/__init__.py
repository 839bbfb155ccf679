"""Distributed execution over a jax.sharding.Mesh.

TPU-native replacement for the reference's MPI layer (reference: SURVEY.md
section 5.8): packets are sharded over a mesh axis exactly as the reference
replicates independent packet sets per rank (input.cc:1599-1607), and the
estimator MPI_Allreduce (sn3d.cc:263-348) becomes one psum inside shard_map.
The per-cell plasma solve is batched and cheap, so it runs replicated —
mirroring the reference's broadcast-solved-state-to-all design (sn3d.cc:197).
"""

from .mesh import make_mesh, transport_timestep_sharded
from .distributed import maybe_init_distributed

__all__ = ["make_mesh", "transport_timestep_sharded",
           "maybe_init_distributed"]
