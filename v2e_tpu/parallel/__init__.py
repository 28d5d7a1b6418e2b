"""Multi-chip scale-out via jax.sharding meshes.

The reference is strictly single-process/single-GPU (SURVEY.md §2.2).  Here
scale-out is first-class:

* the emulator's pixel plane shards across chips (`spatial` axis) — the
  model is embarrassingly pixel-parallel except the global max-count
  reduction and the CSDVS 3x3 halo, both of which XLA lowers to cheap ICI
  collectives automatically;
* SloMo batches and training shard across the `data` axis.
"""

from v2e_tpu.parallel.mesh import make_mesh, shard_emulator_args, emulate_chunk_sharded

__all__ = ["make_mesh", "shard_emulator_args", "emulate_chunk_sharded"]
