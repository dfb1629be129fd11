"""Multi-device scaling: channel sharding and time sharding with halo
exchange over a ``jax.sharding.Mesh`` (:mod:`.time_shard`),
stage-per-device pipeline parallelism (:mod:`.pipeline`) for chains whose
sequential per-sample state cannot halo-exchange, and channel (expert)
parallelism for channelizer chains (:mod:`.channel_shard`).  The
data-parallel serving axis (independent streams) lives in
``blocks.base.jit_step_sharded`` / ``RuntimeBlock(mesh=...)``."""
