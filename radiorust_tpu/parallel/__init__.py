"""Multi-device scaling: channel sharding and time sharding with halo
exchange over a ``jax.sharding.Mesh`` (:mod:`.time_shard`), and
stage-per-device pipeline parallelism (:mod:`.pipeline`) for chains whose
sequential per-sample state cannot halo-exchange."""
