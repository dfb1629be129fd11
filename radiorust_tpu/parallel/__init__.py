"""Multi-device scaling: channel sharding and time sharding with halo
exchange over a ``jax.sharding.Mesh``."""
