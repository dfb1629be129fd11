"""Device-side compute ops (XLA/Pallas kernels) used by the blocks."""
