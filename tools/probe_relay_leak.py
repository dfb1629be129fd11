#!/usr/bin/env python
"""Minimal relay-client retention probe (run in a FRESH process).

Evidence behind SOAK_r05's host-RSS attribution: a bare
``jit(lambda a: sum(a*a))`` loop over fresh host inputs — zero framework
code — leaks client memory proportional to the uploaded bytes through
the experimental axon relay backend:

    puts=300  rss 205.0 -> 257.7 MB   leak/chunk = 176 kB  (upload 197 kB)

i.e. the relay client retains ~0.9x of every host->device transfer for
the process lifetime.  On the CPU backend the same loop is flat.  The
serving soak (tools/soak.py) therefore budgets host growth as
``RSS_BUDGET_MB + uploaded_bytes * RELAY_RETENTION_FACTOR`` on TPU —
linear-in-uploads growth is the backend's known mode; anything beyond
it (or any growth on CPU) still fails.
"""

import os
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
# Shared measurement helper: the probe's numbers calibrate soak.py's
# retention allowance, so both MUST read RSS identically.
from soak import rss_mb  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    n = int(os.environ.get("PROBE_PUTS", "300"))
    f = jax.jit(lambda a: jnp.sum(a * a))
    x = np.random.default_rng(0).standard_normal((2, 24576)).astype(
        np.float32)
    float(f(x))  # compile + relay warmup fetch
    r0 = rss_mb()
    for i in range(n):
        float(f(x + np.float32(i)))  # fresh host array per put
    r1 = rss_mb()
    per = (r1 - r0) * 1e3 / n
    print(f"puts={n} rss {r0:.1f} -> {r1:.1f} MB  "
          f"leak/put={per:.0f} kB (upload {x.nbytes / 1e3:.0f} kB)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
