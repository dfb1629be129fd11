#!/usr/bin/env python
"""End-to-end device validation: the TPU-compiled WFM chain (Pallas filter
path) must match the CPU-compiled chain (reference formulation) on
identical inputs.

jax.random (threefry) is bit-identical across backends, so both sides
generate the same input internally; we compare per-chunk output energy
checksums and a coarse output fingerprint.

Run on a TPU machine: `python tools/validate_tpu.py`.  Exits nonzero on
mismatch beyond the f32 tolerance.
"""

import pathlib
import subprocess
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

PROGRAM = r"""
import numpy as np, jax, jax.numpy as jnp
from radiorust_tpu.blocks.base import StreamSig, pack_wire, unpack_wire
from radiorust_tpu.models.wfm import WFM_INPUT_CHUNK, WFM_INPUT_RATE, wfm_receiver

import os
batch, T = 8, 4
_fused = os.environ.get("VALIDATE_FUSED", "0") == "1"
bound = wfm_receiver(fuse_frontend=_fused, fuse_demod=_fused).bind(
    StreamSig(batch, WFM_INPUT_CHUNK, WFM_INPUT_RATE))

@jax.jit
def run(pp, ps, seed):
    params = unpack_wire(pp); state = unpack_wire(ps)
    key = jax.random.key(seed)
    a = jax.random.normal(key, (T, batch, WFM_INPUT_CHUNK), jnp.float32)
    b = jax.random.normal(jax.random.fold_in(key, 1),
                          (T, batch, WFM_INPUT_CHUNK), jnp.float32)
    xs = jax.lax.complex(a, b)
    def sb(st, x):
        st, y = bound.process(params, st, x, jnp.zeros((batch,), bool))
        return st, (jnp.sum(jnp.abs(y) ** 2), jnp.sum(y.real), jnp.sum(y.imag))
    _, sums = jax.lax.scan(sb, state, xs)
    return jnp.stack([sums[0], sums[1], sums[2]])

out = np.asarray(run(pack_wire(bound.params), pack_wire(bound.init_state()), 0))
print("CHECKSUMS", " ".join(f"{v:.8e}" for v in out.reshape(-1)))
"""


def run_on(platform, fused=False):
    import os
    env = dict(os.environ)
    env["VALIDATE_FUSED"] = "1" if fused else "0"
    code = PROGRAM
    if platform == "cpu":
        # CPU: run fused kernels in pallas interpreter mode.
        code = ("import jax\njax.config.update('jax_platforms','cpu')\n"
                + ("import jax.experimental.pallas as _pl\n"
                   "_orig=_pl.pallas_call\n"
                   "_pl.pallas_call=lambda *a,**k:_orig(*a,**{**k,'interpret':True})\n"
                   if fused else "")
                + code)
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, env=env,
                       cwd=str(pathlib.Path(__file__).parents[1]))
    for line in r.stdout.splitlines():
        if line.startswith("CHECKSUMS"):
            return [float(v) for v in line.split()[1:]]
    raise RuntimeError(f"{platform} run failed:\n{r.stderr[-2000:]}")


def main():
    import os
    import numpy as np
    from bench import wait_for_backend
    fused = os.environ.get("VALIDATE_FUSED", "0") == "1"
    cpu = np.array(run_on("cpu", fused))
    wait_for_backend()     # ride out relay flaps (bounded retries)
    tpu = np.array(run_on("tpu", fused))
    rel = np.abs(cpu - tpu) / np.maximum(np.abs(cpu), 1e-6)
    print("cpu:", cpu)
    print("tpu:", tpu)
    print("max rel diff:", rel.max())
    # Chunk 0 is chaotic warmup garbage through arctan2; steady-state
    # chunks must agree within f32 accumulation tolerance.
    steady = rel.reshape(3, -1)[:, 1:]
    assert steady.max() < 2e-2, f"TPU/CPU mismatch: {steady.max()}"
    print("OK: TPU output matches CPU within f32 tolerance")


if __name__ == "__main__":
    main()
