"""Multi-process (fake multi-host) execution: a REAL 2-process
``jax.distributed`` cluster (spawned subprocesses, 4 virtual CPU devices
each) runs the sharded executors over the 8-device GLOBAL mesh and
value-checks outputs per addressable shard against sequential scans —
cross-process ppermute halos, cross-process branch all_gather, and a
mid-stream phase-continuous retune (tools/fake_cluster.py cases 1-3).

This is the (simulated) multi-host path BASELINE.md:29's >=85%-at-N>=2-
hosts target runs on; the reference contract being scaled is lock-step
chunk delivery (/root/reference/src/sync/broadcast_bp.rs:230-331).
"""

import os
import pathlib


def test_fake_cluster_two_process_global_mesh():
    from radiorust_tpu.parallel.multiprocess import launch_local_cluster
    repo = pathlib.Path(__file__).resolve().parents[1]
    codes, outputs = launch_local_cluster(
        str(repo / "tools" / "fake_cluster.py"),
        num_processes=2, local_devices=4, timeout=800.0)
    joined = "\n".join(outputs)
    assert codes == [0, 0], joined
    assert "FAILED" not in joined, joined
    for case in ("case 1", "case 2", "case 3", "case 4"):
        assert f"{case} " in joined and " ok" in joined, joined
