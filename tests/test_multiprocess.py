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


def test_fake_cluster_one_sided_failure_converges_not_hangs():
    """A value-check failure in ONE process must not desynchronize the
    job's collective sequence: both workers keep executing every case's
    collectives, converge on a joint ok=false via process_allgather, and
    exit promptly with nonzero codes (previously a one-sided bail-out
    left the peer parked in the next case's collectives until the
    launcher timeout)."""
    import time

    from radiorust_tpu.parallel.multiprocess import launch_local_cluster
    repo = pathlib.Path(__file__).resolve().parents[1]
    art = (repo / "MULTIPROC_r03.json").read_bytes()
    t0 = time.monotonic()
    codes, outputs = launch_local_cluster(
        str(repo / "tools" / "fake_cluster.py"),
        num_processes=2, local_devices=4, timeout=600.0,
        env_extra={"FAKE_CLUSTER_FAIL": "wfm_ch_across_hosts_x_t_within"})
    took = time.monotonic() - t0
    joined = "\n".join(outputs)
    assert codes == [1, 1], (codes, joined)        # joint verdict, both
    assert "case 2 (ch=2 x t=4) FAILED" in joined
    assert "case 3" in joined and "case 4" in joined  # job kept going
    assert took < 550.0, f"converged by timeout, not verdict ({took}s)"
    # The failure drill never touches the real artifact.
    assert (repo / "MULTIPROC_r03.json").read_bytes() == art
