"""Multi-process (fake multi-host) validation of the sharded executors.

Launches N identical worker processes (default 4), each owning
``local_devices`` virtual CPU devices (default 2), joined into one JAX
job via ``jax.distributed.initialize`` — the honest stand-in for N TPU
hosts in an environment with a single real chip.  The workers build
**global** meshes spanning all processes and run the same value checks
as the driver's single-process dryrun (``__graft_entry__.dryrun_multichip``):
sharded outputs are compared per addressable shard against a sequential
scan computed locally, so a wrong cross-process halo or collective fails
on numbers, not shapes.

Cases (all on the 8-device global mesh over 4 processes):

1. WFM receive chain time-sharded ``t=8`` — the ppermute halo chain
   crosses every process boundary — **plus a mid-stream phase-continuous
   ``set_shift`` retune** (the folded phase state must stay consistent
   across processes).
2. WFM on a ``ch=4 x t=2`` mesh with the channel (stream) axis mapped
   ACROSS processes and time shards within each process — the layout
   SCALING.md prescribes for real pods (halos ride intra-host ICI).
3. The 64-channel polyphase channelizer + per-channel FM demod,
   channel-sharded ``c=8``: the branch all_gather runs across processes.
4. Orbax sharded checkpoint/resume across the cluster: each process
   writes only its addressable shards mid-stream, the state restores
   collectively, and the continuation is bit-exact vs the uninterrupted
   run (``utils/checkpoint.py::save_sharded/load_sharded``).
5. Cross-process PIPELINE parallelism: stage *i* of the WFM chain runs
   in process *i*, chunks hop host-to-host through the compiled
   ppermute handoff (``parallel/pipeline.py::CrossProcessPipeline``);
   the last process value-checks the drained outputs vs the sequential
   scan.
6. 2-D streams x channels: the channelizer fleet on an ``s=4 x c=2``
   mesh with the *stream* (serving batch) axis across processes and the
   channel split within each host — each device owns one
   (stream group, channel group) tile
   (``ChannelShardedChain(stream_axis=...)``).

Failure drills (launcher-driven, never touch the artifact's case list
directly):

- ``FAKE_CLUSTER_FAIL=<case>``: raise in ONE process after that case's
  collectives — the job must converge on a joint ok=false verdict
  instead of deadlocking (tests/test_multiprocess.py).
- ``FAKE_CLUSTER_KILL=<case>``: process 1 SIGKILLs itself MID-STREAM
  inside that case — the survivors must ERROR OUT of the dead peer's
  collectives within a bounded time, not park forever (the launcher
  asserts exit codes: victim -9, survivors nonzero, nobody hung).  In
  kill mode workers run STRICT (a collective error aborts the worker) —
  with a dead peer there is no joint verdict to converge on.

Run:  python tools/fake_cluster.py            (launcher mode)
      runs the 6 cases, then the SIGKILL drill, and writes
      MULTIPROC_r04.json on success.

Reference contract being scaled: lock-step chunk delivery — every
consumer sees every chunk exactly once, in order
(``/root/reference/src/sync/broadcast_bp.rs:230-331``); here the
per-shard equality against the sequential scan is that guarantee's
compiled-SPMD form.  The kill drill is the multi-host analog of the
reference's teardown cascade: a dropped sender poisons the channel and
every receiver *returns an error* rather than blocking forever
(``/root/reference/src/sync/broadcast_bp.rs:170-205``).
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ARTIFACT = os.path.join(REPO, "MULTIPROC_r05.json")


def _fm_iq(total: int, batch: int, rate: float):
    """Smooth FM-modulated tone (the dryrun's representative signal —
    the demodulator is chaotic on raw noise)."""
    tt = np.arange(total) / rate
    audio = 0.3 * np.sin(2 * np.pi * 1000.0 * tt)
    iq = np.exp(1j * (2 * np.pi * 150000.0 / rate * np.cumsum(audio)))
    phases = np.exp(1j * np.linspace(0.0, 1.0, batch))
    return (iq[None, :] * phases[:, None]).astype(np.complex64)


def _maybe_die(case: str, process_id: int) -> None:
    """SIGKILL drill hook: in kill mode, process 1 dies HERE — mid-case,
    after at least one collective step has completed, so the survivors
    are abandoned inside the case's remaining collectives.  ``case`` is
    the CURRENT case's name (each hooked case passes its own), compared
    against the env selection — passing the env value itself would make
    the guard tautological and kill in the first hooked case."""
    if case and os.environ.get("FAKE_CLUSTER_KILL") == case and process_id == 1:
        print(f"[p{process_id}] SIGKILL drill: dying mid-{case}",
              flush=True)
        sys.stdout.flush()
        os.kill(os.getpid(), signal.SIGKILL)


def _case_time_sharded_wfm(mesh, t, ch_axis, retune, process_id,
                           case_name=None):
    """Cases 1 and 2: time(+channel)-sharded WFM vs sequential scan,
    optionally with a mid-stream retune."""
    import jax
    import jax.numpy as jnp
    from radiorust_tpu.blocks.base import StreamSig, scan
    from radiorust_tpu.models.wfm import wfm_receiver
    from radiorust_tpu.parallel.multiprocess import \
        assert_addressable_allclose
    from radiorust_tpu.parallel.time_shard import TimeShardedChain

    batch = 2 * mesh.shape[ch_axis] if ch_axis else 2
    n, rate, steps = 2048, 1024000.0, 3
    shift0, shift1 = 100000.0, -57000.0
    sig = StreamSig(batch, n, rate)
    bound = wfm_receiver(tune_shift=shift0).bind(sig)
    ts = TimeShardedChain(bound, mesh, t_axis="t", ch_axis=ch_axis)
    xs_flat = _fm_iq(steps * t * n, batch, rate)
    xs = np.moveaxis(xs_flat.reshape(batch, steps * t, n), 1, 0)

    # Sequential oracle computed locally in every process (the full
    # input is host-resident everywhere).
    ref = wfm_receiver(tune_shift=shift0).bind(sig)
    if retune:
        from radiorust_tpu.blocks.transform import _BoundFreqShifter
        st, ys_a = scan(ref, ref.params, ref.init_state(),
                        jnp.asarray(xs[:2 * t]))
        params, state = list(ref.params), list(st)
        for i, blk in enumerate(ref.blocks):
            if isinstance(blk, _BoundFreqShifter):
                params[i], state[i] = blk.retune(params[i], state[i],
                                                 shift1)
        _, ys_b = scan(ref, tuple(params), tuple(state),
                       jnp.asarray(xs[2 * t:]))
        want = np.concatenate([np.asarray(ys_a), np.asarray(ys_b)])
    else:
        _, want = scan(ref, ref.params, ref.init_state(), jnp.asarray(xs))
        want = np.asarray(want)

    out_n = bound.out_sig.chunk_len
    state = ts.init_state()
    for s in range(steps):
        if s == 1:
            _maybe_die(case_name, process_id)
        if retune and s == 2:
            state = ts.set_shift(state, shift1)
        group = xs[s * t:(s + 1) * t]
        x_big = np.moveaxis(group, 0, 1).reshape(batch, t * n)
        state, y = ts.process(ts.params, state, x_big)
        # want for this step, laid out like y: [batch, t*out_n].
        w = np.moveaxis(want[s * t:(s + 1) * t], 0, 1).reshape(
            batch, t * out_n)
        # First group's zero-primed filter tails hit the chaotic arctan2:
        # skip its first two chunks (same guard as the dryrun).
        assert_addressable_allclose(y, w, atol=5e-4,
                                    skip=2 * out_n if s == 0 else 0,
                                    label=f"wfm t={t} ch={ch_axis} "
                                          f"step {s}")


def _case_distributed_checkpoint(mesh, t, tmpdir):
    """Case 4: orbax sharded checkpoint/resume ACROSS the cluster —
    every process writes its addressable shards mid-stream, the state is
    restored collectively, and the continuation is bit-exact against the
    uninterrupted run (the multi-host operational story of
    docs/SCALING.md "Checkpoint / resume of sharded deployments")."""
    from radiorust_tpu.blocks.base import StreamSig
    from radiorust_tpu.models.wfm import wfm_receiver
    from radiorust_tpu.parallel.time_shard import TimeShardedChain
    from radiorust_tpu.utils.checkpoint import load_sharded, save_sharded

    batch, n, rate = 2, 2048, 1024000.0
    sig = StreamSig(batch, n, rate)
    ts = TimeShardedChain(wfm_receiver().bind(sig), mesh, t_axis="t")
    xs = _fm_iq(4 * t * n, batch, rate)
    groups = [xs[:, i * t * n:(i + 1) * t * n] for i in range(4)]

    st_ref = ts.init_state()
    for g in groups[:2]:
        st_ref, _ = ts.process(ts.params, st_ref, g)
    path = os.path.join(tmpdir, "ckpt")
    save_sharded(path, st_ref)
    st_res = load_sharded(path, ts.init_state(), mesh=mesh)
    for g in groups[2:]:
        st_ref, y_ref = ts.process(ts.params, st_ref, g)
        st_res, y_res = ts.process(ts.params, st_res, g)
        # Bit-exact continuation: the resumed run's addressable shards
        # equal the uninterrupted run's, index for index.
        ref_map = {s.index: np.asarray(s.data)
                   for s in y_ref.addressable_shards}
        for s in y_res.addressable_shards:
            np.testing.assert_array_equal(np.asarray(s.data),
                                          ref_map[s.index])


def _case_channel_sharded(mesh):
    """Case 3: channel-sharded channelizer chain, branch all_gather
    across processes."""
    import jax
    import jax.numpy as jnp
    from radiorust_tpu.blocks.base import StreamSig, scan
    from radiorust_tpu.models.channelizer import channelized_receiver
    from radiorust_tpu.parallel.channel_shard import ChannelShardedChain
    from radiorust_tpu.parallel.multiprocess import \
        assert_addressable_allclose

    chain = channelized_receiver(num_channels=64, input_rate=1024000.0)
    sig = StreamSig(1, 1024, 1024000.0)
    bound = chain.bind(sig)
    cs = ChannelShardedChain(bound, mesh, axis="c")
    rng = np.random.default_rng(6)
    xs = (rng.standard_normal((3, 1, 1024))
          + 1j * rng.standard_normal((3, 1, 1024))).astype(np.complex64)
    _, want = scan(bound, bound.params, bound.init_state(),
                   jnp.asarray(xs))
    want = np.asarray(want)
    rows = np.abs(want).mean(axis=(0, 2)) > 1e-3  # channel-energy guard
    state = cs.init_state()
    for s in range(3):
        state, y = cs.process(cs.params, state, xs[s])
        assert_addressable_allclose(y, want[s], atol=5e-4, rows=rows,
                                    label=f"channelizer step {s}")


def _case_cross_process_pipeline(process_id, num_processes):
    """Case 5: pipeline parallelism across processes — one WFM stage per
    host, chunks hop through the compiled ppermute handoff.  Only the
    LAST process holds outputs; it checks them against the sequential
    scan (warm-up chaos guard: skip the first two chunks, same rule as
    case 1)."""
    import jax.numpy as jnp
    from radiorust_tpu.blocks.base import StreamSig, scan
    from radiorust_tpu.models.wfm import wfm_receiver
    from radiorust_tpu.parallel.pipeline import CrossProcessPipeline

    batch, n, rate, steps = 2, 2048, 1024000.0, 6
    sig = StreamSig(batch, n, rate)
    bound = wfm_receiver().bind(sig)
    pipe = CrossProcessPipeline(bound)
    xs = _fm_iq(steps * n, batch, rate)
    xs = np.moveaxis(xs.reshape(batch, steps, n), 1, 0)   # [T, batch, n]
    got = pipe.run(xs)
    ref = wfm_receiver().bind(sig)
    _, want = scan(ref, ref.params, ref.init_state(), jnp.asarray(xs))
    if process_id == num_processes - 1:
        np.testing.assert_allclose(got[2:], np.asarray(want)[2:],
                                    atol=5e-4,
                                    err_msg="cross-process pipeline")


def _case_streams_x_channels(mesh, process_id, case_name=None):
    """Case 6: 2-D serving mesh — the stream (batch) axis across
    processes, the channel split within each host.  Each device owns one
    (stream group, channel group) tile; the branch all_gather stays
    inside a stream group's channel row."""
    import jax.numpy as jnp
    from radiorust_tpu.blocks.base import StreamSig, scan
    from radiorust_tpu.models.channelizer import channelized_receiver
    from radiorust_tpu.parallel.channel_shard import ChannelShardedChain
    from radiorust_tpu.parallel.multiprocess import \
        assert_addressable_allclose

    batch = mesh.shape["s"]
    chain = channelized_receiver(num_channels=64, input_rate=1024000.0)
    sig = StreamSig(batch, 1024, 1024000.0)
    bound = chain.bind(sig)
    cs = ChannelShardedChain(bound, mesh, axis="c", stream_axis="s")
    rng = np.random.default_rng(7)
    xs = (rng.standard_normal((3, batch, 1024))
          + 1j * rng.standard_normal((3, batch, 1024))
          ).astype(np.complex64)
    _, want = scan(bound, bound.params, bound.init_state(),
                   jnp.asarray(xs))
    want = np.asarray(want)
    rows = np.abs(want).mean(axis=(0, 2)) > 1e-3  # channel-energy guard
    state = cs.init_state()
    for s in range(3):
        if s == 1:
            _maybe_die(case_name, process_id)
        state, y = cs.process(cs.params, state, xs[s])
        assert_addressable_allclose(y, want[s], atol=5e-4, rows=rows,
                                    label=f"streams-x-channels step {s}")


def _case_pipeline_x_channel_groups(process_id, num_processes):
    """Case 7 (8x1 suite): compose the PIPELINE and CHANNEL axes in one
    case — the processes form a (2 groups x 4 stages) grid of pipeline
    replicas, each serving its own batch slice
    (``CrossProcessPipeline(groups=2)``).  Each group's last stage
    value-checks its slice against the sequential scan.  Exercises
    process-count-dependent assumptions (grouped ppermute pairs, per-
    group warmup bubbles) that the 4x2 single-axis topology hides."""
    import jax.numpy as jnp
    from radiorust_tpu.blocks.base import StreamSig, scan
    from radiorust_tpu.models.wfm import wfm_receiver
    from radiorust_tpu.parallel.pipeline import CrossProcessPipeline

    groups = 2
    bs, n, rate, steps = 2, 2048, 1024000.0, 6
    sig = StreamSig(bs, n, rate)
    bound = wfm_receiver().bind(sig)       # 7 blocks over 4 stages/group
    pipe = CrossProcessPipeline(bound, groups=groups)
    xs = _fm_iq(steps * n, groups * bs, rate)
    xs = np.moveaxis(xs.reshape(groups * bs, steps, n), 1, 0)
    got = pipe.run(xs)
    if got is not None:                    # this process is a group tail
        rows = slice(pipe.gid * bs, (pipe.gid + 1) * bs)
        ref = wfm_receiver().bind(sig)
        _, want = scan(ref, ref.params, ref.init_state(),
                       jnp.asarray(xs[:, rows]))
        np.testing.assert_allclose(
            got[2:], np.asarray(want)[2:], atol=5e-4,
            err_msg=f"pipeline group {pipe.gid}")


def elastic_worker(coordinator: str, num_processes: int, process_id: int,
                   mode: str) -> int:
    """Elastic recovery drill worker (VERDICT r4 item 2).

    ``serve``: stream the time-sharded WFM chain; after two groups, save
    an Orbax sharded checkpoint, then process 1 SIGKILLs itself
    mid-stream.  Survivors run with a 10 s coordination heartbeat, so
    they must ERROR OUT of the dead peer's collectives in well under the
    r4 drill's ~103 s — each prints its measured ``DETECT <s>``.

    ``resume``: a RELAUNCHED smaller cohort (n-1 processes -> a 6-device
    mesh) loads the checkpoint (the r4 scale-down migration machinery:
    same state pytree, new mesh), continues the remaining stream in
    t=6-sized groups, and value-checks every post-recovery chunk against
    the uninterrupted sequential scan."""
    import time

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from radiorust_tpu.parallel import multiprocess as mp
    hb = int(os.environ.get("FAKE_CLUSTER_HEARTBEAT", "10"))
    mp.initialize(coordinator, num_processes, process_id,
                  heartbeat_timeout_seconds=hb)
    import jax.numpy as jnp
    from radiorust_tpu.blocks.base import StreamSig, scan
    from radiorust_tpu.models.wfm import wfm_receiver
    from radiorust_tpu.parallel.multiprocess import \
        assert_addressable_allclose
    from radiorust_tpu.parallel.time_shard import TimeShardedChain
    from radiorust_tpu.utils.checkpoint import load_sharded, save_sharded

    ndev = len(jax.devices())
    t = ndev
    mesh = jax.make_mesh((ndev,), ("t",))
    batch, n, rate = 2, 2048, 1024000.0
    TOTAL = 46          # serve: 2 groups of 8 + kill; resume: 16 + 5x6
    ckpt_dir = os.environ["FAKE_CLUSTER_CKPT"]
    sig = StreamSig(batch, n, rate)
    bound = wfm_receiver().bind(sig)
    ts = TimeShardedChain(bound, mesh, t_axis="t")
    xs_flat = _fm_iq(TOTAL * n, batch, rate)
    xs = np.moveaxis(xs_flat.reshape(batch, TOTAL, n), 1, 0)
    ref = wfm_receiver().bind(sig)
    _, want = scan(ref, ref.params, ref.init_state(), jnp.asarray(xs))
    want = np.asarray(want)
    out_n = bound.out_sig.chunk_len

    def group_x(start):
        g = xs[start:start + t]
        return np.moveaxis(g, 0, 1).reshape(batch, t * n)

    if mode == "serve":
        state = ts.init_state()
        for s in range(2):
            state, _y = ts.process(ts.params, state, group_x(s * t))
        save_sharded(os.path.join(ckpt_dir, "ckpt"), state)
        if process_id == 0:
            with open(os.path.join(ckpt_dir, "progress.json"), "w") as f:
                json.dump({"chunks_done": 2 * t}, f)
        mp.all_processes_ok(True)   # checkpoint durable before the kill
        if process_id == 1:
            print("[p1] elastic drill: SIGKILL mid-stream", flush=True)
            sys.stdout.flush()
            os.kill(os.getpid(), signal.SIGKILL)
        t0 = time.monotonic()
        try:
            s0 = 2 * t
            while s0 + t <= TOTAL:
                state, y = ts.process(ts.params, state, group_x(s0))
                # Force execution: detection surfaces at the fetch.
                np.asarray(next(iter(y.addressable_shards)).data)
                s0 += t
            print(f"[p{process_id}] ERROR: dead peer never detected",
                  flush=True)
            return 7
        except Exception as e:  # noqa: BLE001 - the drill's exit path
            dt = time.monotonic() - t0
            print(f"[p{process_id}] DETECT {dt:.1f} "
                  f"({type(e).__name__})", flush=True)
            return 1

    # mode == "resume"
    with open(os.path.join(ckpt_dir, "progress.json")) as f:
        done = json.load(f)["chunks_done"]
    state = load_sharded(os.path.join(ckpt_dir, "ckpt"), ts.init_state(),
                         mesh=mesh)
    ok = True
    s0 = done
    while s0 + t <= TOTAL:
        state, y = ts.process(ts.params, state, group_x(s0))
        w = np.moveaxis(want[s0:s0 + t], 0, 1).reshape(batch, t * out_n)
        try:
            assert_addressable_allclose(y, w, atol=5e-4,
                                        label=f"resume chunks {s0}")
        except Exception as e:  # noqa: BLE001 - verdict is the artifact
            print(f"[p{process_id}] resume check FAILED: "
                  f"{type(e).__name__}: {str(e)[:500]}", flush=True)
            ok = False
        s0 += t
    ok = mp.all_processes_ok(ok and s0 == TOTAL)
    if process_id == 0:
        with open(os.path.join(ckpt_dir, "resume_verdict.json"),
                  "w") as f:
            json.dump({"ok": bool(ok), "resumed_from_chunk": done,
                       "chunks_recovered": TOTAL - done,
                       "mesh_devices": ndev}, f)
    print(f"[p{process_id}] resume ok={ok}", flush=True)
    return 0 if ok else 1


def worker(coordinator: str, num_processes: int, process_id: int) -> int:
    mode = os.environ.get("FAKE_CLUSTER_ELASTIC")
    if mode:
        return elastic_worker(coordinator, num_processes, process_id, mode)
    # The environment's sitecustomize pins jax to the experimental TPU
    # relay programmatically; the env var alone is not enough (same
    # override as tests/conftest.py).
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from radiorust_tpu.parallel import multiprocess as mp
    mp.initialize(coordinator, num_processes, process_id)
    ndev = len(jax.devices())
    print(f"[p{process_id}] joined: {ndev} global devices "
          f"({len(jax.local_devices())} local)", flush=True)
    ok = True
    cases = []
    kill_case = os.environ.get("FAKE_CLUSTER_KILL")

    # Each case runs inside its own try/except and every process runs
    # EVERY case regardless of its local verdict: a value check can fail
    # on one process only (it checks only its addressable shards), and
    # bailing out early there would desynchronize the job's collective
    # sequence — the other processes would sit in the next case's
    # collectives while this one waits in all_processes_ok, deadlocking
    # until the launcher timeout.  Checks run strictly after a case's
    # collectives complete, so catching them keeps the processes in
    # lock-step; the joint verdict is formed once, at the end.
    # EXCEPTION — kill mode runs STRICT: with a SIGKILLed peer there is
    # no joint verdict to converge on, the survivors must abort at their
    # first failed collective (the drill's entire point).
    def attempt(name, desc, fn):
        nonlocal ok
        try:
            fn()
            # Failure-path drill (tests/test_multiprocess.py): raise in
            # ONE process only, after the case's collectives completed —
            # the job must still converge on a joint ok=false verdict.
            if (os.environ.get("FAKE_CLUSTER_FAIL") == name
                    and process_id == 1):
                raise RuntimeError("injected failure (test)")
            cases.append(name)
            print(f"[p{process_id}] {desc} ok", flush=True)
        except Exception as e:  # noqa: BLE001 - verdict is the artifact
            print(f"[p{process_id}] {desc} FAILED: "
                  f"{type(e).__name__}: {str(e)[:2000]}", flush=True)
            ok = False
            if kill_case:
                raise

    if os.environ.get("FAKE_CLUSTER_SUITE") == "x81":
        # 8-process x 1-device topology (max process count the 8-device
        # mesh allows): every mesh hop crosses a process boundary.
        mesh_t8 = jax.make_mesh((ndev,), ("t",))
        attempt("x81_wfm_time_sharded_t8",
                f"x81 case 1 (t={ndev}, 1 device/process)",
                lambda: _case_time_sharded_wfm(
                    mesh_t8, ndev, None, retune=False,
                    process_id=process_id))
        attempt("x81_pipeline_2groups_x_4stages",
                "x81 case 7 (pipeline x channel groups)",
                lambda: _case_pipeline_x_channel_groups(process_id,
                                                        num_processes))
        ok = mp.all_processes_ok(ok)
        return 0 if ok else 1

    mesh_t = jax.make_mesh((ndev,), ("t",))
    attempt("wfm_time_sharded_t8_with_retune",
            f"case 1 (t={ndev} + retune)",
            lambda: _case_time_sharded_wfm(
                mesh_t, ndev, None, retune=True, process_id=process_id,
                case_name="wfm_time_sharded_t8_with_retune"))
    mesh_cht = jax.make_mesh((num_processes, ndev // num_processes),
                             ("ch", "t"))
    attempt("wfm_ch_across_hosts_x_t_within",
            f"case 2 (ch={num_processes} x t={ndev // num_processes})",
            lambda: _case_time_sharded_wfm(
                mesh_cht, ndev // num_processes, "ch", retune=False,
                process_id=process_id))
    mesh_c = jax.make_mesh((ndev,), ("c",))
    attempt("channelizer_c8_cross_process_all_gather",
            f"case 3 (c={ndev})",
            lambda: _case_channel_sharded(mesh_c))
    # Shared checkpoint dir: all processes must agree on the path (the
    # coordinator port is the job-unique token they all hold).
    tmpdir = os.path.join("/tmp", "rr_fake_cluster_"
                          + coordinator.rsplit(":", 1)[-1])
    if process_id == 0:
        import shutil
        shutil.rmtree(tmpdir, ignore_errors=True)
        os.makedirs(tmpdir, exist_ok=True)
    mp.all_processes_ok(True)  # barrier: dir ready before any save
    attempt("orbax_distributed_checkpoint_resume",
            f"case 4 (t={ndev} orbax ckpt/resume)",
            lambda: _case_distributed_checkpoint(mesh_t, ndev, tmpdir))
    attempt("pipeline_one_stage_per_process",
            f"case 5 (pipeline x{num_processes} hosts)",
            lambda: _case_cross_process_pipeline(process_id,
                                                 num_processes))
    mesh_sc = jax.make_mesh((num_processes, ndev // num_processes),
                            ("s", "c"))
    attempt("streams_across_hosts_x_channels_within",
            f"case 6 (s={num_processes} x c={ndev // num_processes})",
            lambda: _case_streams_x_channels(
                mesh_sc, process_id,
                case_name="streams_across_hosts_x_channels_within"))
    ok = mp.all_processes_ok(ok)
    if os.environ.get("FAKE_CLUSTER_FAIL") or kill_case:
        # Failure drills report via exit codes only — never overwrite
        # the real artifact with an injected failure.
        return 0 if ok else 1
    if os.environ.get("FAKE_CLUSTER_WRITE") != "1":
        # Only the launcher's own run owns the artifact: the test suite
        # reuses these workers (tests/test_multiprocess.py) and must not
        # clobber a drill-enriched MULTIPROC artifact with a bare
        # base-suite one (this exact clobber shipped once).
        return 0 if ok else 1
    if process_id == 0:
        art = {"ok": ok, "num_processes": num_processes,
               "global_devices": ndev, "cases": cases,
               "skipped": False,
               "notes": f"{num_processes}-process fake cluster "
                        "(jax.distributed + Gloo); per-shard value "
                        "checks vs sequential scan"}
        with open(ARTIFACT, "w") as f:
            json.dump(art, f, indent=1)
        print(f"[p0] wrote {os.path.basename(ARTIFACT)} ok={ok}",
              flush=True)
    return 0 if ok else 1


_KILL_HOOKED_CASES = ("wfm_time_sharded_t8_with_retune",
                      "streams_across_hosts_x_channels_within")


def run_kill_drill(num_processes: int, local_devices: int,
                   kill_case: str = "wfm_time_sharded_t8_with_retune",
                   timeout: float = 600.0):
    """SIGKILL one worker mid-stream; assert the survivors error out of
    the dead peer's collectives within the timeout instead of hanging.
    Returns the drill verdict dict (merged into the artifact).  Only
    cases with a _maybe_die hook are valid targets — an unhooked name
    would run the whole suite with no kill and report a misleading
    failure verdict."""
    if kill_case not in _KILL_HOOKED_CASES:
        raise ValueError(f"kill_case {kill_case!r} has no _maybe_die "
                         f"hook; hooked: {_KILL_HOOKED_CASES}")
    import time

    from radiorust_tpu.parallel.multiprocess import launch_local_cluster
    t0 = time.monotonic()
    codes, outputs = launch_local_cluster(
        os.path.abspath(__file__), num_processes=num_processes,
        local_devices=local_devices, timeout=timeout,
        env_extra={"FAKE_CLUSTER_KILL": kill_case})
    took = time.monotonic() - t0
    victim_killed = codes[1] == -signal.SIGKILL
    survivors = [codes[i] for i in range(num_processes) if i != 1]
    hung = [c for c in survivors if c is None]
    errored = all(c is not None and c != 0 for c in survivors)
    ok = victim_killed and errored and not hung
    return {"ok": ok, "kill_case": kill_case, "victim_code": codes[1],
            "survivor_codes": survivors, "took_s": round(took, 1),
            "hung": len(hung)}, outputs


def run_elastic_drill(num_processes: int, local_devices: int,
                      heartbeat_s: int = 10, timeout: float = 900.0):
    """Elastic recovery (VERDICT r4 item 2): compose detection INTO
    recovery.  Phase A SIGKILLs one worker mid-stream after an Orbax
    sharded checkpoint; survivors (10 s heartbeat) must error out fast —
    measured as ``detect_s``.  Phase B relaunches an (n-1)-process
    cohort that re-forms the smaller mesh, loads the checkpoint, and
    continues the stream with every post-recovery chunk value-checked
    (``recovery_s`` = relaunch + restore + full residual stream)."""
    import shutil
    import time

    from radiorust_tpu.parallel.multiprocess import (free_port,
                                                     launch_local_cluster)
    tmpdir = os.path.join("/tmp", f"rr_elastic_{free_port()}")
    shutil.rmtree(tmpdir, ignore_errors=True)
    os.makedirs(tmpdir, exist_ok=True)
    env_a = dict(os.environ,
                 FAKE_CLUSTER_ELASTIC="serve", FAKE_CLUSTER_CKPT=tmpdir,
                 FAKE_CLUSTER_HEARTBEAT=str(heartbeat_s),
                 JAX_PLATFORMS="cpu",
                 XLA_FLAGS=("--xla_force_host_platform_device_count="
                            f"{local_devices}"))
    # Phase A runs under a POLLING launcher (not launch_local_cluster):
    # the JAX distributed client hard-terminates survivors when the
    # coordination service reports the dead peer (client.h fatal path —
    # no Python exception to catch), so detection latency is measured
    # from OUTSIDE as (survivor exit time) - (victim exit time).
    import subprocess as _sp
    import tempfile
    port = free_port()
    logs = [tempfile.NamedTemporaryFile("w+", suffix=f".p{i}.log",
                                        delete=False)
            for i in range(num_processes)]
    procs = [_sp.Popen(
        [sys.executable, os.path.abspath(__file__),
         "--process-id", str(i), "--coordinator", f"127.0.0.1:{port}",
         "--num-processes", str(num_processes)],
        env=env_a, stdout=logs[i], stderr=_sp.STDOUT, text=True)
        for i in range(num_processes)]
    deadline = time.monotonic() + timeout
    exits = {}
    while len(exits) < num_processes and time.monotonic() < deadline:
        for i, p in enumerate(procs):
            if i not in exits and p.poll() is not None:
                exits[i] = (p.returncode, time.monotonic())
        time.sleep(0.1)
    hung = [i for i in range(num_processes) if i not in exits]
    for i in hung:
        procs[i].kill()
        procs[i].wait()
    outputs = []
    for lf in logs:
        lf.flush()
        lf.seek(0)
        outputs.append(lf.read())
        lf.close()
        os.unlink(lf.name)
    victim_killed = (1 in exits
                     and exits[1][0] == -signal.SIGKILL)
    surv_ids = [i for i in range(num_processes) if i != 1]
    survivors = [exits[i][0] if i in exits else None for i in surv_ids]
    detect_s = None
    if victim_killed and not hung:
        t_kill = exits[1][1]
        detect_s = round(max(exits[i][1] for i in surv_ids) - t_kill, 1)
    phase_a_ok = (victim_killed and not hung
                  and all(c is not None and c != 0 for c in survivors)
                  and detect_s is not None)
    t1 = time.monotonic()
    codes_b, outputs_b = launch_local_cluster(
        os.path.abspath(__file__), num_processes=num_processes - 1,
        local_devices=local_devices, timeout=timeout,
        env_extra={"FAKE_CLUSTER_ELASTIC": "resume",
                   "FAKE_CLUSTER_CKPT": tmpdir})
    recovery_s = time.monotonic() - t1
    phase_b_ok = all(c == 0 for c in codes_b)
    verdict_file = os.path.join(tmpdir, "resume_verdict.json")
    resume_verdict = None
    if os.path.exists(verdict_file):
        with open(verdict_file) as f:
            resume_verdict = json.load(f)
    ok = (phase_a_ok and phase_b_ok
          and bool(resume_verdict and resume_verdict.get("ok"))
          and detect_s < 15.0)
    return {"ok": ok, "heartbeat_s": heartbeat_s,
            "detect_s": detect_s,
            "detect_target_s": 15.0,
            "victim_code": exits.get(1, (None,))[0],
            "survivor_codes": survivors,
            "recovery_s": round(recovery_s, 1),
            "resume": resume_verdict}, outputs + outputs_b


def run_x81_suite(timeout: float = 900.0):
    """8-process x 1-device run: case 1 at t=8 with every hop
    cross-process, plus the pipeline x channel-groups composition
    (VERDICT r4 item 7)."""
    from radiorust_tpu.parallel.multiprocess import launch_local_cluster
    codes, outputs = launch_local_cluster(
        os.path.abspath(__file__), num_processes=8, local_devices=1,
        timeout=timeout, env_extra={"FAKE_CLUSTER_SUITE": "x81"})
    ok = all(c == 0 for c in codes)
    return {"ok": ok, "num_processes": 8, "local_devices": 1,
            "cases": ["x81_wfm_time_sharded_t8",
                      "x81_pipeline_2groups_x_4stages"],
            "exit_codes": codes}, outputs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=4)
    ap.add_argument("--local-devices", type=int, default=2)
    ap.add_argument("--skip-kill-drill", action="store_true")
    ap.add_argument("--skip-elastic", action="store_true")
    ap.add_argument("--skip-x81", action="store_true")
    args = ap.parse_args()
    if args.process_id is not None:
        sys.exit(worker(args.coordinator, args.num_processes,
                        args.process_id))
    # Launcher mode: the 6 value-check cases, then the SIGKILL drill.
    from radiorust_tpu.parallel.multiprocess import launch_local_cluster
    codes, outputs = launch_local_cluster(
        os.path.abspath(__file__), num_processes=args.num_processes,
        local_devices=args.local_devices,
        env_extra={"FAKE_CLUSTER_WRITE": "1"})
    for i, out in enumerate(outputs):
        print(f"--- process {i} (exit {codes[i]}) ---")
        print(out)
    if any(c != 0 for c in codes):
        sys.exit(1)
    if not args.skip_kill_drill:
        drill, drill_out = run_kill_drill(args.num_processes,
                                          args.local_devices)
        print(f"--- SIGKILL drill: {json.dumps(drill)} ---")
        if not drill["ok"]:
            for i, out in enumerate(drill_out):
                print(f"--- drill process {i} ---")
                print(out)
            sys.exit(1)
        with open(ARTIFACT) as f:
            art = json.load(f)
        art["cases"].append("sigkill_peer_survivors_error_out")
        art["kill_drill"] = drill
        with open(ARTIFACT, "w") as f:
            json.dump(art, f, indent=1)
        print(f"updated {os.path.basename(ARTIFACT)} with kill drill")
    if not args.skip_elastic:
        elastic, el_out = run_elastic_drill(args.num_processes,
                                            args.local_devices)
        print(f"--- elastic recovery drill: {json.dumps(elastic)} ---")
        if not elastic["ok"]:
            for i, out in enumerate(el_out):
                print(f"--- elastic process output {i} ---")
                print(out)
            sys.exit(1)
        with open(ARTIFACT) as f:
            art = json.load(f)
        art["cases"].append("elastic_sigkill_checkpoint_resume_smaller_mesh")
        art["elastic_drill"] = elastic
        with open(ARTIFACT, "w") as f:
            json.dump(art, f, indent=1)
        print(f"updated {os.path.basename(ARTIFACT)} with elastic drill")
    if not args.skip_x81:
        x81, x81_out = run_x81_suite()
        print(f"--- 8x1 suite: {json.dumps(x81)} ---")
        if not x81["ok"]:
            for i, out in enumerate(x81_out):
                print(f"--- x81 process {i} ---")
                print(out)
            sys.exit(1)
        with open(ARTIFACT) as f:
            art = json.load(f)
        art["cases"].extend(x81["cases"])
        art["x81"] = x81
        with open(ARTIFACT, "w") as f:
            json.dump(art, f, indent=1)
        print(f"updated {os.path.basename(ARTIFACT)} with the 8x1 suite")
    sys.exit(0)


if __name__ == "__main__":
    main()
