"""Multi-host gating logic (parallel/distributed.py). Actual pod
initialization needs a coordinator and N processes; what CI can pin down is
the environment gate and the single-process contracts every CLI relies on."""

import os

import numpy as np
import pytest

from wordgesture_gan_tpu.parallel import (
    distributed_env_requested,
    maybe_init_distributed,
    process_local_batch_slice,
)


@pytest.fixture
def clean_env(monkeypatch):
    for var in ("WGG_DISTRIBUTED", "JAX_NUM_PROCESSES",
                "JAX_COORDINATOR_ADDRESS", "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    return monkeypatch


def test_not_requested_by_default(clean_env):
    assert not distributed_env_requested()
    assert maybe_init_distributed(verbose=False) is False


def test_requested_via_explicit_vars(clean_env):
    clean_env.setenv("JAX_NUM_PROCESSES", "4")
    assert distributed_env_requested()


def test_single_process_not_requested(clean_env):
    clean_env.setenv("JAX_NUM_PROCESSES", "1")
    assert not distributed_env_requested()


def test_requested_via_opt_in(clean_env):
    clean_env.setenv("WGG_DISTRIBUTED", "1")
    assert distributed_env_requested()


def test_single_process_batch_slice(clean_env):
    assert process_local_batch_slice(512) == slice(0, 512)


def test_batch_slices_match_gspmd_block_layout(monkeypatch):
    """Slices must follow GSPMD's ceil-division blocks (the last block may be
    short), covering every row exactly once even when indivisible."""
    import wordgesture_gan_tpu.parallel.distributed as dist

    monkeypatch.setattr(dist, "_INITIALIZED", True)
    for n_proc, global_batch in [(4, 10), (4, 12), (3, 7), (8, 8), (4, 3)]:
        import jax as _jax

        monkeypatch.setattr(_jax, "process_count", lambda n=n_proc: n)
        rows = []
        per = -(-global_batch // n_proc)
        for i in range(n_proc):
            monkeypatch.setattr(_jax, "process_index", lambda i=i: i)
            s = dist.process_local_batch_slice(global_batch)
            assert s == slice(min(i * per, global_batch),
                              min((i + 1) * per, global_batch))
            rows.extend(range(s.start, s.stop))
        assert rows == list(range(global_batch))


def test_chunk_layout_and_padding():
    from wordgesture_gan_tpu.utils.chunking import chunk_layout, pad_to_chunks

    import numpy as np

    assert chunk_layout(100, 512) == (128, 1)
    assert chunk_layout(5000, 512) == (512, 10)
    assert chunk_layout(1, 512) == (1, 1)
    a = np.arange(10, dtype=np.float32).reshape(5, 2)
    p = pad_to_chunks(a, 4, 2)
    assert p.shape == (8, 2)
    np.testing.assert_array_equal(p[:5], a)
    assert (p[5:] == 0).all()


def _run_two_process_workers(mode: str, extra_env: dict = None,
                             after_start=None) -> list:
    """Spawn two real processes joined into one distributed runtime over
    localhost (gloo CPU collectives); return their stdouts after asserting
    both exited 0. ``after_start(procs)`` runs once both are spawned (for
    mid-run choreography like the preemption drill's targeted SIGTERM).
    See tests/_distributed_worker.py."""
    import socket
    import subprocess
    import sys
    from pathlib import Path

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = Path(__file__).parent / "_distributed_worker.py"
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            **(extra_env or {}),
        )
        procs.append(subprocess.Popen(
            [sys.executable, str(worker), mode], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    if after_start is not None:
        try:
            after_start(procs)
        except Exception:
            for q in procs:
                q.kill()
            raise
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"worker {pid} OK" in out, out
    return outs


def test_two_process_execution():
    """Minimal collective pattern: a jitted data-sharded grad step whose
    all-reduce crosses the process boundary, checked in-worker against the
    unsharded computation."""
    _run_two_process_workers("toy")


@pytest.mark.slow
def test_two_process_preemption_drill(tmp_path):
    """Failure drill (VERDICT r4 #8): SIGTERM exactly ONE of two training
    processes mid-run. PreemptionGuard.agreed()'s allgather must stop BOTH
    processes on the same epoch with a checkpoint written (not leave the
    unsignalled process hanging in the next epoch's collectives), and a
    rerun of the same command resumes and completes."""
    import re
    import signal
    import time

    marker = tmp_path / "phase1_underway"

    def sigterm_one_worker(procs):
        deadline = time.time() + 300
        while not marker.exists():
            for p in procs:
                assert p.poll() is None, "worker died before the drill"
            assert time.time() < deadline, "drill marker never appeared"
            time.sleep(0.1)
        # Signal ONLY the non-main process: the stop must travel to process 0
        # through the agreed() collective, not through a local flag.
        procs[1].send_signal(signal.SIGTERM)

    outs = _run_two_process_workers(
        "preempt", extra_env={"WGG_TEST_CKPT": str(tmp_path)},
        after_start=sigterm_one_worker,
    )

    phase1, phase2 = {}, {}
    for out in outs:
        for m in re.finditer(r"PHASE1 pid=(\d+) epochs=(\d+)", out):
            phase1[int(m.group(1))] = int(m.group(2))
        for m in re.finditer(r"PHASE2 pid=(\d+) epochs=(\d+)", out):
            phase2[int(m.group(1))] = int(m.group(2))

    assert set(phase1) == {0, 1}, f"missing PHASE1 lines: {outs}"
    # Both processes left the loop on the SAME epoch, mid-run.
    assert phase1[0] == phase1[1], f"processes stopped on different epochs: {phase1}"
    assert 0 < phase1[0] < 500
    # The preemption checkpoint exists and the resume ran exactly the rest.
    assert phase2 == {0: 3, 1: 3}, f"resume did not complete: {phase2}"


@pytest.mark.slow
def test_two_process_gan_training_parity():
    """The PRODUCTION train_gan loop across two processes (VERDICT r3 #4):
    global_replicate / global_shard feed each process's local block via
    jax.make_array_from_process_local_data, and the final losses + generator
    parameter digest match a single-process run of the identical
    configuration."""
    import json
    import sys
    from pathlib import Path

    outs = _run_two_process_workers("gan")
    line = next(l for out in outs for l in out.splitlines()
                if l.startswith("GANRESULT "))
    got = json.loads(line[len("GANRESULT "):])

    sys.path.insert(0, str(Path(__file__).parent))
    from _distributed_worker import gan_digest, tiny_gan_setup

    from wordgesture_gan_tpu.train.gan_loop import train_gan

    mcfg, tcfg, rcfg, ds = tiny_gan_setup()
    # 4 devices on the parent's 8-device CPU platform == the workers' global
    # device count, so the sharded layout (2 rows/device at B=8) is identical.
    import dataclasses

    rcfg = dataclasses.replace(rcfg, data_axis_size=4)
    ref = train_gan(ds, mcfg, tcfg, rcfg, num_epochs=2, seed=3,
                    checkpoint_dir=None, resume=False, verbose=False)

    # Same data order, same RNG streams, same collective math — only the
    # reduction topology differs (gloo cross-host vs local), so fp32
    # tolerances are tight but not bitwise.
    np.testing.assert_allclose(got["digest"], gan_digest(ref.state), rtol=1e-4)
    for k, v in ref.history[-1].items():
        np.testing.assert_allclose(got["losses"][k], v, rtol=5e-3, atol=1e-4,
                                   err_msg=f"loss {k}")
