"""REAL 2-process multi-host integration test (CPU backend).

Two subprocesses, each owning 4 virtual CPU devices, bootstrap
``jax.distributed`` against a local coordinator and run one data-parallel
train step where each process feeds only ITS local rows via
``global_batch_from_local`` / ``jax.make_array_from_process_local_data``.
The loss and updated-parameter checksum must equal the single-process
8-device run of the same step — exercising ``initialize_runtime`` and the
cross-process array assembly for real, not with mocked process counts
(the unit tests in test_parallel.py fake process/count; this one doesn't).

The reference has no multi-process capability at all
(train_unet_segmentation.py:426 — single torch.device).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_step_matches_single_process():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU conftest mesh")

    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if not f.startswith("--xla_force_host_platform_device_count")]
    flags.append("--xla_force_host_platform_device_count=4")
    env["XLA_FLAGS"] = " ".join(flags)

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "_multihost_worker.py"),
             coordinator, "2", str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(2)
    ]
    results = {}
    logs = []
    try:
        for proc in procs:
            out, _ = proc.communicate(timeout=600)
            logs.append(out)
            assert proc.returncode == 0, f"worker failed:\n{out}"
            for line in out.splitlines():
                if line.startswith("MULTIHOST_RESULT"):
                    _, pid, loss, checksum = line.split()
                    results[int(pid)] = (float(loss), float(checksum))
    finally:
        for proc in procs:
            if proc.poll() is None:
                proc.kill()

    assert set(results) == {0, 1}, f"missing worker results; logs: {logs}"
    # both processes observe the same replicated loss/params
    assert results[0] == pytest.approx(results[1], rel=1e-12)

    # single-process reference: same step, same global batch, this
    # process's 8-device mesh
    sys.path.insert(0, HERE)
    from tests_multihost_model import build_step_and_batch
    from cswin_simam_unet_tpu.parallel import (
        make_mesh, replicated, shard_state, batch_sharding)

    model, step, state, images_np, masks_np = build_step_and_batch()
    mesh = make_mesh((8,), ("data",))
    state = shard_state(state, mesh)
    images = jax.device_put(images_np, batch_sharding(mesh, 4))
    masks = jax.device_put(masks_np, batch_sharding(mesh, 4))
    rng = jax.device_put(jax.random.PRNGKey(1), replicated(mesh))
    new_state, metrics = step(state, images, masks, rng)
    loss = float(metrics["loss"])
    checksum = float(sum(
        np.abs(np.asarray(x, np.float64)).sum()
        for x in jax.tree_util.tree_leaves(jax.device_get(new_state.params))))

    got_loss, got_checksum = results[0]
    assert got_loss == pytest.approx(loss, abs=1e-6)
    assert got_checksum == pytest.approx(checksum, rel=1e-7)
