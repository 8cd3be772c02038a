"""Worker script for the real 2-process multi-host integration test.

Each process owns 4 virtual CPU devices (8 global), bootstraps the
jax.distributed runtime against a local coordinator, feeds only its local
rows of the SAME global batch through ``global_batch_from_local``, runs one
data-parallel train step, and prints the loss + updated-parameter checksum
for the parent to compare against the single-process result.

Run: python _multihost_worker.py <coordinator> <num_procs> <proc_id>
(environment must already force the CPU platform + 4 virtual devices —
see test_multihost.py).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


def main():
    coordinator, n_procs, pid = (sys.argv[1], int(sys.argv[2]),
                                 int(sys.argv[3]))
    from cswin_simam_unet_tpu.parallel import (
        global_batch_from_local,
        initialize_runtime,
        make_mesh,
        replicated,
        shard_state,
    )
    p, n = initialize_runtime(coordinator_address=coordinator,
                              num_processes=n_procs, process_id=pid)
    assert (p, n) == (pid, n_procs), (p, n)
    devices = jax.devices()
    assert len(devices) == 4 * n_procs, devices

    from tests_multihost_model import build_step_and_batch
    model, step, state, images_np, masks_np = build_step_and_batch()

    mesh = make_mesh((len(devices),), ("data",))
    state = shard_state(state, mesh)
    local = len(images_np) // n_procs
    images = global_batch_from_local(images_np[p * local:(p + 1) * local],
                                     mesh)
    masks = global_batch_from_local(masks_np[p * local:(p + 1) * local],
                                    mesh)
    rng = jax.device_put(jax.random.PRNGKey(1), replicated(mesh))
    new_state, metrics = step(state, images, masks, rng)
    loss = float(metrics["loss"])
    checksum = float(sum(
        np.abs(np.asarray(x, np.float64)).sum()
        for x in jax.tree_util.tree_leaves(jax.device_get(new_state.params))))
    print(f"MULTIHOST_RESULT {pid} {loss:.10f} {checksum:.6f}", flush=True)


if __name__ == "__main__":
    main()
