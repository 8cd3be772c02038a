"""Multi-host runtime: jax.distributed bootstrap + per-process data slicing.

The reference is a single-process, single-device program
(train_unet_segmentation.py:426); SURVEY.md §2.5/§5 plans the TPU-native
communication backend as ``jax.distributed.initialize()`` + XLA collectives
over ICI (intra-slice) / DCN (multi-slice) — the compiler owns every
collective; nothing here hand-writes NCCL-style comms.

Single-host runs (including this repo's CI) never need to call
``initialize_runtime`` — every helper degrades to the 1-process case.
Multi-host usage:

    initialize_runtime(coordinator_address="host0:8476",
                       num_processes=N, process_id=i)   # or TPU auto-detect
    mesh = make_mesh()              # jax.devices() is global post-init
    idx = process_local_indices(train_idx, batch_size)  # this host's shard

Each process feeds only its local slice of every global batch;
``jax.make_array_from_process_local_data`` assembles the logically-global
sharded array the jitted step consumes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax


def initialize_runtime(coordinator_address: Optional[str] = None,
                       num_processes: Optional[int] = None,
                       process_id: Optional[int] = None) -> tuple[int, int]:
    """Bootstrap the multi-host JAX runtime; no-op for single-process runs.

    On Cloud TPU pods all three arguments are auto-detected from the
    metadata server, so ``initialize_runtime()`` with no arguments is
    correct there too; explicit arguments cover GPU/CPU clusters.
    Returns (process_index, process_count).
    """
    already = getattr(jax.distributed,
                      "is_initialized", lambda: False)()
    explicit = (coordinator_address is not None
                or (num_processes or 0) > 1)
    if explicit and not already:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    return jax.process_index(), jax.process_count()


def process_local_indices(indices: Sequence[int], global_batch: int,
                          process: Optional[int] = None,
                          count: Optional[int] = None) -> np.ndarray:
    """This process's contiguous per-batch slice of a global index order.

    Every process iterates the SAME shuffled global order (same seed/epoch)
    and takes rows [p*b_local, (p+1)*b_local) of every global batch, so the
    union over processes reproduces single-host batches exactly.

    A ragged FINAL chunk (dataset not divisible by the global batch) is kept
    only when it still splits evenly over the processes; otherwise it is
    dropped on every process.  A lopsided split (process 0 taking its full
    share, later processes short or empty) would desync per-process batch
    counts and shapes — the jitted step's collectives would then see
    inconsistent global shapes and hang.  ``process``/``count`` default to
    the runtime's values (overridable for tests)."""
    indices = np.asarray(indices)
    p = jax.process_index() if process is None else process
    n = jax.process_count() if count is None else count
    if n == 1:
        return indices
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{n} processes")
    local = global_batch // n
    out = []
    for start in range(0, len(indices), global_batch):
        chunk = indices[start:start + global_batch]
        b = len(chunk)
        if b % n:  # ragged tail that cannot split evenly: drop everywhere
            break
        out.append(chunk[p * (b // n):(p + 1) * (b // n)])
    return np.concatenate(out) if out else indices[:0]


def global_batch_from_local(local_batch, mesh, ndim: int = 4):
    """Assemble the logically-global sharded array from this process's
    local rows (multi-host H2D: each host feeds only its chips)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P("data", *([None] * (ndim - 1))))
    if jax.process_count() == 1:
        return jax.device_put(local_batch, sharding)
    return jax.make_array_from_process_local_data(sharding, local_batch)
