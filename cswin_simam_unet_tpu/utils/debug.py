"""Debug / sanitizer modes (SURVEY.md §5 race-detection row).

JAX's pure-functional model makes data races structurally impossible in the
compute path (the reference's one shared-state hazard — skip tensors stored
on ``self`` during forward, train_cswinunet_segmentation.py:632-642 — is
designed away by returning the skip pyramid).  What remains worth checking
is numerics: NaN/Inf surfacing inside jit.
"""

from __future__ import annotations

import jax


def enable_debug_checks(nans: bool = True, infs: bool = False) -> None:
    """Turn on jit-level NaN/Inf detection (CI and debugging; slows
    execution — do not enable for benchmarking)."""
    if nans:
        jax.config.update("jax_debug_nans", True)
    if infs:
        jax.config.update("jax_debug_infs", True)
