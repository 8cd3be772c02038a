"""Tracing / profiling subsystem (SURVEY.md §5).

The reference has no profiling beyond tqdm progress bars
(train_unet_segmentation.py:335,364-368).  Here:

* ``trace(logdir)``          — context manager around ``jax.profiler.trace``;
  produces XProf/TensorBoard traces of the jitted steps (view with
  ``tensorboard --logdir``).
* ``start_profiler_server``  — live-attach server for ``xprof``.
* ``ThroughputMeter``        — steps/sec + images/sec/chip meter feeding the
  north-star metric.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    with jax.profiler.trace(logdir):
        yield


def start_profiler_server(port: int = 9999):
    jax.profiler.start_server(port)
    return port


class ThroughputMeter:
    """Tracks steps/sec and images/sec/chip over a sliding window."""

    def __init__(self, n_chips: int | None = None):
        self.n_chips = n_chips or jax.device_count()
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._steps = 0
        self._images = 0

    def update(self, batch_size: int):
        self._steps += 1
        self._images += batch_size

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self._t0

    @property
    def steps_per_sec(self) -> float:
        return self._steps / max(self.elapsed, 1e-9)

    @property
    def images_per_sec(self) -> float:
        return self._images / max(self.elapsed, 1e-9)

    @property
    def images_per_sec_per_chip(self) -> float:
        return self.images_per_sec / self.n_chips

    def summary(self) -> str:
        return (f"{self.steps_per_sec:.2f} steps/s, "
                f"{self.images_per_sec:.1f} img/s "
                f"({self.images_per_sec_per_chip:.1f} img/s/chip)")
