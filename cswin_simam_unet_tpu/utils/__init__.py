"""Utilities: profiling/tracing hooks, debug modes, throughput meters."""

from cswin_simam_unet_tpu.utils.profiling import (  # noqa: F401
    ThroughputMeter,
    trace,
    start_profiler_server,
)
from cswin_simam_unet_tpu.utils.debug import enable_debug_checks  # noqa: F401
