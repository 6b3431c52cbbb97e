from geneevolve_tpu.utils.telemetry import (  # noqa: F401
    StageTimer,
    device_memory_mb,
    process_mem_usage,
    profiler_trace,
)
