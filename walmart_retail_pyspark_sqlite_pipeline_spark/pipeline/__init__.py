from .incremental import (
    build_rollup,
    hourly_rollup,
    incremental_rollup_merge,
    rollup_stream_sink,
)
from .orchestrator import PipelineConfig, run_pipeline

__all__ = [
    "PipelineConfig",
    "run_pipeline",
    "hourly_rollup",
    "build_rollup",
    "incremental_rollup_merge",
    "rollup_stream_sink",
]
