from .orchestrator import PipelineConfig, run_pipeline

__all__ = ["PipelineConfig", "run_pipeline"]
