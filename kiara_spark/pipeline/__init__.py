from .config import PipelineConfig, PipelineStep
from .structure import PipelineStructure
from .runner import PipelineModule, run_pipeline

__all__ = ["PipelineConfig", "PipelineStep", "PipelineStructure", "PipelineModule", "run_pipeline"]
