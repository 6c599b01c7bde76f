from .metrics import PipelineMetrics, with_lineage
from .checkpoint import CheckpointedRun

__all__ = ["PipelineMetrics", "with_lineage", "CheckpointedRun"]
