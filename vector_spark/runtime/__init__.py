from .metrics import PipelineMetrics, with_lineage
from .checkpoint import CheckpointedRun
from .compact import PartitionPlan, compact_sink, compaction_plan

__all__ = [
    "PipelineMetrics", "with_lineage", "CheckpointedRun",
    "PartitionPlan", "compact_sink", "compaction_plan",
]
