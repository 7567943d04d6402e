from .manifest import CheckpointedRunner, ShardManifest, load_output, write_partitioned
from .metrics import stage_metrics

__all__ = [
    "CheckpointedRunner",
    "ShardManifest",
    "load_output",
    "write_partitioned",
    "stage_metrics",
]
