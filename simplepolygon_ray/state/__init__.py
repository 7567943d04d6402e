from .manifest import CheckpointedRunner, ShardManifest, load_output
from .metrics import stage_metrics

__all__ = ["CheckpointedRunner", "ShardManifest", "load_output", "stage_metrics"]
