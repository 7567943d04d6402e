from .manifest import CheckpointedRunner, ShardManifest, load_output

__all__ = ["CheckpointedRunner", "ShardManifest", "load_output"]
