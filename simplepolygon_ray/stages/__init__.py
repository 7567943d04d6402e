from .cover_stage import (
    DEFAULT_LEVEL,
    cover_batch,
    cover_rings_dataset,
    index_points_batch,
)
from .decompose_stage import (
    RING_SCHEMA,
    decompose_batch,
    decompose_dataset,
    fixture_polygons,
    polygons_source,
)
from .knn import CellPointIndex, KnnActor, haversine_km, knn_join
from .pip_join import (
    CompiledRingIndex,
    PipJoinActor,
    pip_join_broadcast,
    pip_join_shuffle,
)
from .media import (
    AudioFeatureActor,
    ImageDecodeActor,
    ImageResizeActor,
    VideoFrameSampleActor,
    decode_and_featurize,
    resize_images,
)
from .tiles import sutherland_hodgman_bbox, tile_assign_dataset, tile_clip_batch

__all__ = [
    "ImageDecodeActor",
    "ImageResizeActor",
    "AudioFeatureActor",
    "VideoFrameSampleActor",
    "decode_and_featurize",
    "resize_images",
    "DEFAULT_LEVEL",
    "RING_SCHEMA",
    "decompose_batch",
    "decompose_dataset",
    "polygons_source",
    "fixture_polygons",
    "cover_batch",
    "cover_rings_dataset",
    "index_points_batch",
    "CompiledRingIndex",
    "PipJoinActor",
    "pip_join_broadcast",
    "pip_join_shuffle",
    "CellPointIndex",
    "KnnActor",
    "knn_join",
    "haversine_km",
    "sutherland_hodgman_bbox",
    "tile_clip_batch",
    "tile_assign_dataset",
]
