"""Editing layer: StyleCLIP mappers, Where2edit attention mappers, clustering."""

from where2edit_tpu.editing.latent_mappers import (
    STYLESPACE_DIMENSIONS,
    Mapper,
    SingleMapper,
    LevelsMapper,
    FullStyleSpaceMapper,
    WithoutToRGBStyleSpaceMapper,
)
from where2edit_tpu.editing.attention_mappers import (
    FullSpaceMapperFEATClusterLin,
    FullSpaceMapperFEATClusterLinStyle,
    FullSpaceMapperFEATLin,
    FullSpaceMapperSpatialLin,
    MapperOutput,
)
from where2edit_tpu.editing.clustering import (
    assign_clusters,
    cluster_features,
    kmeans_fit,
)
from where2edit_tpu.editing.masks import (
    straight_through_threshold,
    finalize_attention_map,
)

__all__ = [
    "STYLESPACE_DIMENSIONS",
    "Mapper",
    "SingleMapper",
    "LevelsMapper",
    "FullStyleSpaceMapper",
    "WithoutToRGBStyleSpaceMapper",
    "FullSpaceMapperFEATClusterLin",
    "FullSpaceMapperFEATClusterLinStyle",
    "FullSpaceMapperFEATLin",
    "FullSpaceMapperSpatialLin",
    "MapperOutput",
    "assign_clusters",
    "cluster_features",
    "kmeans_fit",
    "straight_through_threshold",
    "finalize_attention_map",
]
