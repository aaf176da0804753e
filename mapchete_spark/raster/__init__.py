"""Masked-array raster kernels (numpy; run inside Arrow-batched UDFs)."""

from mapchete_spark.raster.array import (
    clip_array_with_vector,
    extract_from_array,
    prepare_array,
    rasterize_mask,
    resample_from_array,
)
from mapchete_spark.raster.mosaic import create_mosaic
from mapchete_spark.raster.dem import elevation, dem_tile

__all__ = [
    "clip_array_with_vector",
    "extract_from_array",
    "prepare_array",
    "rasterize_mask",
    "resample_from_array",
    "create_mosaic",
    "elevation",
    "dem_tile",
]
