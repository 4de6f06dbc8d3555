from datafusion_spatial_spark.sources.geoparquet import (
    read_geoparquet,
    write_geoparquet,
)

__all__ = ["read_geoparquet", "write_geoparquet"]
