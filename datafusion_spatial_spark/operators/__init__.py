from datafusion_spatial_spark.operators import (  # noqa: F401
    dedup,
    hashing,
    multimodal,
    simsearch,
    spatial_agg,
    spatial_cluster,
    spatial_knn,
    text,
)
