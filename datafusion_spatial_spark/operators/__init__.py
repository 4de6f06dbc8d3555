from datafusion_spatial_spark.operators import (  # noqa: F401
    corpus,
    dedup,
    hashing,
    multimodal,
    simsearch,
    skew,
    spatial_agg,
    spatial_cluster,
    spatial_knn,
    text,
)
