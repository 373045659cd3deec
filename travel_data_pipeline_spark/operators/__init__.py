from travel_data_pipeline_spark.operators import (  # noqa: F401
    aggregates,
    dedup,
    joins,
    multimodal,
    similarity,
    text,
    windows,
)
