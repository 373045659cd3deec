from travel_data_pipeline_spark.streaming import jobs  # noqa: F401
