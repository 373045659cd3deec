from travel_data_pipeline_spark.plans import flights  # noqa: F401
