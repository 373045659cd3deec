from travel_data_pipeline_spark.functions import hashing, scalars, scores

__all__ = ["scalars", "scores", "hashing"]
