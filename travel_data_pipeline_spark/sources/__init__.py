from travel_data_pipeline_spark.sources.readers import load_table, load_tables

__all__ = ["load_table", "load_tables"]
