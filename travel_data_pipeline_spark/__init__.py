"""travel_data_pipeline_spark — a from-scratch PySpark-native analytics engine.

Re-expresses every data capability of the reference pipeline
(juxpkr/travel-data-pipeline, surveyed in /root/repo/SURVEY.md) as
declarative DataFrame/SQL plans over Parquet, plus Structured Streaming
for its streaming legs, plus the large-scale training-data operators
(dedup, similarity search, text analysis, multimodal plumbing) that a
100 TB pipeline needs.

Design stance (SURVEY.md §7): a small library of pure
DataFrame -> DataFrame operator functions and Column-builder scalar
functions — no classes wrapping Spark, no custom IR — so Catalyst keeps
full visibility for pushdown, pruning, broadcast and AQE.
"""

from travel_data_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
