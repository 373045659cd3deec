"""Quickstart — what a user of the reference runs after switching.

Replays the reference's three pipelines (exchange / trends / flights)
and the final attractiveness join on the inline fixtures, then the
training-data operators on the driver's documents/embeddings tables,
writing results as parquet tables.

Run: python examples/quickstart.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(sf_dir: str = "/root/testdata/sf0.01",
         out_dir: str = "/tmp/tdp-quickstart") -> None:
    from travel_data_pipeline_spark.plans.exchange import (
        exchange_scores,
        monthly_map_long,
    )
    from travel_data_pipeline_spark.plans.flights import flight_value_query
    from travel_data_pipeline_spark.plans.trends import trend_scores
    from travel_data_pipeline_spark.queries_domain import j9_attractiveness
    from travel_data_pipeline_spark.queries_northstar import (
        dedup_minhash_jaccard,
        embedding_cosine_topk,
        pipeline_training_data,
        text_quality_scores,
    )
    from travel_data_pipeline_spark.queries_curation import (
        dataset_card_stats,
        split_leakage_check,
    )
    from travel_data_pipeline_spark.queries_ops import (
        anomaly_prequential,
        record_linkage_blocked,
        referential_integrity_audit,
    )
    from travel_data_pipeline_spark.session import get_spark

    spark = get_spark("quickstart")
    spark.sparkContext.setLogLevel("ERROR")

    outputs = {
        "exchange_scores": exchange_scores(spark, sf_dir),
        "exchange_monthly": monthly_map_long(spark, sf_dir),
        "trend_scores": trend_scores(spark, sf_dir),
        "flight_value": flight_value_query(spark, sf_dir),
        "attractiveness": j9_attractiveness(spark, sf_dir),
        "near_duplicates": dedup_minhash_jaccard(spark, sf_dir),
        "doc_quality": text_quality_scores(spark, sf_dir),
        "similar_vectors": embedding_cosine_topk(spark, sf_dir),
        "curated_corpus": pipeline_training_data(spark, sf_dir),
        # round-4 operational/governance layer
        "entity_links": record_linkage_blocked(spark, sf_dir),
        "rate_anomalies": anomaly_prequential(spark, sf_dir),
        "dq_integrity": referential_integrity_audit(spark, sf_dir),
        "dataset_cards": dataset_card_stats(spark, sf_dir),
        "split_leaks": split_leakage_check(spark, sf_dir),
    }
    for name, df in outputs.items():
        path = os.path.join(out_dir, name)
        df.write.mode("overwrite").parquet(path)
        print(f"{name:>18}: {spark.read.parquet(path).count():>6} rows -> {path}")

    print("\nSample — destination attractiveness:")
    outputs["attractiveness"].orderBy("country_code_3").show(truncate=False)


if __name__ == "__main__":
    main(*sys.argv[1:3])
