"""Connected components over candidate-pair edges — the clustering
step that turns pairwise near-duplicate evidence into dedup groups
(pair lists alone cannot drive a keep/drop decision once clusters have
more than two members).

Spark-first design: min-label propagation on the (tiny) post-LSH edge
set. Each iteration is one shuffle (join + groupBy-min); the loop runs
until a fixpoint, bounded by the largest cluster's diameter — for dedup
clusters that is single digits, not O(corpus). Lineage is cut per
iteration with ``localCheckpoint`` so the plan does not grow unboundedly
(the per-iteration convergence count is a driver action on a relation
of cluster-member size, NOT a corpus scan).

At extreme scale (billions of edges) the textbook upgrade is the
large-star/small-star contraction of Kiveris et al., "Connected
Components in MapReduce and Beyond" (SoCC'14), which converges in
O(log n) rounds independent of diameter; the propagation loop below
keeps the same dataframe contract, so swapping the step function is a
contained change.

Reference parity note: the travel reference has no graph operator —
this extends the dedup family (SURVEY.md §2.10) the same way its
processors chain cleaning steps (google_trends_processor.py pipelines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str = "doc_a",
                         dst: str = "doc_b", max_iter: int = 25) -> DataFrame:
    """Return ``(doc_id, component)`` for every vertex that appears in
    ``edges``, where ``component`` is the minimum doc_id reachable from
    the vertex (a deterministic canonical cluster id).

    The fixpoint is engine-independent, so a DuckDB recursive CTE
    computing min-reachable-id is an exact oracle regardless of how
    many propagation rounds either side needs.
    """
    sym = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
           .unionByName(
               edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))))
    labels = (sym.select(F.col("u").alias("id")).distinct()
              .withColumn("label", F.col("id")))
    for _ in range(max_iter):
        nbr_min = (sym.join(labels, sym["v"] == labels["id"])
                   .groupBy("u").agg(F.min("label").alias("nbr_label")))
        proposed = (labels.join(nbr_min, labels["id"] == nbr_min["u"], "left")
                    .select(F.col("id"),
                            F.col("label").alias("old_label"),
                            F.least(F.col("label"),
                                    F.coalesce(F.col("nbr_label"),
                                               F.col("label"))).alias("label")))
        # cut lineage: each round's output is materialized on executors,
        # so round k+1 plans against a leaf, not k stacked joins
        proposed = proposed.localCheckpoint(eager=True)
        changed = proposed.filter(F.col("label") < F.col("old_label")).count()
        labels = proposed.select("id", "label")
        if changed == 0:
            break
    return labels.select(F.col("id").alias("doc_id"),
                         F.col("label").alias("component"))


def canonical_map(corpus: DataFrame, components: DataFrame,
                  id_col: str = "doc_id") -> DataFrame:
    """Full-corpus keep/drop assignment: every doc maps to its cluster
    canonical (min id) or to itself when it has no near-duplicate."""
    comp = components.withColumnRenamed("doc_id", "_cc_id")
    # no broadcast hint: the duplicate-cluster membership is usually
    # small but CAN be a large corpus fraction (boilerplate-heavy web
    # data) — let AQE pick broadcast vs shuffle from its measured size
    return (corpus.select(id_col)
            .join(comp, F.col(id_col) == F.col("_cc_id"), "left")
            .select(F.col(id_col),
                    F.coalesce(F.col("component"), F.col(id_col))
                     .alias("keep_id"))
            .withColumn("is_duplicate",
                        (F.col(id_col) != F.col("keep_id")).cast("int")))
