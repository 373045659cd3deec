"""Connected components over candidate-pair edges — the clustering
step that turns pairwise near-duplicate evidence into dedup groups
(pair lists alone cannot drive a keep/drop decision once clusters have
more than two members).

Two interchangeable engines behind one contract (both return the exact
min-reachable-id labeling, so the DuckDB recursive-CTE oracle is exact
for either):

* ``propagation`` — min-label propagation; one shuffle per round,
  converges in O(diameter) rounds. Ideal for post-LSH dedup clusters
  (single-digit diameters), a liability on chain-shaped graphs.
* ``star`` — the alternating large-star/small-star contraction of
  Kiveris et al., "Connected Components in MapReduce and Beyond"
  (SoCC'14): each round contracts every vertex toward its
  neighborhood minimum, converging in O(log^2 n) rounds INDEPENDENT
  of graph diameter — the 100 TB / adversarial-graph path. Two
  shuffles per round (large + small star), so on tiny diameters the
  propagation loop is cheaper; ``auto`` picks by edge count.

Lineage is cut per round with ``localCheckpoint(eager=True)`` so round
k+1 plans against a materialized leaf, not k stacked joins; the
per-round convergence check is a count/checksum on the edge relation
(cluster-member sized, NOT a corpus scan).

Reference parity note: the travel reference has no graph operator —
this extends the dedup family (SURVEY.md §2.10) the same way its
processors chain cleaning steps (google_trends_processor.py pipelines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# auto: below this many candidate edges the O(diameter) propagation
# loop (1 shuffle/round, tiny relations) beats star's 2 shuffles/round
STAR_EDGE_THRESHOLD = 100_000


def _canon(edges: DataFrame) -> DataFrame:
    """Orient every edge (lo, hi) with lo < hi, drop self-loops, dedup."""
    return _orient(edges).distinct()


def _orient(edges: DataFrame) -> DataFrame:
    """Orientation half of ``_canon`` — no dedup shuffle. Safe wherever
    the consumer is duplicate-insensitive (min aggregates) and a later
    ``_canon`` restores set semantics (r14: drops one Exchange per
    star round)."""
    return (edges.select(F.least("u", "v").alias("u"),
                         F.greatest("u", "v").alias("v"))
            .filter(F.col("u") != F.col("v")))


def _symmetric(edges: DataFrame) -> DataFrame:
    return edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v")))


def _large_star(edges: DataFrame) -> DataFrame:
    """For each vertex u emit (v, m) for every neighbor v > u, where
    m = min(N(u) + {u}): strictly-larger neighbors hook onto the
    neighborhood minimum."""
    sym = _symmetric(edges)
    mins = (sym.groupBy("u").agg(F.min("v").alias("mn"))
            .select("u", F.least("u", "mn").alias("m")))
    # _orient, not _canon (r14): _small_star's min aggregates are
    # duplicate-insensitive and its round-end _canon restores set
    # semantics, so the mid-round dedup Exchange is pure overhead.
    return _orient(sym.filter(F.col("v") > F.col("u"))
                   .join(mins, "u")
                   .select(F.col("v").alias("u"), F.col("m").alias("v")))


def _small_star(edges: DataFrame) -> DataFrame:
    """For each vertex hi with smaller neighbors N-(hi) emit
    (v, min(N-(hi))) for v in N-(hi) + {hi}: every vertex and its
    smaller neighbors collapse onto the smallest of them."""
    # _canon orientation is (u=lo, v=hi); process per hi
    mins = edges.groupBy("v").agg(F.min("u").alias("m"))
    to_lo = (edges.join(mins, "v")
             .select(F.col("u"), F.col("m").alias("v")))
    to_hi = mins.select(F.col("v").alias("u"), F.col("m").alias("v"))
    return _canon(to_lo.unionByName(to_hi))


def _edge_signature(edges: DataFrame) -> tuple:
    row = edges.agg(F.count(F.lit(1)).alias("n"),
                    F.expr("bit_xor(xxhash64(u, v))").alias("h")).first()
    return (row["n"], row["h"])


def _labels_from_stars(stars: DataFrame, vertices: DataFrame) -> DataFrame:
    """At the alternating fixpoint each component is a star centered at
    its minimum vertex; a vertex's label is min(self, neighbors)."""
    sym = _symmetric(stars)
    labels = (sym.groupBy("u").agg(F.min("v").alias("mn"))
              .select("u", F.least("u", "mn").alias("label")))
    return (vertices.join(labels, vertices["id"] == labels["u"], "left")
            .select(F.col("id").alias("doc_id"),
                    F.coalesce(F.col("label"), F.col("id"))
                     .alias("component")))


def connected_components_star(edges: DataFrame, src: str = "doc_a",
                              dst: str = "doc_b",
                              max_iter: int = 25) -> DataFrame:
    """Large-star/small-star contraction (Kiveris et al. SoCC'14).

    Converges in O(log^2 n) alternating rounds regardless of diameter:
    a 10^6-vertex chain needs ~20 rounds here vs 10^6 for propagation.
    Each round is two shuffles keyed on vertex id; the convergence
    detector is a (count, checksum) aggregate of the contracted edge
    relation, which shrinks toward one-edge-per-non-center-vertex.
    """
    # checkpoint the canonical edge relation FIRST, then derive the
    # vertex set from the materialized leaf: the old order computed the
    # full upstream lineage (for the dedup queries: the whole
    # LSH+Jaccard-verify pipeline) TWICE — once into the vertices
    # checkpoint, once into the work checkpoint (r14 measured fix).
    work = _canon(edges.select(F.col(src).alias("u"),
                               F.col(dst).alias("v")))
    work = work.localCheckpoint(eager=True)
    vertices = (work.select(F.col("u").alias("id"))
                .unionByName(work.select(F.col("v").alias("id")))
                .distinct()
                .localCheckpoint(eager=True))
    sig = _edge_signature(work)
    for _ in range(max_iter):
        work = _small_star(_large_star(work)).localCheckpoint(eager=True)
        new_sig = _edge_signature(work)
        if new_sig == sig:
            break
        sig = new_sig
    return _labels_from_stars(work, vertices)


def connected_components_propagation(edges: DataFrame, src: str = "doc_a",
                                     dst: str = "doc_b",
                                     max_iter: int = 25) -> DataFrame:
    """Min-label propagation: O(diameter) rounds, one shuffle each."""
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


def connected_components(edges: DataFrame, src: str = "doc_a",
                         dst: str = "doc_b", max_iter: int = 25,
                         algorithm: str = "auto") -> DataFrame:
    """Return ``(doc_id, component)`` for every vertex that appears in
    ``edges``, where ``component`` is the minimum doc_id reachable from
    the vertex (a deterministic canonical cluster id).

    ``algorithm``: ``"propagation"`` (O(diameter) rounds),
    ``"star"`` (O(log^2 n) rounds, diameter-proof), or ``"auto"``
    (propagation below STAR_EDGE_THRESHOLD edges, star above — the
    count is against the already-computed candidate-pair relation).

    The fixpoint is engine-independent, so a DuckDB recursive CTE
    computing min-reachable-id is an exact oracle regardless of the
    engine or round count.
    """
    if algorithm == "auto":
        # materialize the (post-LSH, cluster-sized) edge relation once so
        # the sizing count and the chosen loop share one computation
        edges = edges.localCheckpoint(eager=True)
        algorithm = ("propagation" if edges.count() < STAR_EDGE_THRESHOLD
                     else "star")
    if algorithm == "star":
        return connected_components_star(edges, src, dst, max_iter)
    if algorithm == "propagation":
        return connected_components_propagation(edges, src, dst, max_iter)
    raise ValueError(f"unknown algorithm: {algorithm!r}")


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


# ---------------------------------------------------------------------------
# Iterative BFS (Pregel frontier shape) — VERDICT r05 #4: the general
# form of queries_round6.copurchase_bfs_hops' unrolled 3-hop loop.
# ---------------------------------------------------------------------------

def bfs_hops(edges: DataFrame, source: DataFrame,
             max_hops: int | None = None,
             checkpoint_every: int = 5) -> DataFrame:
    """Minimum hop distance from ``source`` vertices over directed
    ``edges(s, d)``; returns (vertex, hop).

    Iterates frontier joins until the frontier empties (convergence —
    one ``isEmpty`` action per hop, the connected_components_star
    discipline) or ``max_hops`` is reached; ``None`` runs to
    convergence, bounded by the graph diameter. Every frontier is
    eagerly localCheckpointed (it feeds both the next join and the
    anti-join filter), and the accumulated ``reached`` union is
    re-checkpointed every ``checkpoint_every`` hops so lineage stays
    O(checkpoint_every), not O(diameter).

    Scale shape per hop: one frontier-edges join + one min-hop
    aggregate + one anti-join, all keyed on the vertex — the BFS
    invariant (first visit = min hop) keeps the frontier a set, so no
    hop re-expands settled vertices. ``source`` rows must carry
    (vertex, hop) with hop = 0.
    """
    reached = source.localCheckpoint(eager=True)
    frontier = reached
    hop = 0
    while max_hops is None or hop < max_hops:
        step = (frontier.join(edges, frontier.vertex == edges.s)
                .select(F.col("d").alias("vertex"),
                        (F.col("hop") + 1).alias("hop")))
        new = (step.join(reached.select("vertex"), "vertex", "left_anti")
               .groupBy("vertex").agg(F.min("hop").alias("hop"))
               .localCheckpoint(eager=True))
        if new.isEmpty():
            break
        reached = reached.unionByName(new)
        frontier = new
        hop += 1
        if hop % checkpoint_every == 0:
            reached = reached.localCheckpoint(eager=True)
    return reached
