"""Iterative graph algorithm over the near-dup candidate graph: connected
components by min-label propagation.

The dedup pipeline's natural last step: near-dup PAIRS (dedup.py) become
duplicate CLUSTERS by computing connected components, then keeping one
canonical doc per component. SQL cannot express the transitive closure in
one pass — this is the engine's iterative-algorithm surface: a driver-side
loop over DataFrame steps, each iteration one shuffle, state carried in a
localCheckpoint'd frame (truncated lineage keeps plan size constant).
Convergence needs at most diameter(G) rounds — for near-dup graphs that is
tiny (dup clusters are dense); a 1000-executor run behaves identically
because each round is plain join+groupBy.

The DuckDB oracle computes the same components with a recursive CTE, so
even the iterative op is value-checked exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgcp_spark.functions.dedup import CAPPED_PAIRS_CTE, capped_jaccard_pairs
from pgcp_spark.plans.materialize import materialize, materialize_loop
from pgcp_spark.registry import register

# The edge source is the PRODUCTION df-capped pair generator (shingles with
# document frequency > HOT_SHINGLE_DF_CAP dropped before the self-join) —
# the same CTE dedup_jaccard_hot_shingle_capped proves against its Spark
# twin, re-exported so the graph oracles stay provably identical to it.
# The UNCAPPED generator (exact_jaccard_pairs, unregistered since round 5)
# grows candidate pairs
# quadratically per hot shingle under heavy duplication and exists only as
# MinHash's exactness oracle; wiring it here was the one scale anti-pattern
# flagged in round 3 (graph family excluded from the sf1 sweep).
_PAIRS_CTE = CAPPED_PAIRS_CTE


def _dup_edges(spark: SparkSession, sf_dir: str, pairs_fn=None) -> DataFrame:
    """Symmetric, deduped (s, d) edge frame from a near-dup pair generator.

    ``pairs_fn`` defaults to the df-capped Jaccard generator; any source
    with the (doc_a, doc_b) interface slots in (MinHash candidates at
    corpus scale). localCheckpoint'd: every fixpoint iteration re-reads the
    edges, and truncated lineage keeps each round's plan constant-size.
    """
    pairs = (pairs_fn or capped_jaccard_pairs)(spark, sf_dir).select("doc_a", "doc_b")
    return (
        pairs.select(F.col("doc_a").alias("s"), F.col("doc_b").alias("d"))
        .union(pairs.select(F.col("doc_b").alias("s"), F.col("doc_a").alias("d")))
        .distinct()
        .transform(materialize)
    )


def connected_labels(edges: DataFrame) -> DataFrame:
    """Min-label propagation to fixpoint over a symmetric edge frame
    (s, d) → (node, label). Each iteration is one join + one aggregate;
    state is localCheckpoint'd so the plan stays constant-size."""
    labels = (
        edges.select("s").distinct().select(F.col("s").alias("node"), F.col("s").alias("label"))
    ).transform(materialize)
    while True:
        neigh_min = (
            edges.join(labels, edges.d == labels.node)
            .groupBy("s")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neigh_min, labels.node == neigh_min.s, "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias(
                    "label"
                ),
            )
            .transform(materialize_loop)  # loop state: MUST truncate lineage
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels


@register(
    "graph_connected_dup_clusters",
    oracle=f"""
WITH RECURSIVE {_PAIRS_CTE},
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
reach(s, d) AS (
  SELECT s, s FROM (SELECT DISTINCT s FROM edges)
  UNION
  SELECT e.s, r.d FROM edges e JOIN reach r ON r.s = e.d
)
SELECT CAST(MIN(d) AS BIGINT) AS cluster_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MAX(s) AS BIGINT) AS max_doc
FROM (SELECT s, MIN(d) AS d FROM reach GROUP BY s)
GROUP BY d
ORDER BY cluster_id
""",
)
def graph_connected_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the ≥0.3-Jaccard near-dup graph (df-capped
    production edge source) by min-label propagation (iterate: label ←
    min(label, neighbors' labels) until fixpoint), then per-cluster stats.

    Each iteration: edges ⋈ labels → per-node neighbor minimum → join back
    → new labels (one shuffle pair); the frame is localCheckpoint'd so
    lineage doesn't grow with iterations. Convergence is checked with a
    cheap count of changed labels.
    """
    labels = connected_labels(_dup_edges(spark, sf_dir))

    return (
        labels.groupBy("label")
        .agg(F.count("*").alias("n_docs"), F.max("node").alias("max_doc"))
        .select(F.col("label").alias("cluster_id"), "n_docs", "max_doc")
        .orderBy("cluster_id")
    )


PR_DAMPING = 0.85
PR_ITERS = 10


@register(
    "graph_pagerank_dup_docs",
    oracle=f"""
WITH RECURSIVE {_PAIRS_CTE},
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
nodes AS (SELECT DISTINCT s AS node FROM edges),
deg AS (SELECT s AS node, COUNT(*) AS out_deg FROM edges GROUP BY 1),
n AS (SELECT COUNT(*) AS n_nodes FROM nodes),
pr(iter, node, rank) AS (
  SELECT 0, node, 1.0 / (SELECT n_nodes FROM n) FROM nodes
  UNION ALL
  SELECT iter + 1, node,
         (1 - {PR_DAMPING}) / (SELECT n_nodes FROM n) + {PR_DAMPING} * contrib
  FROM (
    SELECT p.iter AS iter, e.d AS node, SUM(p.rank / dg.out_deg) AS contrib
    FROM pr p
    JOIN edges e ON e.s = p.node
    JOIN deg dg ON dg.node = p.node
    WHERE p.iter < {PR_ITERS}
    GROUP BY 1, 2
  ) t
)
SELECT CAST(p.node AS BIGINT) AS doc_id,
       ROUND(p.rank, 6) AS pagerank,
       CAST(dg.out_deg AS BIGINT) AS degree
FROM pr p JOIN deg dg ON dg.node = p.node
WHERE p.iter = {PR_ITERS}
ORDER BY doc_id
""",
)
def graph_pagerank_dup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, {10} fixed iterations) over the symmetric
    ≥0.3-Jaccard near-dup graph — ranks the most-connected documents in a
    duplicate neighborhood (the doc to KEEP when collapsing a cluster).

    Same iterative discipline as connected components: each iteration is
    one join + one aggregate keyed on the node id, state localCheckpoint'd
    so the plan stays constant-size; a fixed iteration count (not a
    convergence test) keeps the result engine-reproducible. The graph is
    symmetric, so there are no dangling nodes and in-degree = out-degree.
    Ranks are rounded to 1e-6 on both sides: float contributions sum in
    engine-specific order, and ~1e-15 accumulated difference is legitimate.
    """
    edges = _dup_edges(spark, sf_dir)
    deg = edges.groupBy("s").agg(F.count("*").alias("out_deg"))
    nodes = edges.select(F.col("s").alias("node")).distinct()
    n_nodes = nodes.count()
    if n_nodes == 0:
        # no near-dup edges (e.g. an empty or all-unique corpus): the rank
        # seed 1/n is undefined, and the fixpoint loop has nothing to do
        return spark.createDataFrame([], "doc_id long, pagerank double, degree long")

    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank")).transform(materialize)
    weighted = edges.join(deg, "s").transform(materialize)  # (s, d, out_deg)
    for _ in range(PR_ITERS):
        contribs = (
            weighted.join(ranks, weighted.s == ranks.node)
            .select("d", (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("d")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            nodes.join(contribs, nodes.node == contribs.d, "left")
            .select(
                "node",
                (
                    F.lit((1 - PR_DAMPING) / n_nodes)
                    + PR_DAMPING * F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("rank"),
            )
            .transform(materialize_loop)  # loop state: MUST truncate lineage
        )

    return (
        ranks.join(deg, ranks.node == deg.s)
        .select(
            F.col("node").cast("long").alias("doc_id"),
            F.round("rank", 6).alias("pagerank"),
            F.col("out_deg").cast("long").alias("degree"),
        )
        .orderBy("doc_id")
    )


@register(
    "dedup_cluster_canonical",
    oracle=f"""
WITH RECURSIVE {_PAIRS_CTE},
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
reach(s, d) AS (
  SELECT s, s FROM (SELECT DISTINCT s FROM edges)
  UNION
  SELECT e.s, r.d FROM edges e JOIN reach r ON r.s = e.d
),
labels AS (SELECT s AS node, MIN(d) AS label FROM reach GROUP BY s),
clustered AS (
  SELECT doc.doc_id, CAST(COALESCE(l.label, doc.doc_id) AS BIGINT) AS cluster_id,
         doc.n_chars
  FROM documents doc LEFT JOIN labels l ON doc.doc_id = l.node
)
SELECT doc_id, cluster_id,
       CAST(FIRST_VALUE(doc_id) OVER w AS BIGINT) AS canonical_doc,
       doc_id = FIRST_VALUE(doc_id) OVER w AS is_kept
FROM clustered
WINDOW w AS (PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY doc_id
""",
)
def dedup_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE production dedup decision: every document mapped to its
    near-dup cluster (connected components of the ≥0.3-Jaccard graph;
    singletons cluster with themselves) with one canonical survivor per
    cluster — longest document wins, doc_id breaks ties — and an is_kept
    verdict. This composes the pair generator (dedup.py), the component
    labeller (connected_labels), and a keep-rule into the drop-list a
    training pipeline actually applies.

    Scale: the iterative labelling touches only documents that appear in
    a pair (dup clusters are sparse in a real corpus); the full corpus
    joins in once at the end (left join on doc_id) and the canonical
    election is a per-cluster window — cluster-sized partitions, not
    corpus-sized. The edge source is the df-capped production generator
    (a hot-shingle cap bounds every bucket's pairwise work); the MinHash
    candidates slot into the same (doc_a, doc_b) interface at corpus
    scale, and the labeller and election are unchanged either way.
    """
    from pyspark.sql import Window

    from pgcp_spark.sources import load_table

    labels = connected_labels(_dup_edges(spark, sf_dir))
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    clustered = d.join(labels, d.doc_id == labels.node, "left").select(
        "doc_id",
        F.coalesce(F.col("label"), F.col("doc_id")).cast("long").alias("cluster_id"),
        "n_chars",
    )
    w = (
        Window.partitionBy("cluster_id")
        .orderBy(F.desc("n_chars"), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    canonical = F.first("doc_id").over(w)
    return (
        clustered.select(
            "doc_id",
            "cluster_id",
            canonical.cast("long").alias("canonical_doc"),
            (F.col("doc_id") == canonical).alias("is_kept"),
        )
        .orderBy("doc_id")
    )
