"""Iterative graph computation: PageRank over the event-type transition
graph.

Demonstrates the driver-orchestrated iterative-join pattern (the engine
shape behind connected components in ``dedup.py::q_dedup_components``,
label propagation, and k-means in ``similarity.py::q_knn_ivf``): a loop of
DataFrame joins where each iteration's output feeds the next, with the
fixed iteration count known up front so the whole computation is one lazy
plan — Catalyst sees all 10 steps and pipelines them.

Scale notes: the rank vector is |nodes| rows and the edge list |types|²,
so every join here broadcasts; on a billion-node graph the identical loop
shape runs with shuffle hash joins instead — the code does not change,
only Catalyst's physical pick. ``localCheckpoint()`` every
PR_CHECKPOINT_EVERY rounds truncates lineage, so plan depth is bounded by
the checkpoint interval no matter the iteration count (verified in
tests/test_iterative_lineage.py) while Catalyst still pipelines the
rounds inside each interval.

The oracle unrolls the same power iteration as chained CTEs (standard SQL
forbids aggregation inside a recursive CTE member, so unrolling is the
portable formulation). Both engines fold contributions in deterministic
per-node sums of ≤|types| doubles; ROUND(…,6) absorbs ulp-order effects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..engine import load_tables

PR_ITERATIONS = 10
PR_DAMPING = 0.85
PR_CHECKPOINT_EVERY = 5  # lineage-truncation interval (bounds plan depth)


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted edge list: P(to | from) over the SHARED transition-pair
    definition (governance.transition_counts) — one source of truth for
    what a "transition" is across the matrix and PageRank operators."""
    from pyspark.sql import Window as W

    from .governance import transition_counts

    pairs = transition_counts(spark, sf_dir)
    w_from = F.sum("n_transitions").over(W.partitionBy("from_type"))
    return pairs.select(
        "from_type",
        "to_type",
        (F.col("n_transitions") / w_from).alias("p"),
    )


def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (10 fixed power iterations, damping 0.85) over event types.

    rank_{t+1}(i) = (1-d)/N + d·Σ_j P(j→i)·rank_t(j). The node count is
    collected once (|event types| rows — a metadata-scale collect, not a
    data collect); each iteration is a broadcast join + aggregation, and
    lineage is truncated every PR_CHECKPOINT_EVERY rounds so the plan
    never grows with iteration count.
    """
    return _pagerank(spark, sf_dir, PR_ITERATIONS)


def _pagerank(spark: SparkSession, sf_dir: str, iterations: int) -> DataFrame:
    edges = _edges(spark, sf_dir).cache()
    nodes = edges.select(F.col("from_type").alias("node")).union(
        edges.select("to_type")
    ).distinct().cache()
    n = nodes.count()
    base = (1.0 - PR_DAMPING) / n

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for it in range(iterations):
        contribs = (
            edges.join(
                F.broadcast(ranks), edges.from_type == ranks.node
            )
            .groupBy(F.col("to_type").alias("node2"))
            .agg(F.sum(F.col("p") * F.col("rank")).alias("inflow"))
        )
        ranks = (
            nodes.join(
                F.broadcast(contribs), nodes.node == F.col("node2"), "left"
            )
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(PR_DAMPING) * F.coalesce("inflow", F.lit(0.0))
                ).alias("rank"),
            )
        )
        if (it + 1) % PR_CHECKPOINT_EVERY == 0 and (it + 1) < iterations:
            ranks = ranks.localCheckpoint()
    return ranks.select(
        "node", F.round("rank", 6).alias("pagerank")
    ).orderBy("node")


def _oracle_pagerank() -> str:
    base = f"(1.0 - {PR_DAMPING}) / (SELECT n FROM nn)"
    steps = []
    for i in range(1, PR_ITERATIONS + 1):
        steps.append(
            f"""r{i} AS (
    SELECT n2.node,
           {base} + {PR_DAMPING} * COALESCE(SUM(e.p * r.rank), 0.0) AS rank
    FROM nodes n2
    LEFT JOIN edges e ON e.to_type = n2.node
    LEFT JOIN r{i - 1} r ON r.node = e.from_type
    GROUP BY n2.node
)"""
        )
    return f"""
WITH pairs AS (
    SELECT from_type, to_type, COUNT(*) AS n
    FROM (
        SELECT event_type AS from_type,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS to_type
        FROM events
    )
    WHERE to_type IS NOT NULL
    GROUP BY from_type, to_type
),
edges AS (
    SELECT from_type, to_type,
           CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY from_type) AS p
    FROM pairs
),
nodes AS (
    SELECT DISTINCT from_type AS node FROM pairs
    UNION
    SELECT DISTINCT to_type FROM pairs
),
nn AS (SELECT COUNT(*) AS n FROM nodes),
r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes),
{','.join(steps)}
SELECT node, ROUND(rank, 6) AS pagerank
FROM r{PR_ITERATIONS}
ORDER BY node
"""


TRIANGLE_MIN_SUPPORT = 2  # co-purchase edge threshold


def q_graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed triangle counting over the part co-purchase graph
    (parts bought together in ≥ TRIANGLE_MIN_SUPPORT orders form an
    edge). Edges are oriented u < v so each triangle {i<j<k} is produced
    by exactly one join path (i→j)⋈(j→k)⋈(i→k) — two hash equi-joins, no
    post-dedup, the standard DataFrame formulation of the MapReduce
    triangle-enumeration algorithm. Per-join fan-out is bounded by node
    degree; at web scale the same query first re-orients edges
    low-degree→high-degree, which caps the join key's fan-out at
    O(sqrt(|E|)) — the degree-ordering refinement, noted here because the
    co-purchase graph is near-uniform and doesn't need it. Output is a
    1-row summary (nodes, edges, triangles) so the value hash is
    meaningful even when the triangle count is small.
    """
    li = (
        load_tables(spark, sf_dir)["lineitem"]
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.toDF("okey", "pa")
    b = li.toDF("okey", "pb")
    edges = (
        a.join(b, "okey")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= TRIANGLE_MIN_SUPPORT)
        .select(F.col("pa").alias("u"), F.col("pb").alias("v"))
        .cache()
    )
    e1 = edges.toDF("i", "j")
    e2 = edges.toDF("j", "k")
    e3 = edges.toDF("i", "k")
    triangles = e1.join(e2, "j").join(e3, ["i", "k"])
    nodes = edges.select(F.col("u").alias("n")).union(edges.select("v")).distinct()
    return (
        nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
        .crossJoin(edges.agg(F.count(F.lit(1)).alias("n_edges")))
        .crossJoin(triangles.agg(F.count(F.lit(1)).alias("n_triangles")))
    )


ORACLE_GRAPH_TRIANGLE_COUNT = f"""
WITH items AS (
    SELECT DISTINCT l_orderkey AS okey, l_partkey FROM lineitem
),
edges AS (
    SELECT a.l_partkey AS u, b.l_partkey AS v
    FROM items a JOIN items b ON a.okey = b.okey AND a.l_partkey < b.l_partkey
    GROUP BY u, v
    HAVING COUNT(*) >= {TRIANGLE_MIN_SUPPORT}
),
nodes AS (SELECT u AS n FROM edges UNION SELECT v FROM edges)
SELECT (SELECT COUNT(*) FROM nodes) AS n_nodes,
       (SELECT COUNT(*) FROM edges) AS n_edges,
       (SELECT COUNT(*) FROM edges e1
        JOIN edges e2 ON e2.u = e1.v
        JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v) AS n_triangles
"""


LINK_PRED_TOP_K = 50


def q_graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor link prediction over the part co-purchase graph:
    for every NON-edge pair sharing at least one neighbor, the Jaccard
    score |N(a)∩N(b)| / |N(a)∪N(b)| — the classic "customers also
    bought" / recommender-candidate generator, and the feature-prep
    step of graph-ML pipelines. Top LINK_PRED_TOP_K pairs by score.

    Shape: the same wedge join as triangle counting (candidate pairs =
    paths of length 2, per-join fan-out bounded by node degree; at web
    scale re-orient edges low-degree→high-degree first), one anti-join
    removes existing edges, degree lookups are |nodes|-sized joins, and
    the top-k is TakeOrdered — distributed, no global window. The score
    is one IEEE division of exact integers (cn / (deg_a+deg_b−cn)),
    bit-identical on both engines; ties at the cut break on (a, b).
    """
    li = (
        load_tables(spark, sf_dir)["lineitem"]
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    ia = li.toDF("okey", "pa")
    ib = li.toDF("okey", "pb")
    edges = (
        ia.join(ib, "okey")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= TRIANGLE_MIN_SUPPORT)
        .select(F.col("pa").alias("u"), F.col("pb").alias("v"))
        .cache()
    )
    und = edges.union(edges.select(F.col("v"), F.col("u"))).toDF("node", "nbr")
    deg = und.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    cand = (
        und.toDF("a", "n")
        .join(und.toDF("b", "n2"), F.col("n") == F.col("n2"))
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cn"))
        .join(edges, (F.col("a") == F.col("u")) & (F.col("b") == F.col("v")),
              "left_anti")
    )
    scored = (
        cand.join(deg.toDF("a", "deg_a"), "a")
        .join(deg.toDF("b", "deg_b"), "b")
        .withColumn(
            "jaccard",
            F.col("cn").cast("double")
            / (F.col("deg_a") + F.col("deg_b") - F.col("cn")).cast("double"),
        )
    )
    return (
        scored.select("a", "b", "cn", "deg_a", "deg_b", "jaccard")
        .orderBy(F.col("jaccard").desc(), "a", "b")
        .limit(LINK_PRED_TOP_K)
    )


ORACLE_GRAPH_LINK_PREDICTION = f"""
WITH items AS (
    SELECT DISTINCT l_orderkey AS okey, l_partkey FROM lineitem
),
edges AS (
    SELECT a.l_partkey AS u, b.l_partkey AS v
    FROM items a JOIN items b ON a.okey = b.okey AND a.l_partkey < b.l_partkey
    GROUP BY u, v
    HAVING COUNT(*) >= {TRIANGLE_MIN_SUPPORT}
),
und AS (
    SELECT u AS node, v AS nbr FROM edges
    UNION ALL
    SELECT v, u FROM edges
),
deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM und GROUP BY node),
cand AS (
    SELECT x.node AS a, y.node AS b, CAST(COUNT(*) AS BIGINT) AS cn
    FROM und x JOIN und y ON x.nbr = y.nbr AND x.node < y.node
    GROUP BY x.node, y.node
),
nonedge AS (
    SELECT c.* FROM cand c
    WHERE NOT EXISTS (
        SELECT 1 FROM edges e WHERE e.u = c.a AND e.v = c.b
    )
)
SELECT a, b, cn, da.deg AS deg_a, db.deg AS deg_b,
       CAST(cn AS DOUBLE) / CAST(da.deg + db.deg - cn AS DOUBLE) AS jaccard
FROM nonedge n
JOIN deg da ON da.node = n.a
JOIN deg db ON db.node = n.b
ORDER BY jaccard DESC, a, b
LIMIT {LINK_PRED_TOP_K}
"""


def q_graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the near-dup graph + a log-log power-law
    fit: P(degree) frequencies with regr_slope over (ln degree,
    ln count) — the first diagnostic of any graph's shape (a heavy tail
    means hub documents that chain whole clusters together, which is
    exactly what decides between pair-dropping and component-based
    dedup). Degrees from one groupBy over the undirected edge list;
    the distribution is ≤ max-degree rows, so the regression and the
    broadcast of its 1-row result are metadata-sized at any corpus
    scale.
    """
    from .dedup import q_dedup_simhash_pairs

    edges = q_dedup_simhash_pairs(spark, sf_dir).select("id_a", "id_b")
    deg = (
        edges.select(F.col("id_a").alias("node"))
        .union(edges.select("id_b"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    dist = deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))
    fit = dist.agg(
        F.round(
            F.regr_slope(F.log("n_nodes"), F.log("degree")), 4
        ).alias("loglog_slope")
    )
    return (
        dist.crossJoin(F.broadcast(fit))
        .select("degree", "n_nodes", "loglog_slope")
        .orderBy("degree")
    )


def _oracle_degree_distribution() -> str:
    from .dedup import _sql_simhash_pair_ctes

    return (
        _sql_simhash_pair_ctes()
        + """,
    deg AS (
        SELECT node, COUNT(*) AS degree FROM (
            SELECT id_a AS node FROM spairs
            UNION ALL
            SELECT id_b FROM spairs
        ) GROUP BY node
    ),
    dist AS (SELECT degree, COUNT(*) AS n_nodes FROM deg GROUP BY degree),
    fit AS (
        SELECT ROUND(regr_slope(LN(n_nodes), LN(degree)), 4) AS loglog_slope
        FROM dist
    )
    SELECT d.degree, d.n_nodes, f.loglog_slope
    FROM dist d CROSS JOIN fit f
    ORDER BY d.degree
    """
    )


def oracles() -> dict[str, tuple]:
    return {
        "graph_pagerank": (q_graph_pagerank, _oracle_pagerank()),
        "graph_triangle_count": (q_graph_triangle_count, ORACLE_GRAPH_TRIANGLE_COUNT),
        "graph_link_prediction": (
            q_graph_link_prediction,
            ORACLE_GRAPH_LINK_PREDICTION,
        ),
        "graph_degree_distribution": (
            q_graph_degree_distribution,
            _oracle_degree_distribution(),
        ),
    }
