"""Graph analytics over the near-duplicate similarity graph: PageRank.

Extends the §2.4 dedup surface (SURVEY.md): connected components answer
"which docs are the same"; PageRank over the same Jaccard edge set ranks
docs by how central they are inside a duplicate family — the canonical-
representative picker for crawl mirrors and template clusters (keep the
hub, drop the satellites).

Integer-exact formulation: ranks live in BIGINT micro-units and every
per-edge contribution is an integer floor division, so two engines
replay the iterations bit-for-bit — the same determinism discipline as
the decimal-exact k-means oracle (operators/similarity.py).

Scale design: each iteration is (edges ⋈ ranks on src) → groupBy dst —
two keyed shuffles on the edge relation, no driver data, no lineage
growth past the bounded unrolled iteration count. At 100 TB the edge
set is bucketed by src so the per-iteration join co-locates; the rank
side is the only thing that moves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import Catalog
from .dedup import _jaccard_edges

N_ITERATIONS = 2
DAMPING_PCT = 85            # d = 0.85, held as an integer percentage
INIT_RANK_MICRO = 1_000_000  # rank 1.0 in micro-units
BASE_RANK_MICRO = 150_000    # (1 - d) in micro-units


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (2 unrolled iterations, integer micro-unit arithmetic)
    over the symmetric Jaccard≥0.5 edge graph.

    Every node in the edge set has out-degree ≥ 1 (edges are symmetric),
    so there is no dangling-mass term; floor division loses mass
    deterministically, which both engines reproduce exactly.
    """
    edges = _jaccard_edges(spark, sf_dir).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ranks = deg.select(
        F.col("src").alias("node"), F.lit(INIT_RANK_MICRO).cast("bigint").alias("r")
    )
    for _ in range(N_ITERATIONS):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr(f"(r * {DAMPING_PCT}) div ({100} * deg)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        ranks = (
            deg.select(F.col("src").alias("node"))
            .join(contrib, "node", "left")
            .select(
                "node",
                (F.lit(BASE_RANK_MICRO) + F.coalesce(F.col("c"), F.lit(0)))
                .cast("bigint")
                .alias("r"),
            )
        )
    return (
        ranks.join(deg, ranks.node == deg.src)
        .select(
            F.col("node").alias("doc_id"),
            F.col("r").alias("rank_micro"),
            F.col("deg").cast("int").alias("degree"),
        )
    )


# Oracle: identical edge derivation to DEDUP_CONNECTED_COMPONENTS_SQL
# (dedup.py), then the two iterations unrolled with the same integer
# floor divisions.
GRAPH_PAGERANK_SQL = f"""
WITH
w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS MATERIALIZED (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, unnest(list_transform(generate_series(1, len(w)-1),
                          i -> w[i] || ' ' || w[i+1])) AS shingle
    FROM w WHERE len(w) >= 2)
),
sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS MATERIALIZED (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b USING (shingle) WHERE a.doc_id < b.doc_id GROUP BY 1, 2
),
pairs AS MATERIALIZED (
  SELECT doc_a, doc_b FROM inter
  JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
  WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.5
),
edges AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
r0 AS (SELECT src AS node, CAST({INIT_RANK_MICRO} AS BIGINT) AS r FROM deg),
c1 AS (
  SELECT e.dst AS node, SUM((r.r * {DAMPING_PCT}) // (100 * d.deg)) AS c
  FROM edges e JOIN r0 r ON r.node = e.src JOIN deg d ON d.src = e.src
  GROUP BY e.dst
),
r1 AS (
  SELECT d.src AS node,
         CAST({BASE_RANK_MICRO} + COALESCE(c1.c, 0) AS BIGINT) AS r
  FROM deg d LEFT JOIN c1 ON c1.node = d.src
),
c2 AS (
  SELECT e.dst AS node, SUM((r.r * {DAMPING_PCT}) // (100 * d.deg)) AS c
  FROM edges e JOIN r1 r ON r.node = e.src JOIN deg d ON d.src = e.src
  GROUP BY e.dst
),
r2 AS (
  SELECT d.src AS node,
         CAST({BASE_RANK_MICRO} + COALESCE(c2.c, 0) AS BIGINT) AS r
  FROM deg d LEFT JOIN c2 ON c2.node = d.src
)
SELECT r2.node AS doc_id, r2.r AS rank_micro, CAST(deg.deg AS INT) AS degree
FROM r2 JOIN deg ON deg.src = r2.node
"""


BFS_SEED_MOD = 10   # seeds = edge-graph nodes with doc_id % 10 == 0
BFS_MAX_HOPS = 3    # bounded frontier expansion (graph diameter cap)


def graph_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS hop levels (§2.4 graph family): minimum hop
    distance from a deterministic seed set over the symmetric Jaccard
    edge graph, capped at BFS_MAX_HOPS — the reachability/blast-radius
    primitive (e.g. "everything within 3 similarity hops of a known-bad
    document").

    Iterative frontier expansion: each hop is ONE keyed join (frontier ⋈
    edges on src) plus an anti-join against the visited set — the
    standard Pregel step expressed relationally. The loop is bounded (no
    convergence probe needed), lineage stays shallow (≤3 rounds, no
    checkpoint required), and at 100 TB the edge relation is bucketed by
    src so only the (small) frontier moves per round.

    The oracle replays it as a DuckDB recursive CTE with UNION-dedup and
    the same hop cap, then takes MIN(level) per node.
    """
    edges = _jaccard_edges(spark, sf_dir).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    edges = edges.union(edges.select(F.col("dst"), F.col("src"))).distinct()
    nodes = edges.select(F.col("src").alias("node")).distinct()
    visited = nodes.filter(F.col("node") % BFS_SEED_MOD == 0).select(
        "node", F.lit(0).cast("int").alias("level")
    )
    frontier = visited.select("node")
    for hop in range(1, BFS_MAX_HOPS + 1):
        nxt = (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .select("node", F.lit(hop).cast("int").alias("level"))
        )
        visited = visited.union(nxt)
        frontier = nxt.select("node")
    return visited.select(F.col("node").alias("doc_id"), "level")


# Oracle: same edge derivation as GRAPH_PAGERANK_SQL, then a hop-capped
# recursive CTE; UNION (not UNION ALL) dedups (node, lvl) states so the
# recursion is bounded even inside cliques.
GRAPH_BFS_LEVELS_SQL = f"""
WITH RECURSIVE
w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS MATERIALIZED (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, unnest(list_transform(generate_series(1, len(w)-1),
                          i -> w[i] || ' ' || w[i+1])) AS shingle
    FROM w WHERE len(w) >= 2)
),
sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS MATERIALIZED (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b USING (shingle) WHERE a.doc_id < b.doc_id GROUP BY 1, 2
),
pairs AS MATERIALIZED (
  SELECT doc_a, doc_b FROM inter
  JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
  WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.5
),
edges AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
bfs(node, lvl) AS (
  SELECT DISTINCT src, 0 FROM edges WHERE src % {BFS_SEED_MOD} = 0
  UNION
  SELECT e.dst, b.lvl + 1
  FROM bfs b JOIN edges e ON e.src = b.node
  WHERE b.lvl < {BFS_MAX_HOPS}
)
SELECT node AS doc_id, CAST(MIN(lvl) AS INT) AS level
FROM bfs
GROUP BY node
"""


def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global triangle count + clustering coefficient over the Jaccard
    edge graph (§2.4 graph family): the cohesion probe for duplicate
    families — near-clique clusters (template farms) triangle densely,
    chains (drifting revisions) don't.

    Canonical-orientation join: triangles are enumerated ONLY as
    a < b < c (each counted once), so the self-join fans out on ordered
    edges — the standard compact-forward trick that keeps the join's
    per-key fan-in at the out-degree of the ordered graph, not the full
    degree. Two keyed equi-joins on the edge relation, one scalar agg;
    wedges come from the symmetric degree in one more keyed agg. At
    100 TB the ordered edge set is bucketed by its join key and the
    high-degree hubs are already halved by orientation (a hub's ordered
    out-degree excludes every smaller neighbor).

    Output pins integers plus the clustering coefficient = 3T/W as a
    decimal-rounded double (single division — identical IEEE tree both
    engines)."""
    sym = _jaccard_edges(spark, sf_dir).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    e = sym.filter(F.col("src") < F.col("dst"))  # canonical a<b, each edge once
    ab = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    bc = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    ac = e.select(F.col("src").alias("a2"), F.col("dst").alias("c2"))
    tri = (
        ab.join(bc, "b")
        .join(ac, (F.col("a") == F.col("a2")) & (F.col("c") == F.col("c2")))
        .groupBy()
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    wedges = (
        sym.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .groupBy()
        .agg(
            F.sum(F.expr("deg * (deg - 1) div 2")).alias("n_wedges"),
            F.count(F.lit(1)).alias("n_nodes"),
        )
    )
    return (
        tri.join(F.broadcast(wedges))
        .select(
            "n_triangles",
            "n_wedges",
            "n_nodes",
            (3 * F.col("n_triangles") / F.col("n_wedges"))
            .cast("decimal(18,6)")
            .cast("double")
            .alias("clustering_coeff"),
        )
    )


# Oracle: same edge CTE as GRAPH_PAGERANK_SQL; triangles via the ordered
# a<b<c double join; wedges from symmetric degrees.
GRAPH_TRIANGLE_COUNT_SQL = """
WITH
w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS MATERIALIZED (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, unnest(list_transform(generate_series(1, len(w)-1),
                          i -> w[i] || ' ' || w[i+1])) AS shingle
    FROM w WHERE len(w) >= 2)
),
sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS MATERIALIZED (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b USING (shingle) WHERE a.doc_id < b.doc_id GROUP BY 1, 2
),
pairs AS MATERIALIZED (
  SELECT doc_a, doc_b FROM inter
  JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
  WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.5
),
edges AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
e AS (SELECT src, dst FROM edges WHERE src < dst),
tri AS (
  SELECT COUNT(*) AS n_triangles
  FROM e ab JOIN e bc ON ab.dst = bc.src
            JOIN e ac ON ac.src = ab.src AND ac.dst = bc.dst
),
wedges AS (
  SELECT CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges,
         COUNT(*) AS n_nodes
  FROM (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src)
)
SELECT n_triangles, n_wedges, n_nodes,
       CAST(CAST(3 * n_triangles / n_wedges AS DECIMAL(18,6)) AS DOUBLE)
         AS clustering_coeff
FROM tri, wedges
"""


def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the Jaccard near-dup graph (§2.4 graph
    family — Newman's r): the Pearson correlation of endpoint degrees
    over all directed edges. Positive r = hubs link hubs (template-farm
    clusters fused together); negative r = hubs link leaves (one
    canonical page with many drifted copies) — tells a dedup operator
    which cleanup strategy the duplicate topology wants.

    Plan: degrees are one keyed agg over the shared (memoized) edge
    build; attaching both endpoint degrees is two keyed joins on the
    edge stream; the correlation comes from EXACT integer moment sums
    (degrees are ints — no decimal needed) folded in ONE
    map-side-combining pass, with the agg_stats_moments IEEE tree for
    the final doubles. Symmetric edge set ⇒ the two marginals coincide,
    which the oracle replicates by construction."""
    sym = _jaccard_edges(spark, sf_dir)
    deg = sym.groupBy("doc_a").agg(F.count(F.lit(1)).alias("deg")).select(
        F.col("doc_a").alias("node"), "deg"
    )
    da = deg.select(F.col("node").alias("doc_a"), F.col("deg").alias("dx"))
    db = deg.select(F.col("node").alias("doc_b"), F.col("deg").alias("dy"))
    e = sym.join(da, "doc_a").join(db, "doc_b")
    sums = e.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("dx").alias("sx"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum("dy").alias("sy"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
    )
    n = F.col("m").cast("double")
    sx = F.col("sx").cast("double")
    sxx = F.col("sxx").cast("double")
    sy = F.col("sy").cast("double")
    syy = F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    corr = (sxy - (sx * sy) / n) / (
        F.sqrt(sxx - (sx * sx) / n) * F.sqrt(syy - (sy * sy) / n)
    )
    nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    return (
        sums.crossJoin(F.broadcast(nodes))
        .select(
            F.col("m").alias("n_directed_edges"),
            "n_nodes",
            corr.cast("decimal(18,6)").cast("double").alias("assortativity"),
            (sx / n).cast("decimal(18,6)").cast("double").alias("mean_edge_degree"),
        )
    )


GRAPH_ASSORTATIVITY_SQL = """
WITH
w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS MATERIALIZED (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, unnest(list_transform(generate_series(1, len(w)-1),
                          i -> w[i] || ' ' || w[i+1])) AS shingle
    FROM w WHERE len(w) >= 2)
),
sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS MATERIALIZED (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b USING (shingle) WHERE a.doc_id < b.doc_id GROUP BY 1, 2
),
pairs AS MATERIALIZED (
  SELECT doc_a, doc_b FROM inter
  JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
  WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.5
),
edges AS MATERIALIZED (
  SELECT doc_a, doc_b FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
deg AS (SELECT doc_a AS node, COUNT(*) AS deg FROM edges GROUP BY 1),
joined AS (
  SELECT da.deg AS dx, db.deg AS dy
  FROM edges e JOIN deg da ON da.node = e.doc_a JOIN deg db ON db.node = e.doc_b
),
sums AS (
  SELECT COUNT(*) AS m,
         CAST(SUM(dx) AS BIGINT) AS sx, CAST(SUM(dx*dx) AS BIGINT) AS sxx,
         CAST(SUM(dy) AS BIGINT) AS sy, CAST(SUM(dy*dy) AS BIGINT) AS syy,
         CAST(SUM(dx*dy) AS BIGINT) AS sxy
  FROM joined
),
d AS (
  SELECT m, CAST(m AS DOUBLE) AS nd,
         CAST(sx AS DOUBLE) AS sxd, CAST(sxx AS DOUBLE) AS sxxd,
         CAST(sy AS DOUBLE) AS syd, CAST(syy AS DOUBLE) AS syyd,
         CAST(sxy AS DOUBLE) AS sxyd
  FROM sums
)
SELECT m AS n_directed_edges,
       (SELECT COUNT(*) FROM deg) AS n_nodes,
       CAST(CAST((sxyd - (sxd * syd) / nd)
                 / (SQRT(sxxd - (sxd * sxd) / nd) * SQRT(syyd - (syd * syd) / nd))
            AS DECIMAL(18,6)) AS DOUBLE) AS assortativity,
       CAST(CAST(sxd / nd AS DECIMAL(18,6)) AS DOUBLE) AS mean_edge_degree
FROM d
"""


# Shared oracle prelude: the Jaccard ≥ 0.5 symmetric edge set (same CTE
# chain as GRAPH_PAGERANK_SQL — exact word-bigram Jaccard, both
# directions). New graph oracles compose on top of this text.
_EDGE_SQL_CTE = """
w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS MATERIALIZED (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, unnest(list_transform(generate_series(1, len(w)-1),
                          i -> w[i] || ' ' || w[i+1])) AS shingle
    FROM w WHERE len(w) >= 2)
),
sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS MATERIALIZED (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b USING (shingle) WHERE a.doc_id < b.doc_id GROUP BY 1, 2
),
pairs AS MATERIALIZED (
  SELECT doc_a, doc_b FROM inter
  JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
  WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.5
),
edges AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
)"""


K_CORE_K = 2        # keep nodes with degree ≥ 2 (cycles, not pendant pairs)
K_CORE_ROUNDS = 4   # bounded peel rounds, unrolled identically in the oracle


def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (k={K_CORE_K}, {K_CORE_ROUNDS} peel rounds)
    of the Jaccard near-dup graph (§2.4 graph family): the density
    filter that separates tight template-farm clusters (every member has
    ≥ k near-dup siblings → survives peeling) from chains and pendant
    pairs (peeled away). Standard corpus-curation use: 2-core members
    are "boilerplate families" to collapse aggressively; peeled nodes
    are drift pairs to adjudicate individually.

    Plan: each peel round is one keyed degree agg + two semi-joins on
    the edge relation — all shuffles keyed on node id, no driver data.
    The round count is FIXED and unrolled in both engines (converged or
    not, the two sides compute the identical bounded iteration — the
    PageRank determinism discipline). Each round ``localCheckpoint``s
    the shrinking edge set: lineage would otherwise double per round
    (the CC-loop lesson, PLANS.md). At 100 TB the edge set is bucketed
    by src; rounds after the first touch only the surviving subgraph,
    which shrinks geometrically on real dup topologies."""
    edges = (
        _jaccard_edges(spark, sf_dir)
        .select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .localCheckpoint(eager=True)
    )
    for _ in range(K_CORE_ROUNDS):
        alive = (
            edges.groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= K_CORE_K)
            .select("src")
        )
        edges = (
            edges.join(alive, "src", "left_semi")
            .join(alive.select(F.col("src").alias("dst")), "dst", "left_semi")
            .localCheckpoint(eager=True)
        )
    return edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("core_deg")
    )


def _kcore_round_sql(r: int) -> str:
    return f"""
a{r} AS (SELECT src FROM e{r - 1} GROUP BY src HAVING COUNT(*) >= {K_CORE_K}),
e{r} AS (
  SELECT e.src, e.dst FROM e{r - 1} e
  WHERE e.src IN (SELECT src FROM a{r}) AND e.dst IN (SELECT src FROM a{r})
)"""


GRAPH_KCORE_SQL = f"""
WITH
{_EDGE_SQL_CTE},
e0 AS (SELECT src, dst FROM edges),
{",".join(_kcore_round_sql(r) for r in range(1, K_CORE_ROUNDS + 1))}
SELECT src AS node, COUNT(*) AS core_deg
FROM e{K_CORE_ROUNDS} GROUP BY src
"""


LINK_PRED_TOP_N = 20   # report the strongest predicted non-edges only
COPURCHASE_MIN_W = 2   # edge = parts co-ordered in >= 2 distinct orders


def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor link prediction (§2.4 graph family) over the part
    co-purchase graph (edge = two parts appearing in the same order in
    ≥ {COPURCHASE_MIN_W} distinct orders): for every NON-adjacent pair
    sharing neighbors, count shared co-purchase partners and score with
    the neighborhood Jaccard cn / (deg_a + deg_b − cn). The top-N are
    "products likely bought together that never were" — recommendation
    candidates. (The near-dup Jaccard graph is the wrong substrate here:
    its components are cliques, so every wedge is closed and link
    prediction is vacuously empty — verified at sf0.01.)

    Plan: the bipartite projection self-joins distinct (order, part)
    keyed on the ORDER key, so fan-out per key is bounded by order size
    (≤ 7 lineitems in TPC-H-shaped data) — never quadratic in parts; the
    wedge join keys on the shared endpoint with fan-in bounded by part
    degree; existing edges leave via a keyed LEFT ANTI join; only the
    final top-N passes the global rank window (per-partition top-N + one
    tiny merge at scale — the topk_orders pattern)."""
    li = (
        Catalog(spark, sf_dir)
        .table("lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, "k")
        .filter(F.col("pa") != F.col("pb"))
        .groupBy(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= COPURCHASE_MIN_W)
        .select("src", "dst")
        .persist()
    )
    ab = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    bc = edges.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    cn = (
        ab.join(bc, "b")
        .filter(F.col("a") < F.col("c"))
        .groupBy("a", "c")
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    exist = edges.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("a"), F.col("dst").alias("c")
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    cand = (
        cn.join(exist, ["a", "c"], "left_anti")
        .join(deg.select(F.col("src").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("src").alias("c"), F.col("deg").alias("dc")), "c")
    )
    w = Window.orderBy(F.desc("cn"), F.asc("a"), F.asc("c"))
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= LINK_PRED_TOP_N)
        .select(
            F.col("a").alias("part_a"),
            F.col("c").alias("part_b"),
            "cn",
            F.col("da").cast("int").alias("deg_a"),
            F.col("dc").cast("int").alias("deg_b"),
            (F.col("cn") / (F.col("da") + F.col("dc") - F.col("cn")))
            .cast("decimal(18,6)")
            .cast("double")
            .alias("neighbor_jaccard"),
            "rank",
        )
    )


GRAPH_LINK_PREDICTION_SQL = f"""
WITH
li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS MATERIALIZED (
  SELECT a.l_partkey AS src, b.l_partkey AS dst
  FROM li a JOIN li b USING (l_orderkey)
  WHERE a.l_partkey <> b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= {COPURCHASE_MIN_W}
),
cn AS (
  SELECT ab.src AS a, bc.dst AS c, COUNT(*) AS cn
  FROM edges ab JOIN edges bc ON ab.dst = bc.src
  WHERE ab.src < bc.dst
  GROUP BY 1, 2
),
deg AS (SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY src),
cand AS (
  SELECT cn.a, cn.c, cn.cn, da.deg AS da, dc.deg AS dc
  FROM cn
  JOIN deg da ON da.node = cn.a
  JOIN deg dc ON dc.node = cn.c
  WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.src = cn.a AND e.dst = cn.c)
),
ranked AS (
  SELECT a, c, cn, da, dc,
         ROW_NUMBER() OVER (ORDER BY cn DESC, a ASC, c ASC) AS rank
  FROM cand
)
SELECT a AS part_a, c AS part_b, cn,
       CAST(da AS INT) AS deg_a, CAST(dc AS INT) AS deg_b,
       CAST(CAST(cn / (da + dc - cn) AS DECIMAL(18,6)) AS DOUBLE)
         AS neighbor_jaccard,
       CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {LINK_PRED_TOP_N}
"""


def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of two candidate partitions of the near-dup
    graph (§2.4 graph family): (a) the single-round STAR partition
    (label = min(self, neighbors) — what one-pass star dedup produces)
    and (b) the exact CONNECTED COMPONENTS. The gap is the operational
    signal: low star modularity with high component modularity means
    chains are being split and canonical assignment should pay for the
    iterative CC pass; near-equal scores mean the cheap one-round star
    is already capturing the community structure.

    Exact-integer formulation: with E the DIRECTED edge count,
    Q = Σ_c [e_c/E − (D_c/E)²] = (Σ_c e_c·E − D_c²) / E², so the
    numerator q_num is summed in BIGINT (e_c = directed edges inside c,
    D_c = total degree of c) and only the single closing division is a
    pinned double — nothing float ever folds.

    Plan per partition: labels attach to the edge list via two keyed
    joins, e_c and D_c are two map-side-combining aggs, and the closing
    scalar is a one-row agg. The component labels come from the shared
    label-propagation loop (bounded rounds, checkpoint-truncated); the
    star labels are ONE groupBy over the edge set."""
    from .dedup import _label_propagation

    sym = _jaccard_edges(spark, sf_dir)
    edges = sym.select(F.col("doc_a").alias("s"), F.col("doc_b").alias("t"))

    star = (
        edges.groupBy(F.col("s").alias("node"))
        .agg(F.min("t").alias("min_nbr"))
        .select("node", F.least(F.col("node"), F.col("min_nbr")).alias("c"))
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        comp = _label_propagation(spark, sym).select(
            F.col("doc_id").alias("node"), F.col("component_id").alias("c")
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    out = None
    for method, labels in (("star", star), ("components", comp)):
        ls = labels.select(F.col("node").alias("s"), F.col("c").alias("cs"))
        lt = labels.select(F.col("node").alias("t"), F.col("c").alias("ct"))
        tagged = edges.join(ls, "s").join(lt, "t")
        e_c = (
            tagged.filter(F.col("cs") == F.col("ct"))
            .groupBy(F.col("cs").alias("c"))
            .agg(F.count(F.lit(1)).alias("e_c"))
        )
        d_c = tagged.groupBy(F.col("cs").alias("c")).agg(
            F.count(F.lit(1)).alias("d_c")
        )
        tot = edges.agg(F.count(F.lit(1)).alias("m"))
        per_c = (
            d_c.join(e_c, "c", "left")
            .withColumn("e_c", F.coalesce(F.col("e_c"), F.lit(0)))
            .crossJoin(F.broadcast(tot))
        )
        row = per_c.agg(
            F.lit(method).alias("method"),
            F.count(F.lit(1)).alias("n_communities"),
            F.max("m").alias("n_directed_edges"),
            F.sum(
                F.col("e_c") * F.col("m") - F.col("d_c") * F.col("d_c")
            ).alias("q_num"),
        )
        out = row if out is None else out.unionByName(row)
    return out.select(
        "method",
        "n_communities",
        "n_directed_edges",
        "q_num",
        (
            F.col("q_num").cast("double")
            / (
                F.col("n_directed_edges").cast("double")
                * F.col("n_directed_edges").cast("double")
            )
        )
        .cast("decimal(18,6)")
        .cast("double")
        .alias("modularity"),
    )


def _modularity_tail_sql(method: str, labels_cte: str) -> str:
    return f"""
  SELECT '{method}' AS method,
         COUNT(*) AS n_communities,
         MAX(m) AS n_directed_edges,
         CAST(SUM(e_c * m - d_c * d_c) AS BIGINT) AS q_num
  FROM (
    SELECT d.c, d.d_c, COALESCE(e.e_c, 0) AS e_c, t.m
    FROM (SELECT ls.c, COUNT(*) AS d_c
          FROM edges JOIN {labels_cte} ls ON ls.node = edges.src
          GROUP BY ls.c) d
    LEFT JOIN (SELECT ls.c, COUNT(*) AS e_c
               FROM edges
               JOIN {labels_cte} ls ON ls.node = edges.src
               JOIN {labels_cte} lt ON lt.node = edges.dst
               WHERE ls.c = lt.c GROUP BY ls.c) e USING (c)
    CROSS JOIN (SELECT COUNT(*) AS m FROM edges) t
  )"""


GRAPH_MODULARITY_SQL = f"""
WITH RECURSIVE
{_EDGE_SQL_CTE},
star AS (
  SELECT src AS node, LEAST(src, MIN(dst)) AS c FROM edges GROUP BY src
),
reach(node, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.node = e.dst
),
comp AS (SELECT node, MIN(r) AS c FROM reach GROUP BY node),
q AS (
{_modularity_tail_sql("star", "star")}
  UNION ALL
{_modularity_tail_sql("components", "comp")}
)
SELECT method, n_communities, n_directed_edges, q_num,
       CAST(CAST(CAST(q_num AS DOUBLE)
                 / (CAST(n_directed_edges AS DOUBLE)
                    * CAST(n_directed_edges AS DOUBLE))
            AS DECIMAL(18,6)) AS DOUBLE) AS modularity
FROM q
"""


# ---------------------------------------------------------------------------
# Louvain: one greedy level over the near-dup graph
# ---------------------------------------------------------------------------


def graph_louvain_one_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One greedy Louvain sweep (r6 verdict directive #8) over the
    memoized Jaccard edge stream, integer-micro modularity gain: from
    the singleton partition, every node simultaneously evaluates moving
    into each neighbor's community and takes the best strictly-positive
    gain — the synchronous first level every distributed Louvain
    (GraphX/Gelly implementations) runs, since sequential node visits
    don't scale.

    Exact arithmetic: with E the directed edge count, k_i node degrees,
    and singleton start, the gain of moving i into {j} is
    ΔQ·E² = 2·w(i,j)·E − 2·k_i·k_j with w(i,j)=1 on this simple graph —
    so the argmax over neighbors is min(k_j, j) (rarest-degree neighbor,
    id tie-break) and the move fires iff k_i·k_j < E. All decisions are
    BIGINT; no float enters until the final pinned modularity division.

    Output: the singleton baseline row and the post-sweep row
    (n_communities, n_moved, exact q_num, modularity) — the measured
    statement "one greedy level buys THIS much modularity".

    Plan: degrees are one keyed agg; gains ride the edge stream with two
    degree joins (AQE-broadcast at this size, keyed at corpus scale);
    the argmax is a struct-min groupBy; post-sweep modularity is the
    same two-agg pattern as ``graph_modularity``. No iteration, no
    driver state, no quadratic stage."""
    sym = _jaccard_edges(spark, sf_dir)
    edges = sym.select(F.col("doc_a").alias("s"), F.col("doc_b").alias("t"))
    deg = edges.groupBy(F.col("s").alias("node")).agg(
        F.count(F.lit(1)).alias("k")
    )
    tot = edges.agg(F.count(F.lit(1)).alias("m"))
    # Sweep + synchronous-swap resolution live in the shared weighted
    # helper (w=1 here): gain 2·1·E − 2·k_s·k_t is strictly decreasing
    # in k_t, so its (gain desc, t) argmax equals the original
    # min(k_t, t) pick — same labels, oracle unchanged. In a mutual
    # pair (i→j AND j→i) only the LARGER id moves, so {i, j} lands in
    # community min(i, j) instead of swapping labels.
    best = _louvain_weighted_sweep(
        edges.withColumn("w", F.lit(1).cast("long")), deg, tot
    )
    singleton = deg.select("node", F.col("node").alias("c"))
    out = None
    for method, labels, moved in (
        ("singleton", singleton, F.lit(0).cast("long")),
        ("louvain1", best, F.sum(F.col("moved").cast("long"))),
    ):
        ls = labels.select(F.col("node").alias("s"), F.col("c").alias("cs"))
        lt = labels.select(F.col("node").alias("t"), F.col("c").alias("ct"))
        tagged = edges.join(ls, "s").join(lt, "t")
        e_c = (
            tagged.filter(F.col("cs") == F.col("ct"))
            .groupBy(F.col("cs").alias("c"))
            .agg(F.count(F.lit(1)).alias("e_c"))
        )
        d_c = tagged.groupBy(F.col("cs").alias("c")).agg(
            F.count(F.lit(1)).alias("d_c")
        )
        n_moved = (
            labels.agg(moved.alias("n_moved"))
            if method == "louvain1"
            else spark.range(1).select(F.lit(0).cast("long").alias("n_moved"))
        )
        row = (
            d_c.join(e_c, "c", "left")
            .withColumn("e_c", F.coalesce(F.col("e_c"), F.lit(0)))
            .crossJoin(F.broadcast(tot))
            .agg(
                F.lit(method).alias("method"),
                F.count(F.lit(1)).alias("n_communities"),
                F.max("m").alias("n_directed_edges"),
                F.sum(
                    F.col("e_c") * F.col("m") - F.col("d_c") * F.col("d_c")
                ).alias("q_num"),
            )
            .crossJoin(F.broadcast(n_moved))
        )
        out = row if out is None else out.unionByName(row)
    return out.select(
        "method",
        "n_communities",
        "n_moved",
        "n_directed_edges",
        "q_num",
        (
            F.col("q_num").cast("double")
            / (
                F.col("n_directed_edges").cast("double")
                * F.col("n_directed_edges").cast("double")
            )
        )
        .cast("decimal(18,6)")
        .cast("double")
        .alias("modularity"),
    )


def _louvain_tail_sql(method: str, labels_cte: str, moved_sql: str) -> str:
    return f"""
  SELECT '{method}' AS method,
         COUNT(*) AS n_communities,
         {moved_sql} AS n_moved,
         MAX(m) AS n_directed_edges,
         CAST(SUM(e_c * m - d_c * d_c) AS BIGINT) AS q_num
  FROM (
    SELECT d.c, d.d_c, COALESCE(e.e_c, 0) AS e_c, t.m
    FROM (SELECT ls.c, COUNT(*) AS d_c
          FROM edges JOIN {labels_cte} ls ON ls.node = edges.src
          GROUP BY ls.c) d
    LEFT JOIN (SELECT ls.c, COUNT(*) AS e_c
               FROM edges
               JOIN {labels_cte} ls ON ls.node = edges.src
               JOIN {labels_cte} lt ON lt.node = edges.dst
               WHERE ls.c = lt.c GROUP BY ls.c) e USING (c)
    CROSS JOIN (SELECT COUNT(*) AS m FROM edges) t
  )"""


GRAPH_LOUVAIN_ONE_LEVEL_SQL = f"""
WITH
{_EDGE_SQL_CTE},
deg AS (SELECT src AS node, COUNT(*) AS k FROM edges GROUP BY src),
tot AS (SELECT COUNT(*) AS m FROM edges),
gains AS (
  SELECT e.src AS node, ks.k AS k_s, kt.k AS k_t, e.dst AS t,
         ROW_NUMBER() OVER (PARTITION BY e.src ORDER BY kt.k, e.dst) AS rn
  FROM edges e
  JOIN deg ks ON ks.node = e.src
  JOIN deg kt ON kt.node = e.dst
),
singleton AS (SELECT node, node AS c, FALSE AS moved FROM deg),
prop AS (
  SELECT g.node,
         CASE WHEN g.k_s * g.k_t < t.m THEN g.t ELSE g.node END AS c
  FROM gains g CROSS JOIN tot t
  WHERE g.rn = 1
),
louv AS (
  SELECT p1.node,
         CASE WHEN EXISTS (SELECT 1 FROM prop p2
                           WHERE p2.node = p1.c AND p2.c = p1.node)
                   AND p1.node < p1.c
              THEN p1.node ELSE p1.c END AS c,
         CASE WHEN EXISTS (SELECT 1 FROM prop p2
                           WHERE p2.node = p1.c AND p2.c = p1.node)
                   AND p1.node < p1.c
              THEN FALSE ELSE p1.c <> p1.node END AS moved
  FROM prop p1
),
q AS (
{_louvain_tail_sql("singleton", "singleton", "CAST(0 AS BIGINT)")}
  UNION ALL
{_louvain_tail_sql(
    "louvain1",
    "louv",
    "(SELECT CAST(COUNT(*) FILTER (WHERE moved) AS BIGINT) FROM louv)",
)}
)
SELECT method, n_communities, n_moved, n_directed_edges, q_num,
       CAST(CAST(CAST(q_num AS DOUBLE)
                 / (CAST(n_directed_edges AS DOUBLE)
                    * CAST(n_directed_edges AS DOUBLE))
            AS DECIMAL(18,6)) AS DOUBLE) AS modularity
FROM q
"""


def _louvain_weighted_sweep(wedges: DataFrame, deg: DataFrame, tot) -> DataFrame:
    """One synchronous greedy sweep over a WEIGHTED directed edge list
    (s, t, w) with degrees (node, k): gain of moving s into {t} is
    ΔQ·E² = 2·w(s,t)·E − 2·k_s·k_t (self-loop terms cancel — the level-2
    form; level 1 is the w=1 special case). Argmax by (gain desc, t asc),
    move iff gain > 0; mutual-swap resolution keeps the smaller id in
    place. Returns (node, c, moved)."""
    ks = deg.select(F.col("node").alias("s"), F.col("k").alias("k_s"))
    kt = deg.select(F.col("node").alias("t"), F.col("k").alias("k_t"))
    gain = (
        2 * F.col("w") * F.col("m") - 2 * F.col("k_s") * F.col("k_t")
    ).alias("gain")
    prop = (
        wedges.join(ks, "s")
        .join(kt, "t")
        .crossJoin(F.broadcast(tot))  # 1-row scalar
        .select("s", "t", gain)
        .groupBy("s")
        .agg(F.max(F.struct(F.col("gain"), (-F.col("t")).alias("nt"))).alias("b"))
        .select(
            F.col("s").alias("node"),
            F.when(F.col("b.gain") > 0, -F.col("b.nt"))
            .otherwise(F.col("s"))
            .alias("c"),
        )
    )
    # prop feeds THREE subtrees (both mutual-join sides + the final
    # select); the sweep output feeds every downstream consumer of the
    # level (label joins ×2 per modularity row, contraction,
    # composition). Persist + checkpoint bound the re-evaluation — the
    # in-suite two-level entry measured 22.5 s without this, 3-4 s with.
    prop = prop.persist()
    mutual = prop.alias("p1").join(
        prop.alias("p2"),
        (F.col("p1.c") == F.col("p2.node")) & (F.col("p2.c") == F.col("p1.node")),
        "left_semi",
    ).select(F.col("node"), F.lit(True).alias("is_mutual"))
    out = (
        prop.join(mutual, "node", "left")
        .select(
            "node",
            F.when(
                F.col("is_mutual").isNotNull() & (F.col("node") < F.col("c")),
                F.col("node"),
            )
            .otherwise(F.col("c"))
            .alias("c"),
        )
        .withColumn("moved", F.col("c") != F.col("node"))
        .localCheckpoint(eager=True)
    )
    prop.unpersist()
    return out


def graph_louvain_two_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full Louvain shape — level 1 over nodes, then CONTRACTION (one
    node per community, directed edge weights summed, self-loops kept as
    internal mass) and a second greedy sweep over the community graph
    with the WEIGHTED gain 2·w(c,d)·E − 2·D_c·D_d (the singleton
    self-loop terms cancel exactly, so the same integer formula drives
    both levels). Output: singleton / louvain1 / louvain2 rows, each
    with modularity computed over the ORIGINAL edges under the composed
    labels — level 2's Q is exactly the contracted graph's Q, so the row
    sequence is the algorithm's monotone-improvement ladder, measured.

    Scale: contraction is one keyed agg over the edge list (the graph
    SHRINKS each level — the property that makes Louvain tractable at
    billions of edges); each sweep is degree joins + a struct-max
    groupBy. No iteration beyond the two unrolled levels, no driver
    state."""
    sym = _jaccard_edges(spark, sf_dir)
    edges = sym.select(F.col("doc_a").alias("s"), F.col("doc_b").alias("t"))
    deg = edges.groupBy(F.col("s").alias("node")).agg(
        F.count(F.lit(1)).alias("k")
    )
    tot = edges.agg(F.count(F.lit(1)).alias("m"))
    lab1 = _louvain_weighted_sweep(
        edges.withColumn("w", F.lit(1).cast("long")), deg, tot
    )  # checkpointed by the sweep: contraction/composition reuse it free

    # contraction: community graph with summed directed weights
    l_s = lab1.select(F.col("node").alias("s"), F.col("c").alias("cs"))
    l_t = lab1.select(F.col("node").alias("t"), F.col("c").alias("ct"))
    ce = (
        edges.join(l_s, "s")
        .join(l_t, "t")
        .groupBy(F.col("cs").alias("s"), F.col("ct").alias("t"))
        .agg(F.count(F.lit(1)).alias("w"))
        .persist()
    )
    ce.count()
    cdeg = ce.groupBy(F.col("s").alias("node")).agg(F.sum("w").alias("k"))
    lab2 = _louvain_weighted_sweep(ce.filter(F.col("s") != F.col("t")), cdeg, tot)
    # communities whose only edges are self-loops never propose: they
    # keep their label through the coalesce below
    composed = (
        lab1.select("node", F.col("c").alias("c1"))
        .join(
            lab2.select(F.col("node").alias("c1"), F.col("c").alias("c2")),
            "c1",
            "left",
        )
        .select("node", F.coalesce("c2", "c1").alias("c"))
    )
    n_moved2 = lab2.agg(
        F.sum(F.col("moved").cast("long")).alias("n_moved")
    ).fillna(0)

    singleton = deg.select("node", F.col("node").alias("c"))
    out = None
    for method, labels, moved_frame in (
        ("singleton", singleton, None),
        ("louvain1", lab1.select("node", "c"),
         lab1.agg(F.sum(F.col("moved").cast("long")).alias("n_moved"))),
        ("louvain2", composed, n_moved2),
    ):
        ls = labels.select(F.col("node").alias("s"), F.col("c").alias("cs"))
        lt = labels.select(F.col("node").alias("t"), F.col("c").alias("ct"))
        tagged = edges.join(ls, "s").join(lt, "t")
        e_c = (
            tagged.filter(F.col("cs") == F.col("ct"))
            .groupBy(F.col("cs").alias("c"))
            .agg(F.count(F.lit(1)).alias("e_c"))
        )
        d_c = tagged.groupBy(F.col("cs").alias("c")).agg(
            F.count(F.lit(1)).alias("d_c")
        )
        if moved_frame is None:
            moved_frame = edges.sparkSession.range(1).select(
                F.lit(0).cast("long").alias("n_moved")
            )
        row = (
            d_c.join(e_c, "c", "left")
            .withColumn("e_c", F.coalesce(F.col("e_c"), F.lit(0)))
            .crossJoin(F.broadcast(tot))
            .agg(
                F.lit(method).alias("method"),
                F.count(F.lit(1)).alias("n_communities"),
                F.max("m").alias("n_directed_edges"),
                F.sum(
                    F.col("e_c") * F.col("m") - F.col("d_c") * F.col("d_c")
                ).alias("q_num"),
            )
            .crossJoin(F.broadcast(moved_frame))
        )
        out = row if out is None else out.unionByName(row)
    return out.select(
        "method",
        "n_communities",
        "n_moved",
        "n_directed_edges",
        "q_num",
        (
            F.col("q_num").cast("double")
            / (
                F.col("n_directed_edges").cast("double")
                * F.col("n_directed_edges").cast("double")
            )
        )
        .cast("decimal(18,6)")
        .cast("double")
        .alias("modularity"),
    )


GRAPH_LOUVAIN_TWO_LEVEL_SQL = f"""
WITH
{_EDGE_SQL_CTE},
deg AS (SELECT src AS node, COUNT(*) AS k FROM edges GROUP BY src),
tot AS (SELECT COUNT(*) AS m FROM edges),
gains AS (
  SELECT e.src AS node,
         2 * 1 * t.m - 2 * ks.k * kt.k AS gain, e.dst AS t,
         ROW_NUMBER() OVER (PARTITION BY e.src
                            ORDER BY 2 * 1 * t.m - 2 * ks.k * kt.k DESC,
                                     e.dst) AS rn
  FROM edges e
  JOIN deg ks ON ks.node = e.src
  JOIN deg kt ON kt.node = e.dst
  CROSS JOIN tot t
),
singleton AS (SELECT node, node AS c, FALSE AS moved FROM deg),
prop AS (
  SELECT node, CASE WHEN gain > 0 THEN t ELSE node END AS c
  FROM gains WHERE rn = 1
),
louv AS (
  SELECT p1.node,
         CASE WHEN EXISTS (SELECT 1 FROM prop p2
                           WHERE p2.node = p1.c AND p2.c = p1.node)
                   AND p1.node < p1.c
              THEN p1.node ELSE p1.c END AS c,
         CASE WHEN EXISTS (SELECT 1 FROM prop p2
                           WHERE p2.node = p1.c AND p2.c = p1.node)
                   AND p1.node < p1.c
              THEN FALSE ELSE p1.c <> p1.node END AS moved
  FROM prop p1
),
cedges AS MATERIALIZED (
  SELECT ls.c AS s, lt.c AS t, COUNT(*) AS w
  FROM edges JOIN louv ls ON ls.node = edges.src
             JOIN louv lt ON lt.node = edges.dst
  GROUP BY 1, 2
),
cdeg AS (SELECT s AS node, CAST(SUM(w) AS BIGINT) AS k FROM cedges GROUP BY s),
gains2 AS (
  SELECT e.s AS node,
         2 * e.w * t.m - 2 * ks.k * kt.k AS gain, e.t,
         ROW_NUMBER() OVER (PARTITION BY e.s
                            ORDER BY 2 * e.w * t.m - 2 * ks.k * kt.k DESC,
                                     e.t) AS rn
  FROM cedges e
  JOIN cdeg ks ON ks.node = e.s
  JOIN cdeg kt ON kt.node = e.t
  CROSS JOIN tot t
  WHERE e.s <> e.t
),
prop2 AS (
  SELECT node, CASE WHEN gain > 0 THEN t ELSE node END AS c
  FROM gains2 WHERE rn = 1
),
louv2 AS (
  SELECT p1.node,
         CASE WHEN EXISTS (SELECT 1 FROM prop2 p2
                           WHERE p2.node = p1.c AND p2.c = p1.node)
                   AND p1.node < p1.c
              THEN p1.node ELSE p1.c END AS c,
         CASE WHEN EXISTS (SELECT 1 FROM prop2 p2
                           WHERE p2.node = p1.c AND p2.c = p1.node)
                   AND p1.node < p1.c
              THEN FALSE ELSE p1.c <> p1.node END AS moved
  FROM prop2 p1
),
composed AS (
  SELECT l1.node, COALESCE(l2.c, l1.c) AS c
  FROM louv l1 LEFT JOIN louv2 l2 ON l2.node = l1.c
),
q AS (
{_louvain_tail_sql("singleton", "singleton", "CAST(0 AS BIGINT)")}
  UNION ALL
{_louvain_tail_sql(
    "louvain1",
    "louv",
    "(SELECT CAST(COUNT(*) FILTER (WHERE moved) AS BIGINT) FROM louv)",
)}
  UNION ALL
{_louvain_tail_sql(
    "louvain2",
    "composed",
    "(SELECT CAST(COALESCE(COUNT(*) FILTER (WHERE moved), 0) AS BIGINT) FROM louv2)",
)}
)
SELECT method, n_communities, n_moved, n_directed_edges, q_num,
       CAST(CAST(CAST(q_num AS DOUBLE)
                 / (CAST(n_directed_edges AS DOUBLE)
                    * CAST(n_directed_edges AS DOUBLE))
            AS DECIMAL(18,6)) AS DOUBLE) AS modularity
FROM q
"""


# Bounded level cap for the converged Louvain loop. The fixtures
# converge in 2–3 levels; the cap bounds the driver loop AND the
# oracle's unrolled CTE chain (each level is one sweep + contraction —
# the graph shrinks per level, so late levels are near-free).
LOUVAIN_MAX_LEVELS = 4


def graph_louvain_converged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Louvain to CONVERGENCE (r6 verdict directive #8): iterate
    sweep → contraction while the sweep still moves nodes, bounded by
    ``LOUVAIN_MAX_LEVELS``, emitting the full modularity ladder —
    singleton plus one row per executed level, each Q computed over the
    ORIGINAL edges under the composed labels. The stop rule
    ``n_moved == 0`` is exact ΔQ-convergence for this integer
    formulation: a move fires only on strictly positive integer gain
    ΔQ·E² ≥ 1, so "no move" means no single-node relocation can improve
    Q by even 1/E².

    The terminal row is part of the contract: the ladder's last level
    shows n_moved = 0 (the convergence PROOF, not just absence of more
    rows), and rounds-to-stop is the row count minus the singleton.

    Plan: per level, one weighted sweep (degree joins + struct-max
    groupBy, mutual-swap resolution) and one keyed contraction agg;
    label/contraction outputs are eagerly checkpointed so lineage stays
    LINEAR in levels (the r6 persist lesson — without truncation each
    level's plan re-embeds every prior level ~4×). Driver state is one
    scalar (n_moved) per level, cap-bounded; the graph SHRINKS each
    contraction, which is what makes the loop tractable at billions of
    edges."""
    sym = _jaccard_edges(spark, sf_dir)
    edges = sym.select(F.col("doc_a").alias("s"), F.col("doc_b").alias("t"))
    deg = edges.groupBy(F.col("s").alias("node")).agg(
        F.count(F.lit(1)).alias("k")
    )
    tot = edges.agg(F.count(F.lit(1)).alias("m"))

    singleton = deg.select("node", F.col("node").alias("c"))
    composed = singleton
    wg = edges.withColumn("w", F.lit(1).cast("long"))  # no self-loops yet
    gdeg = deg
    ladder: list[tuple[str, DataFrame, DataFrame]] = [
        (
            "singleton",
            singleton,
            spark.range(1).select(F.lit(0).cast("long").alias("n_moved")),
        )
    ]
    for level in range(1, LOUVAIN_MAX_LEVELS + 1):
        lab = _louvain_weighted_sweep(
            wg.filter(F.col("s") != F.col("t")), gdeg, tot
        )  # eagerly checkpointed by the sweep helper
        n_moved = lab.agg(F.sum(F.col("moved").cast("long"))).first()[0] or 0
        composed = (
            composed.join(
                lab.select(F.col("node").alias("c"), F.col("c").alias("c2")),
                "c",
                "left",
            )
            .select("node", F.coalesce("c2", "c").alias("c"))
            .localCheckpoint(eager=True)
        )
        ladder.append(
            (
                f"louvain{level}",
                composed,
                spark.range(1).select(
                    F.lit(int(n_moved)).cast("long").alias("n_moved")
                ),
            )
        )
        if n_moved == 0:
            break  # converged: the zero-move level is the terminal row
        # contraction: relabel the CURRENT community graph, sum weights
        # (self-loops keep internal mass; degrees include them)
        l_s = lab.select(F.col("node").alias("s"), F.col("c").alias("cs"))
        l_t = lab.select(F.col("node").alias("t"), F.col("c").alias("ct"))
        wg = (
            wg.join(l_s, "s")
            .join(l_t, "t")
            .groupBy(F.col("cs").alias("s"), F.col("ct").alias("t"))
            .agg(F.sum("w").alias("w"))
            .localCheckpoint(eager=True)
        )
        gdeg = wg.groupBy(F.col("s").alias("node")).agg(F.sum("w").alias("k"))

    out = None
    for method, labels, moved_frame in ladder:
        ls = labels.select(F.col("node").alias("s"), F.col("c").alias("cs"))
        lt = labels.select(F.col("node").alias("t"), F.col("c").alias("ct"))
        tagged = edges.join(ls, "s").join(lt, "t")
        e_c = (
            tagged.filter(F.col("cs") == F.col("ct"))
            .groupBy(F.col("cs").alias("c"))
            .agg(F.count(F.lit(1)).alias("e_c"))
        )
        d_c = tagged.groupBy(F.col("cs").alias("c")).agg(
            F.count(F.lit(1)).alias("d_c")
        )
        row = (
            d_c.join(e_c, "c", "left")
            .withColumn("e_c", F.coalesce(F.col("e_c"), F.lit(0)))
            .crossJoin(F.broadcast(tot))
            .agg(
                F.lit(method).alias("method"),
                F.count(F.lit(1)).alias("n_communities"),
                F.max("m").alias("n_directed_edges"),
                F.sum(
                    F.col("e_c") * F.col("m") - F.col("d_c") * F.col("d_c")
                ).alias("q_num"),
            )
            .crossJoin(F.broadcast(moved_frame))
        )
        out = row if out is None else out.unionByName(row)
    return out.select(
        "method",
        "n_communities",
        "n_moved",
        "n_directed_edges",
        "q_num",
        (
            F.col("q_num").cast("double")
            / (
                F.col("n_directed_edges").cast("double")
                * F.col("n_directed_edges").cast("double")
            )
        )
        .cast("decimal(18,6)")
        .cast("double")
        .alias("modularity"),
    )


def _louvain_level_sql(level: int) -> str:
    """One unrolled Louvain level for the converged oracle: weighted
    sweep over ``cedges{level}`` (self-loops excluded from gains,
    included in degrees), mutual-swap resolution, label composition,
    and the next level's contracted graph. Every per-level CTE is
    MATERIALIZED — each is referenced multiple times, and DuckDB
    inlines plain CTEs at every reference (2^depth blow-up on an
    iterate chain)."""
    lv, prev = level, level - 1
    return f"""
cdeg{lv} AS MATERIALIZED (
  SELECT s AS node, CAST(SUM(w) AS BIGINT) AS k FROM cedges{lv} GROUP BY s
),
gains{lv} AS (
  SELECT e.s AS node,
         2 * e.w * t.m - 2 * ks.k * kt.k AS gain, e.t,
         ROW_NUMBER() OVER (PARTITION BY e.s
                            ORDER BY 2 * e.w * t.m - 2 * ks.k * kt.k DESC,
                                     e.t) AS rn
  FROM cedges{lv} e
  JOIN cdeg{lv} ks ON ks.node = e.s
  JOIN cdeg{lv} kt ON kt.node = e.t
  CROSS JOIN tot t
  WHERE e.s <> e.t
),
prop{lv} AS MATERIALIZED (
  SELECT node, CASE WHEN gain > 0 THEN t ELSE node END AS c
  FROM gains{lv} WHERE rn = 1
),
louv{lv} AS MATERIALIZED (
  SELECT p1.node,
         CASE WHEN EXISTS (SELECT 1 FROM prop{lv} p2
                           WHERE p2.node = p1.c AND p2.c = p1.node)
                   AND p1.node < p1.c
              THEN p1.node ELSE p1.c END AS c,
         CASE WHEN EXISTS (SELECT 1 FROM prop{lv} p2
                           WHERE p2.node = p1.c AND p2.c = p1.node)
                   AND p1.node < p1.c
              THEN FALSE ELSE p1.c <> p1.node END AS moved
  FROM prop{lv} p1
),
comp{lv} AS MATERIALIZED (
  SELECT c0.node, COALESCE(l.c, c0.c) AS c
  FROM comp{prev} c0 LEFT JOIN louv{lv} l ON l.node = c0.c
),
cedges{lv + 1} AS MATERIALIZED (
  SELECT ls.c AS s, lt.c AS t, CAST(SUM(e.w) AS BIGINT) AS w
  FROM cedges{lv} e
  JOIN louv{lv} ls ON ls.node = e.s
  JOIN louv{lv} lt ON lt.node = e.t
  GROUP BY 1, 2
)"""


def _louvain_converged_sql() -> str:
    """Generated {LOUVAIN_MAX_LEVELS}-level unrolled twin of the Spark
    driver loop. Emission matches the early stop exactly: level l's row
    appears iff every earlier level moved at least one node (when a
    sweep proposes nothing, all later sweeps are identical no-ops, so
    unrolling past convergence is safe — and filtered out here)."""
    levels = "".join("," + _louvain_level_sql(lv) for lv in range(1, LOUVAIN_MAX_LEVELS + 1))
    tails = [_louvain_tail_sql("singleton", "comp0", "CAST(0 AS BIGINT)")]
    for lv in range(1, LOUVAIN_MAX_LEVELS + 1):
        gate = " AND ".join(
            f"(SELECT COUNT(*) FILTER (WHERE moved) FROM louv{j}) > 0"
            for j in range(1, lv)
        )
        tail = _louvain_tail_sql(
            f"louvain{lv}",
            f"comp{lv}",
            f"(SELECT CAST(COUNT(*) FILTER (WHERE moved) AS BIGINT) FROM louv{lv})",
        )
        if gate:
            tail = f"  SELECT * FROM (\n{tail}\n  ) WHERE {gate}"
        tails.append(tail)
    body = "\n  UNION ALL\n".join(tails)
    return f"""
WITH
{_EDGE_SQL_CTE},
deg AS (SELECT src AS node, COUNT(*) AS k FROM edges GROUP BY src),
tot AS (SELECT COUNT(*) AS m FROM edges),
comp0 AS MATERIALIZED (SELECT node, node AS c FROM deg),
cedges1 AS MATERIALIZED (
  SELECT src AS s, dst AS t, CAST(1 AS BIGINT) AS w FROM edges
){levels},
q AS (
{body}
)
SELECT method, n_communities, n_moved, n_directed_edges, q_num,
       CAST(CAST(CAST(q_num AS DOUBLE)
                 / (CAST(n_directed_edges AS DOUBLE)
                    * CAST(n_directed_edges AS DOUBLE))
            AS DECIMAL(18,6)) AS DOUBLE) AS modularity
FROM q
"""


GRAPH_LOUVAIN_CONVERGED_SQL = _louvain_converged_sql()


# ---------------------------------------------------------------------------
# HITS hubs & authorities (bipartite purchase graph)
# ---------------------------------------------------------------------------

HITS_TOPK = 25


def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg hubs/authorities, 2 unrolled iterations) over the
    bipartite customer→part purchase graph: a part's authority is the
    summed hub weight of the customers buying it; a customer's hub
    weight is the summed authority of the parts they buy. The output
    ranks parts by 2nd-iteration authority — "parts endorsed by
    broad-basket customers", the graph-native complement of raw sales
    counts (graph_link_prediction shares this edge set).

    Integer-exact formulation: scores are unnormalized BIGINT sums
    (a₀ = 1 → h₁ = out-degree → a₁ = Σh₁ → h₂ = Σa₁ → a₂ = Σh₂); with
    bounded degrees the growth is polynomial and far below int64 here —
    a production run rescales (floor-div by the max) between iterations,
    the same integer discipline as graph_pagerank's micro-units.

    Scale design: the edge set is the DISTINCT (customer, part) pairs —
    one dedup shuffle — and each half-iteration is one keyed agg plus
    one edge⋈score join, all keyed by the edge endpoints (bucketing the
    edge table by each endpoint makes them co-located at rest). No
    driver-side state, no lineage growth: the loop is unrolled.
    """
    c = Catalog(spark, sf_dir)
    li = c.table("lineitem").select("l_orderkey", "l_partkey")
    orders = c.table("orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("part"))
        .distinct()
    )
    # a0 = 1 for every part  ⇒  h1(cust) = out-degree
    h1 = edges.groupBy("cust").agg(F.count(F.lit(1)).alias("h1"))
    a1 = (
        edges.join(h1, "cust")
        .groupBy("part")
        .agg(F.sum("h1").alias("a1"))
    )
    h2 = (
        edges.join(a1, "part")
        .groupBy("cust")
        .agg(F.sum("a1").alias("h2"))
    )
    a2 = (
        edges.join(h2, "cust")
        .groupBy("part")
        .agg(F.sum("h2").alias("a2"), F.count(F.lit(1)).alias("n_buyers"))
    )
    return (
        a2.join(a1, "part")
        .select(
            F.col("part").alias("part_key"),
            F.col("a1").cast("bigint").alias("auth1"),
            F.col("a2").cast("bigint").alias("auth2"),
            F.col("n_buyers").cast("int").alias("n_buyers"),
        )
        .orderBy(F.desc("auth2"), "part_key")
        .limit(HITS_TOPK)
    )


GRAPH_HITS_SQL = f"""
WITH edges AS MATERIALIZED (
  SELECT DISTINCT o_custkey AS cust, l_partkey AS part
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
h1 AS (SELECT cust, COUNT(*) AS h1 FROM edges GROUP BY cust),
a1 AS (
  SELECT part, SUM(h1) AS a1 FROM edges JOIN h1 USING (cust) GROUP BY part
),
h2 AS (
  SELECT cust, SUM(a1) AS h2 FROM edges JOIN a1 USING (part) GROUP BY cust
),
a2 AS (
  SELECT part, SUM(h2) AS a2, COUNT(*) AS n_buyers
  FROM edges JOIN h2 USING (cust) GROUP BY part
)
SELECT part AS part_key, CAST(a1 AS BIGINT) AS auth1, CAST(a2 AS BIGINT) AS auth2,
       CAST(n_buyers AS INT) AS n_buyers
FROM a2 JOIN a1 USING (part)
ORDER BY auth2 DESC, part_key
LIMIT {HITS_TOPK}
"""


# ---------------------------------------------------------------------------
# Label-propagation communities (mode-label LPA)
# ---------------------------------------------------------------------------

LPA_ROUNDS = 2


def graph_community_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-propagation community detection (Raghavan et al. 2007) over
    the symmetric Jaccard≥0.5 edge graph — {LPA_ROUNDS} SYNCHRONOUS
    rounds where every node adopts the MODE of its neighbors' labels
    (ties → smallest label). Communities differ from connected
    components (min-label reachability): LPA splits a component along
    dense cores, which is what template-family analysis wants when one
    giant component chains several distinct boilerplate families.

    Determinism: synchronous rounds + total tie order (count DESC, label
    ASC) make the fixed unrolled iteration replayable — asynchronous
    LPA (the common implementation) is order-dependent and cannot be
    oracle-checked. Per round: one edge⋈label join and two keyed aggs —
    the per-iteration cost of pagerank, reused plan shape.
    """
    edges = _jaccard_edges(spark, sf_dir).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
    )
    for _ in range(LPA_ROUNDS):
        cnt = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        best = F.max(F.struct(F.col("c").alias("c"), (-F.col("label")).alias("nl")))
        labels = (
            cnt.groupBy("src")
            .agg(best.alias("b"))
            .select(F.col("src").alias("node"), (-F.col("b.nl")).alias("label"))
        )
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    return (
        labels.join(sizes, "label")
        .select(
            F.col("node").alias("doc_id"),
            F.col("label").alias("community"),
            F.col("n").cast("int").alias("community_size"),
        )
    )


GRAPH_COMMUNITY_LABEL_PROP_SQL = """
WITH
w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS MATERIALIZED (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, unnest(list_transform(generate_series(1, len(w)-1),
                          i -> w[i] || ' ' || w[i+1])) AS shingle
    FROM w WHERE len(w) >= 2)
),
sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS MATERIALIZED (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b USING (shingle) WHERE a.doc_id < b.doc_id GROUP BY 1, 2
),
pairs AS MATERIALIZED (
  SELECT doc_a, doc_b FROM inter
  JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
  WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.5
),
edges AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),
c1 AS (
  SELECT e.src, l.label, COUNT(*) AS c
  FROM edges e JOIN l0 l ON l.node = e.dst GROUP BY 1, 2
),
l1 AS (
  SELECT src AS node, label FROM (
    SELECT src, label,
           ROW_NUMBER() OVER (PARTITION BY src ORDER BY c DESC, label ASC) AS rn
    FROM c1) WHERE rn = 1
),
c2 AS (
  SELECT e.src, l.label, COUNT(*) AS c
  FROM edges e JOIN l1 l ON l.node = e.dst GROUP BY 1, 2
),
l2 AS (
  SELECT src AS node, label FROM (
    SELECT src, label,
           ROW_NUMBER() OVER (PARTITION BY src ORDER BY c DESC, label ASC) AS rn
    FROM c2) WHERE rn = 1
),
sizes AS (SELECT label, COUNT(*) AS n FROM l2 GROUP BY label)
SELECT node AS doc_id, l2.label AS community, CAST(n AS INT) AS community_size
FROM l2 JOIN sizes ON l2.label = sizes.label
"""


# ---------------------------------------------------------------------------
# Deterministic random walks (DeepWalk corpus generation)
# ---------------------------------------------------------------------------

WALKS_PER_NODE = 2
WALK_LENGTH = 3  # hops per walk (path holds WALK_LENGTH + 1 nodes)


def graph_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-walk corpus over the Jaccard edge graph (DeepWalk/node2vec
    style, public) with HASH-DRIVEN "randomness": walk w at node v picks
    neighbor  sorted_neighbors[ md5(v, w, step) mod degree ].  Hash
    selection replaces RNG state, so the walk corpus — the input that
    graph-embedding trainers consume — is reproducible across engines,
    retries, and partition layouts, the same discipline as the
    multiplier bootstrap and the shard shuffle.

    Plan: one groupBy builds the per-node SORTED neighbor array (the
    adjacency index — bucketable by node at rest); each of the
    {WALK_LENGTH} steps is one keyed join against that index plus a
    row-local hash pick. State is |nodes|·{WALKS_PER_NODE} walk rows —
    never edge-sized — and the loop is unrolled, no lineage growth.
    """
    edges = _jaccard_edges(spark, sf_dir).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    adj = edges.groupBy("src").agg(
        F.array_sort(F.collect_list("dst")).alias("nbrs")
    )
    walks = adj.select(
        F.col("src").alias("start"),
        F.explode(F.sequence(F.lit(0), F.lit(WALKS_PER_NODE - 1))).alias("w"),
    ).select("start", "w", F.col("start").alias("cur"), F.array("start").alias("path"))
    for step in range(WALK_LENGTH):
        pick = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":",
                            F.col("cur").cast("string"),
                            F.col("w").cast("string"),
                            F.lit(str(step)),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % F.size("nbrs")
        )
        walks = (
            walks.join(adj, walks.cur == adj.src)
            .select(
                "start",
                "w",
                F.element_at("nbrs", (pick + 1).cast("int")).alias("cur"),
                F.concat(
                    "path", F.array(F.element_at("nbrs", (pick + 1).cast("int")))
                ).alias("path"),
            )
        )
    return walks.select(
        "start",
        F.col("w").cast("int").alias("walk_no"),
        F.col("path").cast("array<bigint>").alias("path"),
        F.col("cur").alias("end_node"),
    ).orderBy("start", "walk_no")


GRAPH_RANDOM_WALKS_SQL = f"""
WITH
w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS MATERIALIZED (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, unnest(list_transform(generate_series(1, len(w)-1),
                          i -> w[i] || ' ' || w[i+1])) AS shingle
    FROM w WHERE len(w) >= 2)
),
sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS MATERIALIZED (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b USING (shingle) WHERE a.doc_id < b.doc_id GROUP BY 1, 2
),
pairs AS MATERIALIZED (
  SELECT doc_a, doc_b FROM inter
  JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
  WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.5
),
edges AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
adj AS (SELECT src, list_sort(list(dst)) AS nbrs FROM edges GROUP BY src),
w0 AS (
  SELECT a.src AS start, t.w, a.src AS cur, [a.src] AS path
  FROM adj a, (SELECT UNNEST(generate_series(0, {WALKS_PER_NODE - 1})) AS w) t
),
w1 AS (
  SELECT start, w,
         nbrs[CAST(('0x' || substr(md5(CAST(w0.cur AS VARCHAR) || ':' || CAST(w AS VARCHAR) || ':0'), 1, 8))::BIGINT % len(nbrs) AS INT) + 1] AS cur,
         list_append(path, nbrs[CAST(('0x' || substr(md5(CAST(w0.cur AS VARCHAR) || ':' || CAST(w AS VARCHAR) || ':0'), 1, 8))::BIGINT % len(nbrs) AS INT) + 1]) AS path
  FROM w0 JOIN adj ON w0.cur = adj.src
),
w2 AS (
  SELECT start, w,
         nbrs[CAST(('0x' || substr(md5(CAST(w1.cur AS VARCHAR) || ':' || CAST(w AS VARCHAR) || ':1'), 1, 8))::BIGINT % len(nbrs) AS INT) + 1] AS cur,
         list_append(path, nbrs[CAST(('0x' || substr(md5(CAST(w1.cur AS VARCHAR) || ':' || CAST(w AS VARCHAR) || ':1'), 1, 8))::BIGINT % len(nbrs) AS INT) + 1]) AS path
  FROM w1 JOIN adj ON w1.cur = adj.src
),
w3 AS (
  SELECT start, w,
         nbrs[CAST(('0x' || substr(md5(CAST(w2.cur AS VARCHAR) || ':' || CAST(w AS VARCHAR) || ':2'), 1, 8))::BIGINT % len(nbrs) AS INT) + 1] AS cur,
         list_append(path, nbrs[CAST(('0x' || substr(md5(CAST(w2.cur AS VARCHAR) || ':' || CAST(w AS VARCHAR) || ':2'), 1, 8))::BIGINT % len(nbrs) AS INT) + 1]) AS path
  FROM w2 JOIN adj ON w2.cur = adj.src
)
SELECT start, CAST(w AS INT) AS walk_no, path, cur AS end_node
FROM w3 ORDER BY start, walk_no
"""
