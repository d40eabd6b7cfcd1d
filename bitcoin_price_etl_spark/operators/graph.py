"""Graph analytics over relational edge lists.

The engine's graph story runs on DataFrames, not a graph runtime: an edge
list is a two-column frame, one iteration of any message-passing algorithm
is join → aggregate → join, and a FIXED number of iterations unrolls into
a plain Catalyst plan that the oracle can mirror CTE-for-CTE. The family's
other member — connected components via min-label propagation — lives with
its use case in llm/dedup.py (llm_dedup_cluster, certified against a
recursive-CTE oracle); this module holds the rank-style algorithms.

Scale posture: every iteration's heavy step is an equi-join on the edge
key and a partial-aggregated sum keyed by destination — the classic
Pregel-on-MapReduce shape. Ranks are a |V|-row frame (tiny next to |E|);
edges partition once and every iteration reuses that exchange. Hot
destinations (a supplier every customer buys from) partial-combine
map-side, so skew costs one combiner pass, not a hot reducer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bitcoin_price_etl_spark.session import stage, stage_iter
from bitcoin_price_etl_spark.catalog import load
from bitcoin_price_etl_spark.registry import query

PR_DAMPING = 0.85
PR_ITERS = 3


def _pr_iter_sql(i: int) -> str:
    """One unrolled PageRank iteration as oracle CTE text."""
    p = i - 1
    return f"""c{i} AS (
        SELECT e.dst, CAST(r.rank / o.deg AS DECIMAL(38,12)) AS c
        FROM edges e
        JOIN r{p} r ON e.src = r.node
        JOIN outdeg o ON e.src = o.src
    ), s{i} AS (
        SELECT dst, CAST(SUM(c) AS DOUBLE) AS s FROM c{i} GROUP BY dst
    ), r{i} AS (
        SELECT node,
               0.15 / (SELECT n FROM nn) + 0.85 * coalesce(s, 0.0) AS rank
        FROM nodes LEFT JOIN s{i} ON node = dst
    )"""


@query(
    "graph_pagerank",
    oracle=f"""
    WITH edges AS (
        SELECT DISTINCT concat('c', CAST(o_custkey AS VARCHAR)) AS src,
                        concat('s', CAST(l_suppkey AS VARCHAR)) AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ), nodes AS (
        SELECT src AS node FROM edges UNION SELECT dst FROM edges
    ), nn AS (
        SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes
    ), outdeg AS (
        SELECT src, count(*) AS deg FROM edges GROUP BY src
    ), r0 AS (
        SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes
    ), {', '.join(_pr_iter_sql(i) for i in range(1, PR_ITERS + 1))}
    SELECT node, rank FROM r{PR_ITERS}
    """,
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer→supplier purchase graph (who supplies
    the best-connected demand), {PR_ITERS} fixed damped iterations, no
    dangling-mass redistribution (lost-mass variant: sink nodes leak
    their rank, which both engines compute identically — the variant
    choice is semantics, not error; redistribution adds one scalar
    broadcast per iteration when wanted).

    Scale shape: out-degree attaches to the edge list ONCE before the
    loop (r5: the first shape re-joined outdeg every iteration — 5
    redundant broadcast builds); each iteration is then a single
    edge⋈rank shuffled-hash join whose BUILD side is the |V|-row rank
    frame (per-partition build is |V|/P rows at any scale; the edge list
    streams) + a dst-keyed partial-aggregated sum + a left shuffled-hash
    join back to nodes. The fixed iteration count unrolls into ONE
    bounded declarative plan — r12 dropped the per-round localCheckpoint
    barriers (two eager jobs per round) after the 8x-scale A/B showed
    the fused form strictly faster; an unbounded-iteration variant would
    re-introduce checkpointing every ~10 rounds for lineage control.
    Hot destinations partial-combine map-side.

    Parity: contributions quantize to DECIMAL(38,12) BEFORE the sum
    (rank ~1e-4 → quantum/ulp ≈ 1e8, far above the conversion-disagree
    zone; sum exact and associative), and the damped update is IEEE
    mul/add on bit-identical operands; the oracle unrolls the same
    {PR_ITERS} iterations CTE-for-CTE.
    """
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    # r11 (guide §2.3, shuffle fewer bytes): DISTINCT runs on the raw
    # (o_custkey, l_suppkey) INTEGER pair — the "c{id}"/"s{id}" node
    # labels are built AFTER dedup from an injective per-column map, so
    # the distinct exchange carries two ints per row instead of two
    # strings and the output set is identical by construction.
    edges = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias(
                "src"
            ),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias(
                "dst"
            ),
        )
        .transform(stage)
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .transform(stage)
    )
    n = nodes.count()
    # attach out-degree to the edge frame ONCE — every iteration needs
    # rank[src]/deg[src], so carrying deg on the edge row saves one
    # broadcast join per iteration (same values, same oracle). r11: the
    # degree attaches via a src-partitioned window COUNT over the staged
    # edges (one exchange, no join build) instead of groupBy + equi-join
    # — same deg value on every edge row (guide §2.4: two operations
    # keyed the same way share one exchange).
    edge_deg = edges.withColumn(
        "deg", F.count(F.lit(1)).over(Window.partitionBy("src"))
    ).transform(stage)
    # r12 (guide §2.4/§3.1, VERDICT r11 item 7): the per-iteration
    # stage_iter barriers are gone — PR_ITERS is a small fixed constant,
    # so the unrolled 3-iteration plan stays bounded and the two eager
    # materialization jobs per round (localCheckpoint + its rescan)
    # disappear; and both per-iteration joins carry SHUFFLE_HASH hints
    # whose BUILD side is the |V|-row frame (rank resp. dst-sums — per
    # shuffle partition the build is |V|/P rows at any scale; the |E|-row
    # edge list stays the stream side), replacing two sort-merge sorts of
    # the edge fan-in per round. Values are untouched: barriers and join
    # hints change plan shape only. A/B at 1x/8x of sf0.1 (committed in
    # OPTIMIZATION_r12.md): 2.63/3.95 s -> 2.52/3.48 s, row-identical
    # output at both scales.
    r = nodes.withColumn("rank", F.lit(1.0 / n))
    for it in range(PR_ITERS):
        rr = r.hint("shuffle_hash")
        contrib = edge_deg.join(rr, edge_deg.src == rr.node).select(
            "dst",
            (F.col("rank") / F.col("deg"))
            .cast("decimal(38,12)")
            .alias("c"),
        )
        sums = contrib.groupBy("dst").agg(
            F.expr("CAST(SUM(c) AS DOUBLE)").alias("s")
        )
        ss = sums.hint("shuffle_hash")
        r = nodes.join(ss, nodes.node == ss.dst, "left").select(
            "node",
            (
                F.lit(0.15 / n)
                + F.lit(0.85) * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("rank"),
        )
    return r


# Minimum co-occurrence count for a co-purchase edge: support
# thresholding is the standard market-basket sparsifier — it keeps the
# graph density roughly flat as the corpus grows (incidental one-off
# pairings wash out; recurring pairings survive at every SF).
TRI_MIN_SUPPORT = 2


def _copurchase_pairs(li: DataFrame) -> DataFrame:
    """(u, v) co-purchase pair MULTISET, u < v, one row per unordered
    lineitem pair within an order — bit-identical to the original
    lineitem self-equi-join on l_orderkey with an l_partkey < l_partkey
    predicate, but derived with ONE exchange instead of two (r11
    optimization, guide §2.3/§2.4):

    - groupBy(l_orderkey).collect_list shuffles each lineitem row ONCE
      (key + partkey only); the self-join shape shuffled the same rows
      twice (once per join side — Spark reuses the exchange, but the
      join still sorts and streams both sides) and then re-shuffled the
      pair fan-out for the support aggregate.
    - pair fan-out happens INSIDE the map stage via array HOFs on the
      sorted per-order posting (positional slices emit exactly the
      j > i pairs of the ascending multiset, so u <= v by construction
      and the u != v filter leaves the strict u < v multiset — verified
      exactly equal to the self-join multiset at sf0.001/0.01/0.1).
    - NULL semantics match the join: NULL l_orderkey rows are dropped
      explicitly (an equi-join never matches NULL keys, but groupBy
      would form a NULL group), and collect_list drops NULL l_partkey
      exactly as the join's NULL-rejecting < predicate does.

    Fan-out stays bounded by order size (never n²), same as the join
    form. Measured at sf0.1: edges derivation 1.97 s → 1.26 s warm-best
    (pairs + support aggregate, noop sink).
    """
    return (
        li.filter(F.col("l_orderkey").isNotNull())
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list("l_partkey")).alias("ps"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) ->"
                    " transform(slice(ps, i + 2, size(ps) - i - 1),"
                    " y -> struct(x AS u, y AS v))))"
                )
            ).alias("p")
        )
        .select("p.u", "p.v")
        .filter(F.col("u") != F.col("v"))
    )


def _support_edges(li: DataFrame) -> DataFrame:
    """Support-thresholded co-purchase edge set shared by the census
    keys (triangle count, k-hop reach, assortativity): pair multiset →
    (u, v) support counts → edges with supp >= TRI_MIN_SUPPORT."""
    return (
        _copurchase_pairs(li)
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("supp"))
        .filter(F.col("supp") >= TRI_MIN_SUPPORT)
        .select("u", "v")
    )


@query(
    "graph_triangle_count",
    oracle=f"""
    WITH pairs AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), edges AS (
        SELECT u, v FROM pairs GROUP BY u, v
        HAVING count(*) >= {TRI_MIN_SUPPORT}
    ), deg AS (
        SELECT node, count(*) AS d FROM (
            SELECT u AS node FROM edges UNION ALL SELECT v FROM edges
        ) GROUP BY node
    ), tri AS (
        SELECT count(*) AS t
        FROM edges e1 JOIN edges e2 ON e1.v = e2.u
        JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
           (SELECT CAST(count(*) AS BIGINT) FROM edges) AS n_edges,
           (SELECT CAST(sum(d * (d - 1) / 2) AS BIGINT) FROM deg)
               AS n_wedges,
           (SELECT CAST(t AS BIGINT) FROM tri) AS n_triangles,
           (SELECT CASE WHEN w IS NULL OR w = 0 THEN CAST(NULL AS DOUBLE)
                ELSE CAST((600000000 * CAST(t AS HUGEINT) + w) // (2 * w)
                          AS DOUBLE) / CAST(100000000 AS DOUBLE) END
            FROM tri CROSS JOIN
                 (SELECT CAST(sum(d * (d - 1) / 2) AS HUGEINT) AS w
                  FROM deg))
               AS global_clustering
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the part co-purchase graph (parts ordered
    together in the same order, kept only above TRI_MIN_SUPPORT
    co-occurrences) — triangle count and global clustering coefficient
    are the standard cohesion diagnostics for any co-occurrence graph a
    pipeline derives (co-cited docs, co-clicked items, co-mentioned
    entities).

    Scale shape: the Spark plan is the degree-ordered orientation
    algorithm (Cohen's MapReduce formulation) — each undirected edge is
    oriented from its lower-(degree, id) endpoint to the higher, so
    every wedge is generated at its lowest-degree vertex and wedge
    fan-out is bounded by O(sqrt(m)) per node instead of the hub's full
    degree; the closure check is one equi-join of wedges against
    oriented edges on the (lo, hi) pair key. The oracle deliberately
    uses the independent id-ordered three-way-join formulation — both
    count each triangle exactly once. Pair generation groups lineitem
    by orderkey once and fans pairs out with array HOFs inside the map
    stage (_copurchase_pairs, r11 — bit-identical multiset to the old
    self-join, one exchange instead of two; fan-out stays bounded by
    order size, never n²), and support thresholding keeps |E| roughly
    flat as SF grows (measured: 2.4k/3.6k/3.9k edges at
    sf0.001/0.01/0.1). The degree frame is |V|
    rows — attached via plain equi-joins (AQE broadcasts it at runtime
    while small; a FORCED broadcast of a |V|-growing frame was the r7
    assortativity catch), so at a 100 TB edge list the deg attach is
    already the right shuffle shape with no code change.

    Parity: all counts are exact integers; the clustering ratio is the
    only division and quantizes through DECIMAL(14,8) on both sides."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # pair generation via _copurchase_pairs (r11: one exchange, HOF
    # fan-out inside the map stage — bit-identical multiset to the old
    # self-join; see the helper docstring for the measured numbers)
    edges = _support_edges(li).transform(stage)
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # orient every edge from its lower (degree, id) endpoint to the
    # higher; carry the dst endpoint's order key for wedge normalization
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    # no broadcast hint: |deg| = |V| grows with the graph (the r7
    # assortativity catch); AQE broadcasts at runtime while small
    keyed = edges.join(du, "u").join(dv, "v")
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = keyed.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("ddst"),
    ).transform(stage)
    # r11 (guide §3.1): both census joins take a shuffled-hash hint with
    # the EDGE-bounded frame as the build side (w1/closure are the
    # oriented edge list — |E| rows, AQE-bounded per partition; wedges
    # can be O(m^1.5) and must stay the stream side), skipping SMJ's
    # partition sorts. Measured at sf0.1: wedge+closure core 3.31 s →
    # 2.43 s warm-best.
    w1 = oriented.select(
        "src", F.col("dst").alias("x"), F.col("ddst").alias("dx")
    ).hint("shuffle_hash")
    w2 = oriented.select(
        "src", F.col("dst").alias("y"), F.col("ddst").alias("dy")
    )
    x_first = (F.col("dx") < F.col("dy")) | (
        (F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y"))
    )
    wedges = (
        w1.join(w2, "src")
        .filter(F.col("x") != F.col("y"))
        .filter(x_first)
        .select(F.col("x").alias("lo"), F.col("y").alias("hi"))
    )
    closure = oriented.select(
        F.col("src").alias("lo"), F.col("dst").alias("hi")
    ).hint("shuffle_hash")
    tri = wedges.join(closure, ["lo", "hi"]).agg(
        F.count(F.lit(1)).alias("t")
    )
    stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long").alias(
            "n_wedges"
        ),
    )
    ecount = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        stats.crossJoin(F.broadcast(ecount))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            F.col("t").alias("n_triangles"),
            # EXACT integer restatement of round-half-up(3t/w, 8dp)
            # (r10, VERDICT r9 item 2): the old CAST(3.0*t/w AS
            # DECIMAL(14,8)) drew one midpoint-lottery ticket per run
            # (double -> decimal rounds shortest-repr-HALF_UP in Spark
            # vs exact-binary in DuckDB) and was the last hunt site not
            # certified at the 100x octave. round_half_up(3e8*t/w) =
            # (6e8*t + w) DIV (2w) for non-negative ints — pure integer
            # arithmetic, NO rounding discretion in either engine at ANY
            # scale. Ranges: 3t <= w (a triangle closes 3 wedges), so
            # the quotient <= 1e8 + 1 and CAST-to-double is exact; the
            # DECIMAL(9,0)*DECIMAL(28,0) product keeps Spark's result
            # precision at 9+28+1 = 38 (no silent demotion — the r9
            # benford ADVICE class). Effective range: t and n_wedges are
            # BIGINT counts upstream, so the real bounds are t <= ~9.2e18
            # and 2*n_wedges <= ~9.2e18 (n_wedges <= ~4.6e18) — the
            # decimal headroom past that is unreachable by construction;
            # it exists only so the product can never demote.
            F.expr(
                "CASE WHEN n_wedges = 0 THEN CAST(NULL AS DOUBLE)"
                " ELSE CAST((CAST(600000000 AS DECIMAL(9,0))"
                "            * CAST(t AS DECIMAL(28,0))"
                "            + n_wedges) DIV (2 * n_wedges) AS DOUBLE)"
                "      / CAST(100000000 AS DOUBLE) END"
            ).alias("global_clustering"),
        )
    )


# BFS seeds: a deterministic ~1% of parts; 3 unrolled frontier hops.
KHOP_SEED_MOD = 97
KHOP_HOPS = 3


def _khop_edges_sql() -> str:
    return f"""edges AS (
        SELECT u, v FROM (
            SELECT a.l_partkey AS u, b.l_partkey AS v
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
        ) GROUP BY u, v HAVING count(*) >= {TRI_MIN_SUPPORT}
    ), adj AS (
        SELECT u AS src, v AS dst FROM edges
        UNION ALL SELECT v, u FROM edges
    )"""


@query(
    "graph_khop_reach",
    oracle=f"""
    WITH {_khop_edges_sql()},
    nodes AS (SELECT DISTINCT src AS node FROM adj),
    d0 AS (
        SELECT node FROM nodes WHERE node % {KHOP_SEED_MOD} = 0
    ), d1 AS (
        SELECT DISTINCT a.dst AS node FROM adj a JOIN d0 ON a.src = d0.node
        WHERE a.dst NOT IN (SELECT node FROM d0)
    ), d2 AS (
        SELECT DISTINCT a.dst AS node FROM adj a JOIN d1 ON a.src = d1.node
        WHERE a.dst NOT IN (SELECT node FROM d0)
          AND a.dst NOT IN (SELECT node FROM d1)
    ), d3 AS (
        SELECT DISTINCT a.dst AS node FROM adj a JOIN d2 ON a.src = d2.node
        WHERE a.dst NOT IN (SELECT node FROM d0)
          AND a.dst NOT IN (SELECT node FROM d1)
          AND a.dst NOT IN (SELECT node FROM d2)
    )
    SELECT hop, CAST(n_reached AS BIGINT) AS n_reached,
           CAST(min_node AS BIGINT) AS min_node,
           CAST(max_node AS BIGINT) AS max_node
    FROM (
        SELECT 0 AS hop, count(*) AS n_reached, min(node) AS min_node,
               max(node) AS max_node FROM d0
        UNION ALL SELECT 1, count(*), min(node), max(node) FROM d1
        UNION ALL SELECT 2, count(*), min(node), max(node) FROM d2
        UNION ALL SELECT 3, count(*), min(node), max(node) FROM d3
    )
    """,
)
def graph_khop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-hop reach (BFS frontier sizes) from a seed set over the
    co-purchase graph — the impact-radius query ("what does a recall of
    these parts touch within 3 degrees?"), per-hop reach counts with id
    bounds. Same support-thresholded edge set as graph_triangle_count;
    seeds are parts ≡0 mod {KHOP_SEED_MOD}.

    Scale shape: textbook frontier BFS on joins — each hop is ONE
    equi-join of the (tiny) frontier against the src-keyed adjacency
    list plus an anti-join against the visited set, localCheckpointed
    between hops (the graph_pagerank plan-growth stance). Frontier and
    visited frames are |V|-bounded — orders smaller than edges — so
    every hop broadcasts them against the one big adjacency exchange. A
    fixed hop count unrolls declaratively; the oracle unrolls the same
    hops as NOT-IN CTEs.

    Parity: exact integer node ids and counts throughout."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # r11: shared HOF pair derivation (see _copurchase_pairs)
    edges = _support_edges(li)
    adj = (
        edges.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .unionAll(
            edges.select(F.col("v").alias("src"), F.col("u").alias("dst"))
        )
        .transform(stage)
    )
    frontier = (
        adj.select(F.col("src").alias("node"))
        .distinct()
        .filter(F.col("node") % KHOP_SEED_MOD == 0)
        .transform(stage)
    )
    visited = frontier
    layers = [frontier]
    for _ in range(KHOP_HOPS):
        nxt = (
            adj.join(F.broadcast(frontier), adj.src == frontier.node)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(F.broadcast(visited), "node", "left_anti")
            .transform(stage_iter)
        )
        layers.append(nxt)
        # r11: visited is a ≤KHOP_HOPS-way union of ALREADY-staged layer
        # blocks — re-staging the union re-materialized data that was
        # materialized one line above (one extra eager job per hop for
        # nothing). The union plan is bounded by the fixed hop count.
        visited = visited.unionAll(nxt)
        frontier = nxt
    out = None
    for hop, layer in enumerate(layers):
        s = layer.agg(
            F.lit(hop).alias("hop"),
            F.count(F.lit(1)).alias("n_reached"),
            F.min("node").alias("min_node"),
            F.max("node").alias("max_node"),
        ).select("hop", "n_reached", "min_node", "max_node")
        out = s if out is None else out.unionAll(s)
    return out


# Posting cap for the bipartite projection: each part contributes at most
# this many customers (lowest custkeys — deterministic), so a part bought
# by everyone generates cap² pairs, never corpus².
BIPROJ_CAP = 20
BIPROJ_MIN_COMMON = 2


@query(
    "graph_bipartite_projection",
    oracle=f"""
    WITH bp AS (
        SELECT DISTINCT l_partkey AS part, o_custkey AS cust
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    capped AS (
        SELECT part, cust FROM (
            SELECT part, cust,
                   ROW_NUMBER() OVER (PARTITION BY part ORDER BY cust)
                       AS rn
            FROM bp
        ) WHERE rn <= {BIPROJ_CAP}
    )
    SELECT a.cust AS cust_a, b.cust AS cust_b,
           CAST(COUNT(*) AS BIGINT) AS n_common_parts
    FROM capped a JOIN capped b
      ON a.part = b.part AND a.cust < b.cust
    GROUP BY a.cust, b.cust
    HAVING COUNT(*) >= {BIPROJ_MIN_COMMON}
    """,
)
def graph_bipartite_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite projection (item-item / user-user co-occurrence): fold
    the customer×part purchase graph onto one side — customer pairs that
    share ≥{BIPROJ_MIN_COMMON} parts, the candidate-edge generator behind
    collaborative filtering, co-citation networks, and audience-overlap
    analysis.

    Scale shape: the projection's classic failure is the hub — one part
    bought by a million customers emits 10¹² pairs. The engine applies
    the llm_dedup_ngram posting-cap discipline: each part's customer
    posting is truncated to its {BIPROJ_CAP} lowest custkeys by a
    dense_rank window BEFORE the self-equi-join, bounding pair fan-out at
    cap²·|parts| (deterministic truncation = deterministic result, and
    the cap is the recall dial exactly as in the dedup family). Pair
    counting partial-combines map-side; the min-common gate prunes the
    reducer output. At 100 TB the cap moves to a weighted-sample posting
    (keep the cap² bound, debias the counts) — same plan.

    The r4 probe flagged the original shape's (part, cust) DISTINCT
    exchange as the one input-proportional shuffle (VERDICT r4 item 5).
    Fixed by fusing dedup into the cap: dense_rank over the RAW pair
    multiset ranks distinct custs directly (ties share a rank), so the
    bulk data crosses the wire ONCE — hash-partitioned by part for the
    window — and the post-cap dedup's groupBy(part, cust) reuses that
    partitioning (part ⊆ {{part, cust}} satisfies its clustered
    distribution: zero additional exchange, and it dedups only the
    cap-survivor slice instead of the full multiset).

    Parity: dense_rank ≤ cap selects exactly the {BIPROJ_CAP} lowest
    DISTINCT custkeys per part — the same set the oracle's
    distinct-then-row_number picks; everything downstream is exact
    integer counting — no floats anywhere."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    bp = o.join(li, o.o_orderkey == li.l_orderkey).select(
        F.col("l_partkey").alias("part"), F.col("o_custkey").alias("cust")
    )
    w = Window.partitionBy("part").orderBy("cust")
    capped = (
        bp.withColumn("rk", F.dense_rank().over(w))
        .filter(F.col("rk") <= BIPROJ_CAP)
        .groupBy("part", "cust")  # exchange-free: reuses part partitioning
        .agg(F.count(F.lit(1)).alias("_dup"))
        .select("part", "cust")
        .transform(stage)
    )
    # r11 (guide §3.1): shuffled-hash hint on the pair self-join — the
    # build side is one hash-partition of the CAPPED posting frame (the
    # BIPROJ_CAP discipline bounds posting length, AQE bounds partition
    # bytes), so the per-task hash build is memory-safe at any scale and
    # skips SMJ's two partition sorts. Measured at sf0.1: 4.2 s → 3.1 s
    # warm for the join+agg tail.
    a, b = capped.alias("a").hint("shuffle_hash"), capped.alias("b")
    return (
        a.join(
            b,
            (F.col("a.part") == F.col("b.part"))
            & (F.col("a.cust") < F.col("b.cust")),
        )
        .groupBy(
            F.col("a.cust").alias("cust_a"), F.col("b.cust").alias("cust_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common_parts"))
        .filter(F.col("n_common_parts") >= BIPROJ_MIN_COMMON)
    )


@query(
    "graph_assortativity",
    oracle=f"""
    WITH pairs AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), edges AS (
        SELECT u, v FROM pairs GROUP BY u, v
        HAVING count(*) >= {TRI_MIN_SUPPORT}
    ), deg AS (
        SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
            SELECT u AS node FROM edges UNION ALL SELECT v FROM edges
        ) GROUP BY node
    ), m AS (
        SELECT CAST(SUM(du.d * dv.d) AS BIGINT) AS s_jk,
               CAST(SUM(du.d + dv.d) AS BIGINT) AS s_j,
               CAST(SUM(du.d * du.d + dv.d * dv.d) AS BIGINT) AS s_jj,
               CAST(COUNT(*) AS BIGINT) AS n_edges
        FROM edges e
        JOIN deg du ON e.u = du.node
        JOIN deg dv ON e.v = dv.node
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
           n_edges, s_jk, s_j, s_jj,
           CAST(CAST(2 * n_edges * 2 * s_jk - s_j * s_j AS DOUBLE)
                / CAST(2 * n_edges * s_jj - s_j * s_j AS DOUBLE)
                AS DOUBLE) AS assortativity
    FROM m
    """,
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the part co-purchase graph (Newman 2002):
    the Pearson correlation of endpoint degrees across edges — positive
    means hubs link to hubs (social-network shape), negative means
    hub-and-spoke (catalog/infrastructure shape). The one-number
    mixing diagnostic that tells a recommender team which graph family
    their co-occurrence structure belongs to, completing the graph
    suite's global metrics beside clustering (triangle census).

    Newman's r over the 2M directed endpoint pairs reduces to pure
    INTEGER moments: r = (4M*S_jk - S_j^2) / (2M*S_jj - S_j^2) with
    S_jk = Sigma du*dv, S_j = Sigma (du+dv), S_jj = Sigma (du^2+dv^2)
    over undirected edges.

    Parity: every moment is an exact BIGINT (degrees are counts); the
    statistic is ONE division of exact integer-derived doubles —
    correctly rounded, bit-identical, no quantization, and no FMA risk
    (the product-difference happens in exact integer space, not
    doubles). Overflow headroom: |4M*S_jk| < 2^63 up to ~1e9-edge
    graphs at these degree ranges; past that, promote the moments to
    DECIMAL(38,0) — same plan.

    Scale shape: identical edge derivation to graph_triangle_count
    (order-bounded pair fan-out, support threshold keeps |E| flat);
    the degree frame attaches via plain equi-joins on the endpoint keys
    (AQE broadcasts it at runtime while it is small; |V| grows with the
    graph, so a FORCED broadcast is a scale bug — measured r7); the
    moment aggregate is one row. Linear with the edge census.
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # edges feeds FIVE consumers (du, dv, the moment probe, and deg's two
    # union branches): checkpoint so the pair fan-out + support aggregate
    # run once (the triangle-count discipline — without this the plan
    # re-derived the pipeline per consumer: 14 scans, r5 plan audit).
    # r11: shared HOF pair derivation (see _copurchase_pairs).
    edges = _support_edges(li).transform(stage)
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.expr("CAST(count(*) AS BIGINT)").alias("d"))
        .transform(stage)
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    # NO broadcast hint on the degree attach: |deg| = |V| grows with the
    # graph, so a forced broadcast builds an ever-larger hash map (the r7
    # 32× probe read 6.3× wall on the 8→32 leg from exactly this; hint
    # removed → 1.5× on the same leg). AQE still picks BHJ at runtime
    # when the degree frame is actually small (every fixture scale).
    m = (
        edges.join(du, "u")
        .join(dv, "v")
        .agg(
            F.expr("CAST(SUM(du * dv) AS BIGINT)").alias("s_jk"),
            F.expr("CAST(SUM(du + dv) AS BIGINT)").alias("s_j"),
            F.expr("CAST(SUM(du * du + dv * dv) AS BIGINT)").alias("s_jj"),
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_edges"),
        )
    )
    n_nodes = deg.agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_nodes"))
    return (
        m.crossJoin(F.broadcast(n_nodes))
        .select(
            "n_nodes",
            "n_edges",
            "s_jk",
            "s_j",
            "s_jj",
            F.expr(
                """CAST(CAST(2 * n_edges * 2 * s_jk - s_j * s_j AS DOUBLE)
                   / CAST(2 * n_edges * s_jj - s_j * s_j AS DOUBLE)
                   AS DOUBLE)"""
            ).alias("assortativity"),
        )
    )
