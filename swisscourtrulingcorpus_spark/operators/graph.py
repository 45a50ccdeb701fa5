"""Graph analytics over edge tables: PageRank (power iteration) and
degree statistics.

Motivation from the reference: criticality ranks rulings by raw
weighted citation counts (`criticality_dataset_creator.py:303-320`,
ported as `citation_frequency`/`time_decay`) — PageRank is the
authority-score generalization a doc2doc retrieval corpus wants, and
the second iterative-algorithm shape in the engine next to
label-propagation connected components
(`operators/dedup.py::transitive_dedup_clusters`).

Scale shape per iteration: one equi-join ranks⋈edges on src (ranks is
(nodes, 2 cols) — co-partition or broadcast by size), one groupBy(dst)
sum, plus two scalar aggregates (dangling mass, delta) that reduce to
the driver.  Lineage is truncated every iteration with an EAGER
``localCheckpoint`` — without it the plan doubles per iteration and
the optimizer chokes long before 20 iterations (the classic iterative-
DataFrame pitfall).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degree_stats(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """(node, out_degree, in_degree) — one pass per direction."""
    out = edges.groupBy(F.col(src).alias("node")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    inn = edges.groupBy(F.col(dst).alias("node")).agg(
        F.count(F.lit(1)).alias("in_degree")
    )
    return (
        out.join(inn, on="node", how="full")
        .select(
            "node",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
    )


def pagerank(
    edges: DataFrame,
    src: str,
    dst: str,
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float = 1e-9,
) -> DataFrame:
    """PageRank with dangling-mass redistribution; ranks sum to 1.
    Returns (node, rank).  Converges when the L1 delta drops under
    ``tol`` (checked each iteration — two cheap scalar aggregates)."""
    # materialize the loop-invariant frames ONCE — without this every
    # iteration re-runs the edge scan + distinct and the union+distinct
    # of nodes (the checkpoint also truncates their lineage)
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    outdeg = (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).alias("outdeg"))
        .localCheckpoint(eager=True)
    )
    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint(eager=True)

    for _ in range(max_iter):
        with_deg = ranks.join(
            outdeg, ranks["node"] == outdeg["src"], "left"
        ).select("node", "rank", "outdeg")
        dangling = (
            with_deg.where(F.col("outdeg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        contribs = (
            e.join(with_deg.where(F.col("outdeg").isNotNull()),
                   e["src"] == F.col("node"))
            .select("dst", (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        base = (1.0 - damping) / n + damping * dangling / n
        new_ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        delta = (
            new_ranks.join(ranks.withColumnRenamed("rank", "old"), on="node")
            .agg(F.sum(F.abs(F.col("rank") - F.col("old"))))
            .collect()[0][0]
        )
        ranks = new_ranks
        if delta is not None and delta < tol:
            break
    return ranks


def integer_pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    scale: int = 1_000_000,
    damping_pct: int = 85,
) -> DataFrame:
    """Fixed-point PageRank: every score is a micro-int and every
    update is integer arithmetic —
    ``new = (1-d)*scale + (d_pct * sum(score // out_deg)) // 100`` —
    so a fixed-iteration run is bit-identical across engines and can
    be HASH-GATED against a chained-CTE SQL oracle (the float
    `pagerank` above is numpy-cross-checked only; this variant makes
    the iterative-algorithm class oracle-checkable).  Requires every
    node to appear as a source (e.g. a bidirectionalized edge list):
    no dangling mass, which is what keeps the integer update closed.
    A source node with no in-edges is legal under that contract — it
    is re-seeded at the base score each iteration (its true fixed
    point: nothing contributes to it), NOT dropped, so its outgoing
    contributions keep flowing in later iterations.

    Scale shape: per iteration one co-partitioned join on ``src`` and
    one groupBy on ``dst`` — shuffled rows are (node, int) pairs; the
    plan is cut per iteration with localCheckpoint (same lineage
    truncation as `pagerank`).
    """
    deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("__deg"))
    nodes = deg.select(F.col(src).alias("node")).localCheckpoint(eager=False)
    scores = nodes.select("node", F.lit(scale).cast("long").alias("s"))
    base = (100 - damping_pct) * scale // 100
    for _ in range(iters):
        contrib = (
            edges.join(scores, edges[src] == scores["node"])
            .join(deg, on=src)
            .select(
                F.col(dst).alias("node"),
                F.expr("s DIV __deg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("__sc"))
        )
        # left join from the full node set: a node nobody cites still
        # gets the base score (dropping it would erase its OUTGOING
        # contributions from the next iteration — silently wrong ranks)
        scores = (
            nodes.join(contrib, on="node", how="left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_pct} * coalesce(__sc, 0L)) DIV 100"
                    )
                ).alias("s"),
            )
            .localCheckpoint(eager=False)
        )
    return scores.select("node", F.col("s").alias("score_micro"))


def connected_components_bigstar(
    pairs: DataFrame,
    left_col: str = "id_a",
    right_col: str = "id_b",
    max_phases: int = 40,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al. 2014, "Connected Components in MapReduce and
    Beyond", public) — the LOG-round counterpart of
    `operators/dedup.py::transitive_dedup_clusters`' min-label
    propagation, whose round count is the cluster DIAMETER.  Near-dup
    clusters are shallow, so propagation is fine there; citation /
    link graphs are not — a 10^6-hop chain needs ~10^6 propagation
    rounds but only ~log^2 phases here, because each star step
    rewires whole neighbourhoods at the component minimum instead of
    moving labels one hop.

    large-star: per node u over the symmetric neighbourhood, with
    m = min(N(u) ∪ {u}), rewire every LARGER neighbour to m.
    small-star: per node u over min-oriented edges (all neighbours
    < u), rewire every neighbour (and u) to m.  Both phases are one
    groupBy(node).min + one join back — every shuffled row is a
    (bigint, bigint) pair, payloads never move.  Lineage is cut per
    phase with an eager localCheckpoint (same iterative-DataFrame
    pitfall as `pagerank`), and convergence is detected with a
    two-scalar aggregate (edge count + order-independent bit_xor of
    per-edge hashes — xor cannot overflow under ANSI mode, unlike a
    hash SUM), not a materialized set-difference.

    Returns (node, cluster) with cluster = min node id of the
    component — bit-identical to `transitive_dedup_clusters` on the
    same input (test-asserted), so the two are interchangeable and
    callers pick by graph shape.
    """
    nodes = (
        pairs.select(F.col(left_col).cast("long").alias("n"))
        .union(pairs.select(F.col(right_col).cast("long").alias("n")))
        .distinct()
    )
    edges = (
        pairs.select(
            F.col(left_col).cast("long").alias("a"),
            F.col(right_col).cast("long").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .select(
            F.greatest("a", "b").alias("hi"), F.least("a", "b").alias("lo")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _stats(e: DataFrame) -> tuple:
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.expr("bit_xor(xxhash64(hi, lo))"), F.lit(0)
            ).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    def _large_star(e: DataFrame) -> DataFrame:
        bi = e.select(F.col("hi").alias("u"), F.col("lo").alias("v")).union(
            e.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
        )
        m = bi.groupBy("u").agg(F.min("v").alias("mv"))
        m = m.select("u", F.least("u", "mv").alias("m"))
        return (
            bi.join(m, on="u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
            .where(F.col("hi") != F.col("lo"))
            .distinct()
        )

    def _small_star(e: DataFrame) -> DataFrame:
        m = e.groupBy("hi").agg(F.min("lo").alias("m"))
        j = e.join(m, on="hi")
        rewired = j.where(F.col("lo") != F.col("m")).select(
            F.col("lo").alias("hi"), F.col("m").alias("lo")
        )
        anchors = j.select("hi", F.col("m").alias("lo"))
        return rewired.union(anchors).where(F.col("hi") != F.col("lo")).distinct()

    prev = _stats(edges)
    converged = False
    for _ in range(max_phases):
        edges = _large_star(edges).localCheckpoint(eager=True)
        edges = _small_star(edges).localCheckpoint(eager=True)
        cur = _stats(edges)
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        # falling through without a fixpoint means the edge set is NOT
        # a star graph, so the min-per-hi label extraction below would
        # return a node's current min NEIGHBOR as its "cluster" —
        # silently splitting components.  Wrong-but-quiet is the worst
        # failure mode for a dedup backbone; fail loudly instead
        # (Kiveris et al. bound phases at O(log^2 n), so a legitimate
        # graph that trips this just needs a larger max_phases).
        raise RuntimeError(
            f"connected_components_bigstar did not converge within "
            f"{max_phases} phases — raise max_phases"
        )
    labels = edges.groupBy(F.col("hi").alias("node")).agg(
        F.min("lo").alias("cluster")
    )
    lone = nodes.join(labels, nodes["n"] == labels["node"], "left_anti").select(
        F.col("n").alias("node"), F.col("n").alias("cluster")
    )
    return labels.union(lone)


def integer_hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    scale: int = 1_000_000,
) -> DataFrame:
    """Fixed-point HITS (Kleinberg 1999, public) on a DIRECTED graph:
    authorities a = A'h, hubs h = A a, re-normalized each half-step by
    integer division with the current maximum (``s * scale DIV max``)
    so every score stays a micro-int in [0, scale] and a
    fixed-iteration run is bit-identical across engines — the third
    member of the oracle-gated iterative-algorithm class after
    `integer_pagerank` and the star CC.

    The max-normalizers are 1-row aggregates broadcast back into the
    plan (the TF-IDF doc-count scalar pattern — deliberate tiny
    cross-joins), so the loop is pure DataFrame ops with no driver
    collect.  Per iteration: two co-partitioned joins + two groupBys
    over (node, int) rows.  Returns (node, kind, score_micro) with
    kind 'hub' (src side) / 'auth' (dst side).
    """
    if iters < 1:
        raise ValueError("integer_hits needs iters >= 1")
    import math

    half = math.isqrt(scale)
    if half * half != scale:
        raise ValueError("scale must be a perfect square (staged division)")

    def _norm(raw: str) -> str:
        # EXACTLY raw * scale DIV __m, but staged so no intermediate
        # exceeds int64 (raw * 1e6 wraps once a node's in-degree tops
        # ~9.2e6 — Spark wraps silently with ANSI off and raises with
        # it on; r06 review).  Identity: with r = raw % __m and
        # t = r * 1000,  raw*1e6 DIV m = (raw DIV m)*1e6
        # + (t DIV m)*1000 + ((t % m)*1000) DIV m — verified over 2e5
        # random cases; safe for __m up to ~9.2e15 (max in-degree
        # ~9.2e9).  Values are bit-identical to the naive form, so the
        # oracle needs no change (DuckDB already computes in int128).
        return (
            f"({raw} DIV __m) * {scale}"
            f" + ((({raw} % __m) * {half}) DIV __m) * {half}"
            f" + (((({raw} % __m) * {half}) % __m) * {half}) DIV __m"
        )

    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).distinct()
    hubs = (
        e.select(F.col("s").alias("node")).distinct()
        .withColumn("h", F.lit(scale).cast("long"))
        .localCheckpoint(eager=False)
    )
    for _ in range(iters):
        auth = (
            e.join(hubs, e["s"] == hubs["node"])
            .groupBy(F.col("d").alias("node"))
            .agg(F.sum("h").alias("a_raw"))
        )
        amax = auth.agg(F.max("a_raw").alias("__m"))
        auths = (
            auth.crossJoin(F.broadcast(amax))
            .select("node", F.expr(_norm("a_raw")).alias("a"))
            .localCheckpoint(eager=False)
        )
        hub = (
            e.join(auths, e["d"] == auths["node"])
            .groupBy(F.col("s").alias("node"))
            .agg(F.sum("a").alias("h_raw"))
        )
        hmax = hub.agg(F.max("h_raw").alias("__m"))
        hubs = (
            hub.crossJoin(F.broadcast(hmax))
            .select("node", F.expr(_norm("h_raw")).alias("h"))
            .localCheckpoint(eager=False)
        )
    return hubs.select(
        "node", F.lit("hub").alias("kind"), F.col("h").alias("score_micro")
    ).unionByName(
        auths.select(
            "node", F.lit("auth").alias("kind"), F.col("a").alias("score_micro")
        )
    )


def k_core(
    pairs: DataFrame,
    k: int,
    left_col: str = "id_a",
    right_col: str = "id_b",
    max_rounds: int = 30,
) -> DataFrame:
    """k-core decomposition for a FIXED k: iteratively peel every node
    of degree < k until the remaining subgraph is the (unique, maximal)
    k-core — the degeneracy-based dense-substructure primitive next to
    the triangle/clustering family (Seidman 1983, public).  Returns
    (node, core_degree) for core members, degree measured WITHIN the
    converged core.

    Scale shape: each round is one map-side-combined degree count over
    the surviving edge list plus two semi-joins filtering edges to
    surviving endpoints — every shuffled row a (bigint, bigint) pair;
    lineage cut per round with eager localCheckpoints (the iterative-
    DataFrame rule).  Round count is the peeling DEPTH of the graph
    (cascades), not its size; the fixed cap raises a loud error instead
    of silently returning a non-core (the big-star convergence
    contract).  Full coreness (per-node max k) would run this once per
    k or use the h-index iteration; the fixed-k form is the bounded-
    round building block curation actually calls ("keep documents in a
    densely cross-citing cluster").
    """
    e = pairs.select(
        F.col(left_col).cast("long").alias("a"),
        F.col(right_col).cast("long").alias("b"),
    ).where(F.col("a") != F.col("b"))
    # symmetrize once: degree = outdegree over the symmetric list
    e = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_prev = -1
    # max_rounds + 1: convergence needs one CONFIRMING no-change round
    # after the last peel, so a graph of peeling depth exactly
    # max_rounds must still be allowed its fixed-point check
    # (review r07 follow-up: off-by-one raised a false non-convergence)
    for _ in range(max_rounds + 1):
        deg = e.groupBy("a").agg(F.count(F.lit(1)).alias("core_degree"))
        keep = deg.where(F.col("core_degree") >= k).localCheckpoint(eager=True)
        n_now = keep.count()  # bounded scalar per round
        if n_now == n_prev:
            # no node peeled this round: every survivor has degree >= k
            return keep.select(F.col("a").alias("node"), "core_degree")
        n_prev = n_now
        if n_now == 0:
            return keep.select(F.col("a").alias("node"), "core_degree")
        ids = keep.select("a")
        e = (
            e.join(ids, on="a", how="left_semi")
            .join(ids.select(F.col("a").alias("b")), on="b", how="left_semi")
            .localCheckpoint(eager=True)
        )
    raise RuntimeError(
        f"k_core(k={k}) did not converge within {max_rounds} rounds — "
        f"{n_now} nodes still surviving (not yet confirmed as a core); "
        "raise max_rounds (peeling depth exceeds the cap; silent "
        "partial cores are never returned)"
    )


def coreness(
    pairs: DataFrame,
    left_col: str = "id_a",
    right_col: str = "id_b",
    max_rounds: int = 50,
) -> DataFrame:
    """FULL coreness decomposition — per-node maximum k such that the
    node survives k-core peeling — via the h-index iteration (Lü et
    al. 2016, "The H-index of a network node and its relation to
    degree and coreness", Nat. Commun., public): start every node at
    c(v) = degree(v) and repeatedly set c(v) to the H-index of its
    neighbors' current values; the sequence is monotone non-increasing
    and its fixed point IS the coreness.  The general form `k_core`'s
    docstring names as missing — curation ranks documents by
    citation-cluster density with the per-node value, not one fixed k.

    Scale shape per round: one equi-join of the symmetric edge list
    with the (node, c) table on the neighbor key, then the H-index per
    node as max(least(rank, neighbor_c)) over a per-node window — the
    textbook "h = largest h with h values >= h" computed in one pass
    over DESC-sorted neighbor values.  Every shuffled row is slim
    (bigint, bigint); partitions key on node ids (high cardinality, no
    global sort); lineage is cut per round with eager localCheckpoints
    and the convergence probe is a node-table-sized count.  Round
    count is bounded by the peeling depth (cascade length), NOT graph
    size; the cap raises a loud error — partial decompositions are
    never returned (the k_core/big-star convergence contract).

    Returns (node, coreness) for every node incident to an edge.
    """
    from pyspark.sql import Window

    e = pairs.select(
        F.col(left_col).cast("long").alias("a"),
        F.col(right_col).cast("long").alias("b"),
    ).where(F.col("a") != F.col("b"))
    e = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    cur = (
        e.groupBy(F.col("a").alias("node"))
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("a").orderBy(F.desc("c"), F.asc("b"))
    for _ in range(max_rounds):
        nxt = (
            e.join(cur, e["b"] == cur["node"])
            .select("a", "b", "c")
            .withColumn("__r", F.row_number().over(w))
            .groupBy(F.col("a").alias("node"))
            .agg(F.max(F.least(F.col("__r").cast("long"), F.col("c"))).alias("c"))
            .localCheckpoint(eager=True)
        )
        changed = (
            nxt.join(cur.select(F.col("node"), F.col("c").alias("__p")), on="node")
            .where(F.col("c") != F.col("__p"))
            .count()
        )
        cur = nxt
        if changed == 0:
            return cur.select("node", F.col("c").alias("coreness"))
    raise RuntimeError(
        f"coreness() did not converge within {max_rounds} rounds — "
        f"{changed} nodes still decreasing; raise max_rounds (cascade "
        "depth exceeds the cap; partial decompositions are never "
        "returned)"
    )
