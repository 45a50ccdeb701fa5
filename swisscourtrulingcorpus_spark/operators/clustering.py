"""K-means clustering + IVF / product-quantization ANN — the learned
scale path for similarity search.

`operators/similarity.py` covers the exact baseline (brute-force
cosine) and the hash-bucketed approximations (hyperplane LSH, the
fixture ``label`` standing in for a coarse assignment).  This module
supplies the remaining production ANN layer a 100 TB corpus needs:

- ``kmeans_fit``: Lloyd's iterations expressed as DataFrame programs —
  centroids broadcast to executors (k x dim doubles, bounded), the
  assignment an argmin over a broadcast join, the recompute a
  posexplode + per-(cluster, dimension) average.  Only k x dim numbers
  ever return to the driver per iteration; the corpus streams.
- ``assign_clusters``: one scan, broadcast centroids, deterministic
  argmin (ties break to the smallest cluster id via struct-min) — the
  IVF coarse quantizer.
- ``ivf_topk``: multi-probe IVF search — each query probes its
  ``nprobe`` nearest centroids, candidates come from an equi-join on
  the cluster id (never a cross join against the corpus).
- ``pq_codebooks_from_rows`` / ``pq_encode`` / ``pq_topk_adc``:
  product quantization — vectors become m small codes; search scans
  codes with a broadcast (subspace, code) -> partial-distance lookup
  table (asymmetric distance computation).  At 100 TB the code table
  is ~64x smaller than the raw embeddings and the scan never touches
  the float vectors.

Distance arithmetic reuses the sequential-fold dot product from
`operators/similarity.py` (verified bit-identical to DuckDB's
``list_dot_product``), so the assignment/encoding gates hash-match the
oracle exactly.  Squared L2 is computed as ``c.c - 2 a.c`` — the
``a.a`` term is constant per row and cannot change the argmin, and
dropping it keeps every compared double a two-flop combination of
oracle-identical folds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from swisscourtrulingcorpus_spark.operators.similarity import _dot, _norm


def _ranked_topk(df: DataFrame, order: list, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(*order)
    return df.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def _centroid_df(
    spark: SparkSession, centroids: list[list[float]], prefix: str = "c"
) -> DataFrame:
    """(cluster, cvec, cnorm2) literal DataFrame for broadcasting.
    ``cnorm2`` is the self-dot computed with the same fold the oracle
    uses, so downstream scores stay bit-comparable."""
    rows = [(i, [float(x) for x in c]) for i, c in enumerate(centroids)]
    df = spark.createDataFrame(rows, f"{prefix}id int, cvec array<double>")
    return df.withColumn("cnorm2", _dot(F.col("cvec"), F.col("cvec")))


def _score(vec_col: str) -> F.Column:
    """Rank-equivalent squared L2 to the joined centroid: c.c - 2 a.c."""
    return F.col("cnorm2") - F.lit(2.0) * _dot(F.col(vec_col), F.col("cvec"))


def assign_clusters(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """IVF coarse assignment: nearest centroid per row, ties to the
    smallest cluster id.  Broadcast join (centroids are k x dim — always
    driver-bounded) + struct-min argmin; the corpus is scanned once and
    never shuffled."""
    spark = df.sparkSession
    cents = _centroid_df(spark, centroids)
    scored = df.join(F.broadcast(cents)).select(
        id_col,
        F.struct(_score(vec_col).alias("score"), F.col("cid").alias("cluster")).alias(
            "__sc"
        ),
    )
    return (
        scored.groupBy(id_col)
        .agg(F.min("__sc").alias("__best"))
        .select(id_col, F.col("__best.cluster").alias("cluster"))
    )


def kmeans_fit(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int,
    max_iter: int = 10,
    tol: float = 1e-6,
) -> tuple[list[list[float]], float]:
    """Lloyd's k-means over an embedding column.

    Deterministic init — the vectors of the ``k`` smallest ids (k rows
    collected; bounded).  Each iteration: broadcast-assign, then
    recompute centroids as the per-(cluster, dimension) mean via
    ``posexplode`` (map-side partial aggregation applies; the shuffle
    carries (cluster, pos, sum, count) partials — k x dim groups, not
    the corpus).  Returns (centroids, inertia) where inertia is the
    summed full squared distance at the final assignment.

    Empty clusters keep their previous centroid (the reference point
    for re-seeding strategies; at k << n with real data this is rare).
    """
    init_rows = (
        df.where(F.col(vec_col).isNotNull())
        .orderBy(id_col)
        .select(vec_col)
        .limit(k)
        .collect()
    )
    centroids = [[float(x) for x in r[0]] for r in init_rows]
    if len(centroids) < k:
        raise ValueError(f"need >= {k} non-null vectors, got {len(centroids)}")

    vecs = df.select(id_col, F.col(vec_col).cast("array<double>").alias("__v"))
    prev_inertia = None
    inertia = float("inf")
    for _ in range(max_iter):
        assigned = vecs.join(
            assign_clusters(vecs, centroids, "__v", id_col), on=id_col
        )
        new_rows = (
            assigned.select("cluster", F.posexplode("__v").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.avg("val").alias("m"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("cvec")
            )
            .collect()
        )
        for r in new_rows:
            centroids[r["cluster"]] = [float(x) for x in r["cvec"]]
        cents = _centroid_df(vecs.sparkSession, centroids)
        inertia = (
            assigned.join(F.broadcast(cents), assigned["cluster"] == cents["cid"])
            .select(
                (
                    _score("__v")
                    + _dot(F.col("__v"), F.col("__v"))
                ).alias("d2")
            )
            .agg(F.sum("d2"))
            .collect()[0][0]
        )
        if prev_inertia is not None and abs(prev_inertia - inertia) <= tol * max(
            prev_inertia, 1.0
        ):
            break
        prev_inertia = inertia
    return centroids, float(inertia)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    vec_col: str,
    id_col: str,
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """Multi-probe IVF search: per query, candidates come from the
    ``nprobe`` nearest centroids' inverted lists.

    Plan shape at scale: the corpus is assigned once (broadcast argmin,
    no shuffle), the probe list is a per-query array exploded to
    (query, cluster) rows, and candidates arrive through an equi-join
    on the cluster id — cost is corpus/k * nprobe per query instead of
    the brute-force full scan.  Output matches
    ``similarity.cosine_topk_bruteforce``: (query_id, neighbor_id,
    cosine, rank)."""
    spark = corpus.sparkSession
    cents = _centroid_df(spark, centroids)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        _norm(F.col(vec_col)).alias("__cn"),
    ).where(F.col("__cn") > 0)
    c = c.join(
        assign_clusters(
            corpus.select(id_col, F.col(vec_col).cast("array<double>").alias("__v")),
            centroids,
            "__v",
            id_col,
        ).withColumnRenamed(id_col, "neighbor_id"),
        on="neighbor_id",
    )

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        _norm(F.col(vec_col)).alias("__qn"),
    ).where(F.col("__qn") > 0)
    probes = (
        q.join(F.broadcast(cents))
        .select(
            "query_id",
            F.struct(_score("__qv").alias("score"), F.col("cid")).alias("__sc"),
        )
        .groupBy("query_id")
        .agg(
            F.slice(
                F.transform(
                    F.array_sort(F.collect_list("__sc")), lambda s: s["cid"]
                ),
                1,
                nprobe,
            ).alias("__probes")
        )
        .select("query_id", F.explode("__probes").alias("cluster"))
    )

    scored = (
        c.join(F.broadcast(probes.join(q, on="query_id")), on="cluster")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn"))).alias(
                "cosine"
            ),
        )
    )
    return _ranked_topk(
        scored, [F.col("cosine").desc(), F.col("neighbor_id").asc()], k
    )


# --- product quantization ------------------------------------------------


def pq_codebooks_from_rows(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    dim: int,
    m: int,
    ksub: int,
) -> list[list[list[float]]]:
    """Deterministic PQ codebooks: subspace s's codewords are the s-th
    slices of the ``ksub`` smallest-id vectors (the same trained-vs-
    seeded tradeoff as ``kmeans_fit`` init; swap in per-subspace
    ``kmeans_fit`` for trained codebooks — identical downstream shape).
    Returns codebooks[s][code] = list of dim/m floats."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    rows = (
        df.where(F.col(vec_col).isNotNull())
        .orderBy(id_col)
        .select(vec_col)
        .limit(ksub)
        .collect()
    )
    if len(rows) < ksub:
        raise ValueError(f"need >= {ksub} vectors, got {len(rows)}")
    return [
        [[float(x) for x in r[0][s * sub : (s + 1) * sub]] for r in rows]
        for s in range(m)
    ]


def pq_codebooks_trained(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    dim: int,
    m: int,
    ksub: int,
    max_iter: int = 5,
) -> list[list[list[float]]]:
    """Trained PQ codebooks: per-subspace Lloyd's k-means (seeded from
    the smallest-id slices, like FAISS's default train-on-sample).
    m index-build passes over the sliced corpus — offline cost; the
    encode/search plans are identical to the seeded variant."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    out: list[list[list[float]]] = []
    for s in range(m):
        sliced = df.select(
            id_col,
            F.slice(F.col(vec_col).cast("array<double>"), s * sub + 1, sub).alias(
                "__sv"
            ),
        )
        cents, _ = kmeans_fit(sliced, "__sv", id_col, ksub, max_iter=max_iter)
        out.append(cents)
    return out


def _codebook_df(spark: SparkSession, codebooks: list[list[list[float]]]) -> DataFrame:
    rows = [
        (s, code, [float(x) for x in cvec])
        for s, sub in enumerate(codebooks)
        for code, cvec in enumerate(sub)
    ]
    df = spark.createDataFrame(rows, "s int, code int, cvec array<double>")
    return df.withColumn("cnorm2", _dot(F.col("cvec"), F.col("cvec")))


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """Encode each vector as m codebook indices: slice per subspace,
    broadcast-join the (s, code) codebook, struct-min argmin per
    (row, subspace), re-assemble the code array in subspace order.
    Output: (id, codes array<int>) — the compressed representation a
    100 TB ANN index actually stores."""
    spark = df.sparkSession
    m = len(codebooks)
    sub = len(codebooks[0][0])
    cb = _codebook_df(spark, codebooks)
    sliced = df.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda s: F.struct(
                    s.alias("s"),
                    F.slice(
                        F.col(vec_col).cast("array<double>"),
                        s * sub + 1,
                        sub,
                    ).alias("svec"),
                ),
            )
        ).alias("__e"),
    ).select(id_col, F.col("__e.s").alias("s"), F.col("__e.svec").alias("svec"))
    best = (
        sliced.join(F.broadcast(cb), on="s")
        .select(
            id_col,
            "s",
            F.struct(
                (
                    F.col("cnorm2")
                    - F.lit(2.0) * _dot(F.col("svec"), F.col("cvec"))
                ).alias("score"),
                F.col("code"),
            ).alias("__sc"),
        )
        .groupBy(id_col, "s")
        .agg(F.min("__sc").alias("__best"))
        .select(id_col, "s", F.col("__best.code").alias("code"))
    )
    return (
        best.groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("s", "code"))),
                lambda x: x["code"],
            ).alias("codes")
        )
    )


def pq_topk_adc(
    corpus_codes: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str,
    id_col: str,
    k: int = 5,
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes.

    Per query, the (subspace, code) -> partial squared distance lookup
    table is m x ksub rows — tiny, built by one broadcast centroid
    join and broadcast again against the code table.  The corpus scan
    touches only the code arrays: posexplode to (id, s, code), join
    the lookup, sum partials per (query, id), top-k.  No float vectors
    move after encoding — this is the PQ promise at scale."""
    spark = corpus_codes.sparkSession
    cb = _codebook_df(spark, codebooks)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    )
    m = len(codebooks)
    sub = len(codebooks[0][0])
    lut = (
        q.join(F.broadcast(cb))
        .select(
            "query_id",
            "s",
            "code",
            (
                F.col("cnorm2")
                - F.lit(2.0)
                * _dot(
                    F.slice(F.col("__qv"), F.col("s") * sub + 1, sub),
                    F.col("cvec"),
                )
            ).alias("pdist"),
        )
    )
    exploded = corpus_codes.select(
        F.col(id_col).alias("neighbor_id"),
        F.posexplode("codes").alias("s", "code"),
    )
    scored = (
        exploded.join(F.broadcast(lut), on=["s", "code"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("pdist").alias("adc"), F.count(F.lit(1)).alias("__m"))
        # a neighbor missing a subspace lookup row would sum fewer than
        # m partials and rank incorrectly low — require all m
        .where(F.col("__m") == m)
        .drop("__m")
    )
    return _ranked_topk(
        scored, [F.col("adc").asc(), F.col("neighbor_id").asc()], k
    )
