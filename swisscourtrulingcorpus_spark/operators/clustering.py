"""K-means clustering + IVF / product-quantization ANN — the learned
scale path for similarity search.

`operators/similarity.py` covers the exact baseline (brute-force
cosine) and the hash-bucketed approximations (hyperplane LSH, the
fixture ``label`` standing in for a coarse assignment).  This module
supplies the remaining production ANN layer a 100 TB corpus needs:

- ``kmeans_fit``: Lloyd's iterations expressed as DataFrame programs —
  the centroid matrix unrolls into a literal argmin EXPRESSION (k x dim
  doubles, kilobytes), so assignment is a pure map with no join or row
  multiplication; the recompute is a posexplode + per-(cluster,
  dimension) average with map-side combine.  Only k x dim numbers ever
  return to the driver per iteration; the corpus streams.
- ``assign_clusters`` / ``ivf_index``: one scan, literal-centroid
  argmin, deterministic ties (first minimum = smallest cluster id) —
  the IVF coarse quantizer; index once, persist, search many.
- ``ivf_topk``: multi-probe IVF search — each query probes its
  ``nprobe`` nearest centroids, candidates come from an equi-join on
  the cluster id (never a cross join against the corpus).
- ``pq_codebooks_from_rows`` / ``pq_encode`` / ``pq_topk_adc``:
  product quantization — vectors become m small codes; search scans
  codes with a broadcast per-query flat partial-distance lookup array
  (asymmetric distance computation, m ``element_at`` lookups per
  candidate).  At 100 TB the code table is ~64x smaller than the raw
  embeddings and the scan never touches the float vectors.
- ``ivfpq_train`` / ``ivfpq_encode`` / ``ivfpq_topk``: the composed
  FAISS-style index — PQ over residuals to the coarse centroid, probed
  search over the inverted lists.

Distance arithmetic reuses the sequential-fold dot product from
`operators/similarity.py` (verified bit-identical to DuckDB's
``list_dot_product``), so the assignment/encoding gates hash-match the
oracle exactly.  Squared L2 is computed as ``c.c - 2 a.c`` — the
``a.a`` term is constant per row and cannot change the argmin, and
dropping it keeps every compared double a two-flop combination of
oracle-identical folds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from swisscourtrulingcorpus_spark.operators.similarity import _dot, _norm


def _ranked_topk(df: DataFrame, order: list, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(*order)
    return df.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def _lit_vec(c: list[float]) -> F.Column:
    return F.array(*[F.lit(float(x)) for x in c])


def _self_dot(c: list[float]) -> float:
    """Driver-side c.c with the SAME sequential left-fold order as the
    Spark ``aggregate`` / DuckDB ``list_dot_product`` evaluation —
    identical IEEE-754 operation sequence, identical double.  (Spark's
    higher-order ``aggregate`` is not constant-foldable, so an
    expression-side self-dot would re-evaluate k literal folds per
    row.)"""
    s = 0.0
    for x in c:
        x = float(x)
        s += x * x
    return s


def centroid_scores(vec: F.Column, centroids: list[list[float]]) -> F.Column:
    """Array of rank-equivalent squared L2 scores (c.c - 2 a.c) to each
    centroid, as ONE map-side expression over literal centroid arrays —
    no join, no shuffle, no row multiplication; one distance fold per
    centroid per row.  Every score is bit-identical to the oracle's
    ``list_dot_product`` arithmetic."""
    return F.array(
        *[
            F.lit(_self_dot(c)) - F.lit(2.0) * _dot(vec, _lit_vec(c))
            for c in centroids
        ]
    )


def _valid_vec(vec_col: str) -> F.Column:
    """Row guard shared by every assignment/encode entry point: the
    vector is non-null AND every component is a finite number.  A NaN
    (or null-element) component makes its distance score NaN, and
    ``_min_struct``'s strict ``<`` against the +inf seed never selects
    a NaN — the row would silently land in cluster/code -1, a bucket
    no probe ever reaches and the DuckDB oracle never produces.
    Excluding the row (like nulls) keeps assignment total over its
    domain; surface bad embeddings with the data-quality checks.
    ±Infinity components are excluded too: a -inf score also ties or
    beats every finite distance through inf arithmetic (inf - inf =
    NaN), landing in the same unreachable -1 bucket."""
    c = F.col(vec_col)
    return c.isNotNull() & ~F.exists(
        c,
        lambda x: x.isNull() | F.isnan(x) | (F.abs(x) == F.lit(float("inf"))),
    )


def _min_struct(scores: F.Column) -> F.Column:
    """Single-scan (score, index) minimum over a scores array; strict
    ``<`` keeps the FIRST minimum, so ties break to the smallest
    cluster id — matching the oracle's ORDER BY score, cid.

    Why a fold and not ``array_position(s, array_min(s))``: that form
    references the scores expression twice, and CollapseProject
    re-inlines projections so the k distance folds evaluate twice per
    row (measured — the plan showed every fold duplicated).  The
    ``aggregate`` form scans once and references ``scores`` once."""
    return F.aggregate(
        F.transform(
            scores, lambda s, i: F.struct(s.alias("s"), i.alias("i"))
        ),
        F.struct(
            F.lit(float("inf")).alias("s"), F.lit(-1).alias("i")
        ),
        lambda acc, x: F.when(x["s"] < acc["s"], x).otherwise(acc),
    )


def _argmin_of(scores: F.Column) -> F.Column:
    """First index of the array minimum (ties -> smallest cluster id);
    single scan, ``scores`` referenced once."""
    return _min_struct(scores)["i"].cast("int")


def _probe_clusters(
    vec: F.Column, centroids: list[list[float]], nprobe: int
) -> F.Column:
    """The ``nprobe`` nearest centroid ids for a query vector, as one
    map-side expression (sort the (score, index) pairs, slice)."""
    scores = centroid_scores(vec, centroids)
    ranked = F.transform(
        F.array_sort(
            F.transform(scores, lambda s, i: F.struct(s.alias("s"), i.alias("i")))
        ),
        lambda x: x["i"],
    )
    return F.slice(ranked, 1, nprobe)


def _adc_lut(vec: F.Column, codebooks: list[list[list[float]]]) -> F.Column:
    """Flat ADC lookup array: lut[s * ksub + code] = partial squared
    distance of ``vec``'s s-th slice to that codeword (rank-equivalent
    c.c - 2 a.c form) — one projection over the literal codebooks."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    return F.array(
        *[
            F.lit(_self_dot(c))
            - F.lit(2.0) * _dot(F.slice(vec, s * sub + 1, sub), _lit_vec(c))
            for s in range(m)
            for c in codebooks[s]
        ]
    )


def assign_clusters(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """IVF coarse assignment: nearest centroid per row, ties to the
    smallest cluster id.

    Pure projection — the centroid matrix unrolls into the expression
    tree (k x dim literals; fine through k*dim ~ tens of thousands, the
    IVF coarse-quantizer regime) so the corpus is scanned once with NO
    join, shuffle, or aggregation.  An earlier broadcast-join + min
    formulation materialized k struct rows per vector and OOM'd at
    500k x 64 on the test box — the expression form replaced it
    (SCALE.md).

    NULL vectors are EXCLUDED (a null embedding has no nearest
    centroid; the fold would otherwise emit the -1 seed, a cluster no
    probe ever reaches — surface nulls with the data-quality
    ``not_null`` check instead)."""
    return df.where(_valid_vec(vec_col)).select(
        id_col,
        _argmin_of(centroid_scores(F.col(vec_col), centroids)).alias("cluster"),
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
    collected; bounded).  Each iteration: one map-side argmin pass,
    then centroids recomputed as the per-(cluster, dimension) mean via
    ``posexplode`` (map-side partial aggregation applies; the shuffle
    carries (cluster, pos, sum, count) partials — k x dim groups, not
    the corpus).  Returns (centroids, inertia); inertia is the summed
    squared distance under the centroids the LAST assignment used.

    NOTE on determinism: init and assignment are exactly
    deterministic, but the centroid AVERAGES are deterministic only up
    to floating summation order (partition order in the groupBy), like
    any distributed mean — trained centroids can differ in final ulps
    across runs.  The driver gate therefore verifies the
    seeded-assignment path (bit-exact); tests check trained-path
    invariants (inertia monotonicity, coverage), not bits.

    Empty clusters keep their previous centroid (the reference point
    for re-seeding strategies; at k << n with real data this is rare).
    """
    init_rows = (
        df.where(_valid_vec(vec_col))
        .orderBy(id_col)
        .select(vec_col)
        .limit(k)
        .collect()
    )
    centroids = [[float(x) for x in r[0]] for r in init_rows]
    if len(centroids) < k:
        raise ValueError(f"need >= {k} non-null vectors, got {len(centroids)}")

    vecs = df.where(_valid_vec(vec_col)).select(
        id_col, F.col(vec_col).cast("array<double>").alias("__v")
    )
    prev_inertia = None
    inertia = float("inf")
    for _ in range(max_iter):
        # one map-side pass: cluster id + full squared distance per row.
        # The (score, index) pair comes from ONE fold; referencing the
        # struct twice re-evaluates the fold (projection collapse), so
        # accept 2x here — training-time only; the corpus-scale paths
        # (assign/encode) are single-eval.
        best = _min_struct(centroid_scores(F.col("__v"), centroids))
        assigned = vecs.select(
            "__v",
            best["i"].cast("int").alias("cluster"),
            (best["s"] + _dot(F.col("__v"), F.col("__v"))).alias("d2"),
        )
        # recompute + inertia in ONE aggregation over (cluster, pos)
        # partials — map-side combine applies, the shuffle carries
        # k x dim groups, not the corpus
        new_rows = (
            assigned.select("cluster", "d2", F.posexplode("__v").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(
                F.avg("val").alias("m"),
                F.sum(F.when(F.col("pos") == 0, F.col("d2"))).alias("d2p"),
            )
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("cvec"),
                F.sum("d2p").alias("d2sum"),
            )
            .collect()
        )
        inertia = float(sum(r["d2sum"] for r in new_rows))
        for r in new_rows:
            centroids[r["cluster"]] = [float(x) for x in r["cvec"]]
        if prev_inertia is not None and abs(prev_inertia - inertia) <= tol * max(
            prev_inertia, 1.0
        ):
            break
        prev_inertia = inertia
    return centroids, float(inertia)


def ivf_index(
    corpus: DataFrame,
    centroids: list[list[float]],
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """Build the IVF index: the corpus with its ``cluster`` assignment
    column.  ONE expression-argmin scan — write/persist the result (e.g.
    ``layout.write_sorted_by(..., ["cluster"])`` so each inverted list
    is contiguous and cluster-pruned at scan time); search calls then
    skip the assignment entirely.  Measured at 50k x 64: assignment is the
    bulk of a cold ``ivf_topk`` call — indexing once is what makes IVF
    beat brute force (see SCALE.md).  Null vectors are excluded (see
    ``assign_clusters``)."""
    return corpus.where(_valid_vec(vec_col)).withColumn(
        "cluster",
        _argmin_of(
            centroid_scores(F.col(vec_col).cast("array<double>"), centroids)
        ),
    )


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

    If ``corpus`` already carries a ``cluster`` column (built by
    ``ivf_index`` — the intended production path), it is used as-is;
    otherwise the corpus is assigned on the fly (convenience for
    one-shot calls; at scale always index once).  The probe list is a
    per-query array exploded to (query, cluster) rows, and candidates
    arrive through an equi-join on the cluster id — cost is
    corpus/k * nprobe per query instead of the brute-force full scan.
    Output matches ``similarity.cosine_topk_bruteforce``: (query_id,
    neighbor_id, cosine, rank)."""
    if "cluster" not in corpus.columns:
        corpus = ivf_index(corpus, centroids, vec_col, id_col)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        _norm(F.col(vec_col)).alias("__cn"),
        "cluster",
    ).where(F.col("__cn") > 0)

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        _norm(F.col(vec_col)).alias("__qn"),
    ).where(F.col("__qn") > 0)
    # probe list = nprobe nearest centroids, map-side over the same
    # literal-centroid score expression (no join, no aggregation)
    probes = q.select(
        "query_id",
        "__qv",
        "__qn",
        F.explode(
            _probe_clusters(F.col("__qv").cast("array<double>"), centroids, nprobe)
        ).alias("cluster"),
    )

    scored = (
        c.join(F.broadcast(probes), on="cluster")
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
        df.where(_valid_vec(vec_col))
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


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """Encode each vector as m codebook indices: per-subspace argmin
    over the literal codebooks, as ONE projection — the encode pass is
    a pure map over the corpus with no join, shuffle, or aggregation
    (an earlier explode + broadcast-join + two-groupBy version was
    replaced; at 100 TB an extra corpus shuffle in the encode pass is
    the whole cost).  Output: (id, codes array<int>) — the compressed
    representation an ANN index actually stores.  Null vectors are
    excluded (see ``assign_clusters``)."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    v = F.col(vec_col).cast("array<double>")
    codes = F.array(
        *[
            _argmin_of(
                centroid_scores(F.slice(v, s * sub + 1, sub), codebooks[s])
            )
            for s in range(m)
        ]
    )
    return df.where(_valid_vec(vec_col)).select(id_col, codes.alias("codes"))


def _lit_matrix(vectors: list[list[float]]) -> F.Column:
    return F.array(*[_lit_vec(v) for v in vectors])


def _residual(vec: F.Column, cluster: F.Column, centroids: list[list[float]]) -> F.Column:
    """vec - centroids[cluster], with the centroid matrix inlined as a
    literal array-of-arrays indexed by the cluster column."""
    cent = F.element_at(_lit_matrix(centroids), (cluster + 1).cast("int"))
    return F.zip_with(vec, cent, lambda a, c: a - c)


def ivfpq_train(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int,
    m: int,
    ksub: int,
    dim: int,
    max_iter: int = 5,
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """Train the IVF-PQ index: coarse centroids via Lloyd's, then PQ
    codebooks on the RESIDUALS (vec - assigned centroid) — the FAISS
    IVFPQ recipe; residuals are much smaller than raw vectors, so the
    same code budget quantizes far more precisely."""
    vecs = df.where(_valid_vec(vec_col)).select(
        id_col, F.col(vec_col).cast("array<double>").alias("__v")
    )
    centroids, _ = kmeans_fit(vecs, "__v", id_col, k, max_iter=max_iter)
    best = _min_struct(centroid_scores(F.col("__v"), centroids))
    residuals = vecs.select(
        id_col,
        _residual(F.col("__v"), best["i"], centroids).alias("__r"),
    )
    codebooks = pq_codebooks_trained(
        residuals, "__r", id_col, dim, m, ksub, max_iter=max_iter
    )
    return centroids, codebooks


def ivfpq_seed(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str,
    id_col: str,
    dim: int,
    m: int,
    ksub: int,
) -> list[list[list[float]]]:
    """Seed (untrained) residual codebooks for given coarse centroids:
    residuals of the ``ksub`` smallest-id vectors, sliced per subspace
    — ``ivfpq_train`` minus the Lloyd iterations.  This is the
    deterministic construction the driver gate verifies bit-for-bit."""
    vecs = df.where(_valid_vec(vec_col)).select(
        id_col, F.col(vec_col).cast("array<double>").alias("__v")
    )
    best = _min_struct(centroid_scores(F.col("__v"), centroids))
    residuals = vecs.select(
        id_col, _residual(F.col("__v"), best["i"], centroids).alias("__r")
    )
    return pq_codebooks_from_rows(residuals, "__r", id_col, dim, m, ksub)


def ivfpq_encode(
    df: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """Encode as (id, cluster, codes): coarse argmin + per-subspace
    argmin over the RESIDUAL — one projection over the corpus (the
    cluster fold evaluates twice because the residual references it;
    still no join/shuffle/row multiplication)."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    vecs = df.where(_valid_vec(vec_col)).select(
        id_col, F.col(vec_col).cast("array<double>").alias("__v")
    )
    best = _min_struct(centroid_scores(F.col("__v"), centroids))
    cluster = best["i"].cast("int")
    res = _residual(F.col("__v"), best["i"], centroids)
    codes = F.array(
        *[
            _argmin_of(
                centroid_scores(F.slice(res, s * sub + 1, sub), codebooks[s])
            )
            for s in range(m)
        ]
    )
    return vecs.select(id_col, cluster.alias("cluster"), codes.alias("codes"))


def ivfpq_topk(
    corpus_codes: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    vec_col: str,
    id_col: str,
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """IVF-PQ ADC search: probe ``nprobe`` clusters per query; per
    (query, probed cluster) the RESIDUAL lookup table (m x ksub partial
    distances + the residual self-term, which differs across clusters
    and must not be dropped) broadcasts; candidates come from the
    equi-join on the cluster id and are scored by m table lookups.
    The scan touches (cluster, codes) only — never the float vectors."""
    ksub = len(codebooks[0])

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    )
    probes = q.select(
        "query_id",
        "__qv",
        F.explode(_probe_clusters(F.col("__qv"), centroids, nprobe)).alias(
            "cluster"
        ),
    ).withColumn("__qr", _residual(F.col("__qv"), F.col("cluster"), centroids))
    luts = probes.select(
        "query_id",
        "cluster",
        _adc_lut(F.col("__qr"), codebooks).alias("__lut"),
        _dot(F.col("__qr"), F.col("__qr")).alias("__qr2"),
    )
    scored = (
        corpus_codes.join(F.broadcast(luts), on="cluster")
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            (
                F.col("__qr2")
                + F.aggregate(
                    F.transform(
                        F.col("codes"),
                        lambda code, s: F.element_at(
                            F.col("__lut"), (s * ksub + code + 1).cast("int")
                        ),
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
            ).alias("adc"),
        )
    )
    return _ranked_topk(scored, [F.col("adc").asc(), F.col("neighbor_id").asc()], k)


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
    table is m x ksub doubles, flattened to ONE array per query and
    broadcast.  The corpus-side work per (query, code-row) is then m
    ``element_at`` lookups folded with ``aggregate`` — ~dim/m times
    less arithmetic than the brute-force dot product, with no
    posexplode fan-out and no join on (s, code) (an earlier join-shaped
    version shuffled corpus x m rows and lost to brute force; see
    SCALE.md).  No float vectors move after encoding — the scan reads
    m bytes of codes per row, the PQ promise at scale."""
    ksub = len(codebooks[0])
    qv = F.col(vec_col).cast("array<double>")
    # per-query flat LUT: lut[s * ksub + code] = partial distance —
    # one projection over the literal codebooks, no join/agg
    lut = queries.select(
        F.col(id_col).alias("query_id"), _adc_lut(qv, codebooks).alias("__lut")
    )
    c = corpus_codes.select(
        F.col(id_col).alias("neighbor_id"), "codes"
    )
    scored = (
        c.join(F.broadcast(lut))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.aggregate(
                F.transform(
                    F.col("codes"),
                    lambda code, s: F.element_at(
                        F.col("__lut"), (s * ksub + code + 1).cast("int")
                    ),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("adc"),
        )
    )
    return _ranked_topk(
        scored, [F.col("adc").asc(), F.col("neighbor_id").asc()], k
    )
