"""K-means / IVF / PQ layer (`operators/clustering.py`): numeric
cross-checks against numpy on the collected fixture (500 x 64 — tiny),
recall floors vs the exact brute-force path, and plan-shape assertions
(broadcast centroids, equi-join candidate generation)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from swisscourtrulingcorpus_spark.operators import clustering as C
from swisscourtrulingcorpus_spark.operators.similarity import cosine_topk_bruteforce

# Slow tier (pytest.ini): multi-minute suite, deselected from the
# default run so the round driver's pytest window completes.
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.orderBy("vec_id").collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    return ids, mat


def test_kmeans_converges_and_partitions(emb):
    cents, inertia = C.kmeans_fit(emb, "embedding", "vec_id", k=4, max_iter=5)
    assert len(cents) == 4 and all(len(c) == 64 for c in cents)
    assert np.isfinite(inertia)
    _, inertia1 = C.kmeans_fit(emb, "embedding", "vec_id", k=4, max_iter=1)
    assert inertia <= inertia1 + 1e-9  # Lloyd's never increases inertia

    vecs = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    asg = C.assign_clusters(vecs, cents, "v", "vec_id")
    assert asg.count() == emb.count()
    sizes = {r.cluster: r["count"] for r in asg.groupBy("cluster").count().collect()}
    assert set(sizes) <= {0, 1, 2, 3} and sum(sizes.values()) == emb.count()


def test_assignment_matches_numpy(emb, emb_np):
    ids, mat = emb_np
    cents = mat[:8]
    vecs = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    got = {
        r.vec_id: r.cluster
        for r in C.assign_clusters(vecs, cents.tolist(), "v", "vec_id").collect()
    }
    d2 = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    want = d2.argmin(axis=1)
    mismatch = sum(got[i] != want[n] for n, i in enumerate(ids))
    assert mismatch == 0


def test_ivf_recall_floor(emb):
    cents, _ = C.kmeans_fit(emb, "embedding", "vec_id", k=8, max_iter=5)
    queries = emb.limit(20)
    approx = C.ivf_topk(emb, queries, cents, "embedding", "vec_id", k=5, nprobe=3)
    exact = cosine_topk_bruteforce(emb, queries, "vec_id", "embedding", k=5)
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    assert len(a & e) / len(e) >= 0.6  # measured 0.76 on the fixture


def test_pq_encode_matches_numpy(emb, emb_np):
    ids, mat = emb_np
    m, sub, ksub = 4, 16, 8
    cbs = C.pq_codebooks_from_rows(emb, "embedding", "vec_id", 64, m, ksub)
    got = {r.vec_id: list(r.codes) for r in C.pq_encode(emb, cbs, "embedding", "vec_id").collect()}
    for n, i in enumerate(ids[:50]):
        codes = []
        for s in range(m):
            sl = mat[n, s * sub : (s + 1) * sub]
            cb = np.array(cbs[s])
            codes.append(int(((sl[None, :] - cb) ** 2).sum(axis=1).argmin()))
        assert got[i] == codes, f"vec {i}"


def test_pq_adc_beats_random(emb, emb_np):
    ids, mat = emb_np
    cbs = C.pq_codebooks_from_rows(emb, "embedding", "vec_id", 64, 4, 8)
    codes = C.pq_encode(emb, cbs, "embedding", "vec_id")
    queries = emb.limit(20)
    adc = C.pq_topk_adc(codes, queries, cbs, "embedding", "vec_id", k=20)
    a = {(r.query_id, r.neighbor_id) for r in adc.collect()}
    # exact L2 top-20 per query from numpy (PQ approximates L2)
    e = set()
    id_pos = {i: n for n, i in enumerate(ids)}
    for q in [r.vec_id for r in queries.collect()]:
        d2 = ((mat - mat[id_pos[q]]) ** 2).sum(axis=1)
        order = [ids[j] for j in d2.argsort() if ids[j] != q][:20]
        e |= {(q, n) for n in order}
    recall = len(a & e) / len(e)
    # random recall@20 over 500 docs ~= 0.04; untrained seed codebooks
    # measured ~0.2 — assert comfortably above chance
    assert recall >= 0.10, recall


def test_pq_trained_codebooks_shape_and_quality(emb):
    cbs = C.pq_codebooks_trained(emb, "embedding", "vec_id", 64, 4, 4, max_iter=2)
    assert len(cbs) == 4
    assert all(len(sub) == 4 and all(len(c) == 16 for c in sub) for sub in cbs)
    # trained codewords are per-cluster means, not raw corpus slices —
    # encoding still covers every row with in-range codes
    codes = C.pq_encode(emb, cbs, "embedding", "vec_id")
    rows = codes.collect()
    assert len(rows) == emb.count()
    assert all(len(r.codes) == 4 and all(0 <= c < 4 for c in r.codes) for r in rows)


def test_assign_plan_is_pure_projection(emb, explain_plan):
    vecs = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    cents = [[0.0] * 64, [1.0] * 64]
    plan = explain_plan(C.assign_clusters(vecs, cents, "v", "vec_id"))
    # the literal-centroid argmin must not join, shuffle, or aggregate
    for bad in ("Join", "Exchange", "Aggregate", "Sort"):
        assert bad not in plan, f"{bad} in assignment plan"


def test_ivf_candidates_equi_join(emb, explain_plan):
    cents, _ = C.kmeans_fit(emb, "embedding", "vec_id", k=4, max_iter=1)
    df = C.ivf_topk(emb, emb.limit(3), cents, "embedding", "vec_id", k=3, nprobe=2)
    plan = explain_plan(df)
    # the corpus-side candidate join must key on the cluster id — a
    # cartesian against the corpus would be the brute-force plan
    assert "cluster" in plan
    assert "CartesianProduct" not in plan


def test_trained_lid_on_multilingual_fixture(spark):
    """On genuinely tri-lingual text (the domain fixture corpus) the
    trained char-trigram classifier is perfect — the E1 upgrade's
    accuracy evidence; the driver gate checks the same program's
    arithmetic bit-for-bit on the synthetic corpus."""
    from swisscourtrulingcorpus_spark.plans.ann_queries import trained_language_id
    from swisscourtrulingcorpus_spark.sources.domain_fixtures import build_raw_corpus

    corpus = build_raw_corpus(n_decisions=60)
    docs = spark.createDataFrame(
        [(i, d["lang"], d["raw_text"]) for i, d in enumerate(corpus)],
        "doc_id bigint, lang string, text string",
    )
    res = trained_language_id(docs).collect()
    assert len(res) == 60
    acc = sum(r.correct for r in res) / len(res)
    assert acc == 1.0


def test_ivfpq_encode_matches_numpy(emb, emb_np):
    ids, mat = emb_np
    m, sub, ksub, k = 4, 16, 8, 4
    cents = mat[:k]
    cbs = [
        [list(mat[c, s * sub : (s + 1) * sub] - cents[c % k, s * sub : (s + 1) * sub]) for c in range(ksub)]
        for s in range(m)
    ]
    got = {
        (r.vec_id): (r.cluster, list(r.codes))
        for r in C.ivfpq_encode(emb, cents.tolist(), cbs, "embedding", "vec_id").collect()
    }
    for n, i in enumerate(ids[:40]):
        d2 = ((mat[n] - cents) ** 2).sum(axis=1)
        cl = int(d2.argmin())
        res = mat[n] - cents[cl]
        codes = []
        for s in range(m):
            sl = res[s * sub : (s + 1) * sub]
            cb = np.array(cbs[s])
            codes.append(int(((sl[None, :] - cb) ** 2).sum(axis=1).argmin()))
        assert got[i] == (cl, codes), f"vec {i}"


def test_ivfpq_beats_plain_pq_floor(emb, emb_np):
    """Residual quantization recall floor: measured 0.36 vs plain PQ
    0.33 on the fixture; assert comfortably above chance (0.04)."""
    ids, mat = emb_np
    id_pos = {i: n for n, i in enumerate(ids)}
    queries = emb.limit(20)
    cents, cbs = C.ivfpq_train(emb, "embedding", "vec_id", k=8, m=8, ksub=16, dim=64, max_iter=2)
    codes = C.ivfpq_encode(emb, cents, cbs, "embedding", "vec_id")
    got = C.ivfpq_topk(codes, queries, cents, cbs, "embedding", "vec_id", k=10, nprobe=8)
    a = {(r.query_id, r.neighbor_id) for r in got.collect()}
    e = set()
    for q in [r.vec_id for r in queries.collect()]:
        d2 = ((mat - mat[id_pos[q]]) ** 2).sum(axis=1)
        e |= {(q, ids[j]) for j in d2.argsort() if ids[j] != q}
    e10 = set()
    for q in [r.vec_id for r in queries.collect()]:
        d2 = ((mat - mat[id_pos[q]]) ** 2).sum(axis=1)
        e10 |= {(q, ids[j]) for j in d2.argsort()[:11] if ids[j] != q}
    assert len(a & e10) / len(e10) >= 0.15


def test_text_to_ann_loop_finds_exact_dups(spark, sf_dir, tmp_path):
    """End-to-end: documents -> hashing-trick BoW embedding -> cosine
    top-1 rediscovers exact duplicates (cosine == 1.0) — the text and
    ANN layers compose without an external model.  The fixture corpus
    has no exact dups, so a shifted-id copy of 10 docs is planted."""
    from swisscourtrulingcorpus_spark.operators.similarity import (
        cosine_topk_bruteforce,
    )
    from swisscourtrulingcorpus_spark.plans.ann_queries import (
        q_hashed_bow_embeddings,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    planted = docs.limit(10).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1_000_000)
    )
    table_dir = str(tmp_path / "sf_dup")
    import os

    os.makedirs(table_dir)
    # single-file parquet like the driver fixtures (catalog sniffs footers)
    docs.unionByName(planted).toPandas().to_parquet(
        f"{table_dir}/documents.parquet"
    )

    vecs = (
        q_hashed_bow_embeddings(spark, table_dir)
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "value"))),
                lambda x: x["value"].cast("double"),
            ).alias("embedding")
        )
    )
    queries = vecs.where(F.col("doc_id") >= 1_000_000)
    top = cosine_topk_bruteforce(vecs, queries, "doc_id", "embedding", k=1)
    rows = top.collect()
    assert len(rows) == 10
    for r in rows:
        assert abs(r["cosine"] - 1.0) < 1e-12, r
        assert r["neighbor_id"] == r["query_id"] - 1_000_000, r


def test_assignment_composes_with_streaming(spark, sf_dir, tmp_path):
    """The literal-centroid argmin is a stateless projection, so the
    SAME expression runs unchanged in Structured Streaming — streaming
    assignment equals batch assignment row-for-row."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = [
        [float(x) for x in r.embedding]
        for r in emb.orderBy("vec_id").limit(4).collect()
    ]
    batch = {
        r.vec_id: r.cluster
        for r in C.assign_clusters(
            emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v")),
            cents, "v", "vec_id",
        ).collect()
    }

    stage = str(tmp_path / "in")
    emb.write.parquet(stage)
    stream = spark.readStream.schema(emb.schema).parquet(stage)
    assigned = C.assign_clusters(
        stream.select("vec_id", F.col("embedding").cast("array<double>").alias("v")),
        cents, "v", "vec_id",
    )
    q = (
        assigned.writeStream.format("memory")
        .queryName("stream_assign")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.vec_id: r.cluster for r in spark.sql("SELECT * FROM stream_assign").collect()
    }
    assert got == batch


def test_nan_vectors_excluded_from_assignment(spark):
    """A NaN (or null-element) component makes every distance score
    NaN; the strict-< fold would emit the -1 seed — an unreachable
    cluster diverging from the oracle (ADVICE r03).  Such rows are
    excluded like nulls."""
    from swisscourtrulingcorpus_spark.operators.clustering import (
        assign_clusters,
    )

    rows = [
        (1, [1.0, 2.0]),
        (2, [float("nan"), 0.0]),
        (3, None),
        (4, [0.5, None]),
        (5, [3.0, 4.0]),
    ]
    df = spark.createDataFrame(rows, "id: long, vec: array<double>")
    got = assign_clusters(df, [[0.0, 0.0], [3.0, 3.0]], "vec", "id")
    out = {r["id"]: r["cluster"] for r in got.collect()}
    assert set(out) == {1, 5}, out
    assert -1 not in out.values()


def test_infinity_vectors_excluded_from_assignment(spark):
    """±Infinity components defeat the strict-< fold the same way NaN
    does (inf - inf = NaN, -inf ties every score) — excluded like NaN
    (r04 review)."""
    from swisscourtrulingcorpus_spark.operators.clustering import (
        assign_clusters,
    )

    rows = [
        (1, [1.0, 2.0]),
        (2, [float("inf"), 0.0]),
        (3, [float("-inf"), 1.0]),
    ]
    df = spark.createDataFrame(rows, "id: long, vec: array<double>")
    got = assign_clusters(df, [[0.0, 0.0], [3.0, 3.0]], "vec", "id")
    out = {r["id"]: r["cluster"] for r in got.collect()}
    assert out == {1: 0}


def test_int8_dot_topk_recall_vs_float(spark, sf_dir):
    """Symmetric int8 code dot product must track the float ranker:
    recall@5 measured 0.98 on the fixture corpus (r06; the rejected
    shifted/unsigned scheme measured 0.03 — ranking by component sums).
    Threshold 0.90."""
    from pyspark.sql import functions as F

    from swisscourtrulingcorpus_spark.operators.similarity import (
        cosine_topk_bruteforce,
        int8_dot_topk,
        max_abs_bound,
    )
    from swisscourtrulingcorpus_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 20)
    exact = cosine_topk_bruteforce(emb, q, k=5).collect()
    quant = int8_dot_topk(emb, q, max_abs_bound(emb), k=5).collect()
    e, g = {}, {}
    for r in exact:
        e.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in quant:
        g.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [len(e[k] & g[k]) / len(e[k]) for k in e]
    assert sum(recalls) / len(recalls) >= 0.90, recalls


def test_mutual_nn_bitext_matches_numpy(spark, sf_dir):
    """The mutual-NN alignment must equal a numpy brute-force mirror:
    quantize both sides with the global bound, take each side's exact
    int-dot argmax (ties: min id), keep mutual pairs."""
    import numpy as np
    from pyspark.sql import functions as F

    from swisscourtrulingcorpus_spark.plans.layout_queries import (
        mutual_nn_bitext,
    )
    from swisscourtrulingcorpus_spark.sources.catalog import load_table

    got = {
        (r.id_a, r.id_b): r.dot_q
        for r in mutual_nn_bitext(spark, sf_dir).collect()
    }

    emb = load_table(spark, sf_dir, "embeddings").collect()
    s = max(
        max(abs(float(x)) for x in r.embedding)
        for r in emb
        if r.embedding is not None
    )
    codes = {
        r.vec_id: np.clip(
            np.round(np.array(r.embedding, dtype=np.float64) * 127.0 / s),
            -127,
            127,
        ).astype(np.int64)
        for r in emb
        if r.embedding is not None
    }
    a_ids = sorted(r.vec_id for r in emb if r.label % 2 == 0)
    b_ids = sorted(r.vec_id for r in emb if r.label % 2 == 1)
    dots = {
        (a, b): int(codes[a] @ codes[b]) for a in a_ids for b in b_ids
    }
    top_ab = {
        a: max(b_ids, key=lambda b: (dots[(a, b)], -b)) for a in a_ids
    }
    top_ba = {
        b: max(a_ids, key=lambda a: (dots[(a, b)], -a)) for b in b_ids
    }
    want = {
        (a, b): dots[(a, b)]
        for a, b in top_ab.items()
        if top_ba[b] == a
    }
    assert got == want and len(want) > 0


def test_margin_bitext_matches_numpy(spark, sf_dir):
    """The margin criterion must equal the numpy mirror: per mutual
    pair, margin_micro = ((na+nb) * dot * 1e6) // (sa+sb) over each
    side's top-k dots (k=4, same tie-broken ranks)."""
    import numpy as np
    from pyspark.sql import functions as F

    from swisscourtrulingcorpus_spark.plans.layout_queries import (
        _MARGIN_K,
        margin_bitext_pairs,
    )
    from swisscourtrulingcorpus_spark.sources.catalog import load_table

    got = {
        (r.id_a, r.id_b): (r.margin_micro, r.accept)
        for r in margin_bitext_pairs(spark, sf_dir).collect()
    }

    emb = load_table(spark, sf_dir, "embeddings").collect()
    s = max(
        max(abs(float(x)) for x in r.embedding)
        for r in emb
        if r.embedding is not None
    )
    codes = {
        r.vec_id: np.clip(
            np.round(np.array(r.embedding, dtype=np.float64) * 127.0 / s),
            -127,
            127,
        ).astype(np.int64)
        for r in emb
        if r.embedding is not None
    }
    a_ids = sorted(r.vec_id for r in emb if r.label % 2 == 0)
    b_ids = sorted(r.vec_id for r in emb if r.label % 2 == 1)
    dots = {(a, b): int(codes[a] @ codes[b]) for a in a_ids for b in b_ids}
    k = _MARGIN_K
    want = {}
    for a in a_ids:
        b_rank = sorted(b_ids, key=lambda b: (-dots[(a, b)], b))
        for b in b_ids:
            a_rank = sorted(a_ids, key=lambda x: (-dots[(x, b)], x))
            if b_rank[0] != b or a_rank[0] != a:
                continue
            ta = b_rank[:k]
            tb = a_rank[:k]
            sa = sum(dots[(a, x)] for x in ta)
            sb = sum(dots[(x, b)] for x in tb)
            d = dots[(a, b)]
            if d < 0 or sa + sb <= 0:
                continue
            m = ((len(ta) + len(tb)) * d * 1_000_000) // (sa + sb)
            want[(a, b)] = (m, m > 1_000_000)
    assert got == want and len(want) > 0
    # the criterion is selective but not degenerate on the fixture
    accepted = sum(1 for m, acc in got.values() if acc)
    assert 0 < accepted


def test_ivf_bitext_recall_vs_exact(spark, sf_dir):
    """The bucket-restricted bitext path must recover most of the exact
    mutual-NN pairs (recall), and every pair it emits whose members
    share a cell with the exact pair must carry the identical dot."""
    from swisscourtrulingcorpus_spark.plans.ann_queries import (
        ivf_mutual_nn_bitext,
    )
    from swisscourtrulingcorpus_spark.plans.layout_queries import (
        mutual_nn_bitext,
    )

    exact = {
        (r.id_a, r.id_b): r.dot_q
        for r in mutual_nn_bitext(spark, sf_dir).collect()
    }
    bucketed = {
        (r.id_a, r.id_b): r.dot_q
        for r in ivf_mutual_nn_bitext(spark, sf_dir).collect()
    }
    # identical dots on the intersection (same quantization arithmetic)
    for p in set(exact) & set(bucketed):
        assert exact[p] == bucketed[p]
    recall = len(set(exact) & set(bucketed)) / len(exact)
    # deterministic (seeded centroids + symmetric 3-probe):
    # 0.94 at sf0.001, 0.92 at sf0.01
    assert recall >= 0.80, f"IVF bitext recall = {recall:.2f}"


def test_jl_projection_distance_distortion(spark, sf_dir):
    """The JL lemma property itself: squared pairwise distances in the
    16-dim projection concentrate around their 64-dim originals.  (The
    fixture's embeddings are near-random — top-5 neighbor identity is
    near-ties even in the ORIGINAL space, original-space neighbors
    share the label column only ~11% of the time — so rank
    preservation is not a meaningful measure here; the distortion band
    is, and it is deterministic under the seeded projector: measured
    10/50/90th percentile ratios 0.48/0.81/1.18 at sf0.01.)"""
    import numpy as np

    from swisscourtrulingcorpus_spark.operators.similarity import (
        jl_project,
        jl_projection_matrix,
    )
    from swisscourtrulingcorpus_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    m = jl_projection_matrix(64, 16, seed=7)
    proj = {
        r.vec_id: np.array([r[f"p{i}"] for i in range(16)])
        for r in jl_project(emb, m).collect()
    }
    orig = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in emb.collect()
        if r.embedding is not None
    }
    ids = sorted(orig)
    pairs = [
        (ids[i], ids[j])
        for i in range(0, min(100, len(ids)), 3)
        for j in range(i + 1, min(100, len(ids)), 7)
    ]
    ratios = np.array(
        [
            np.sum((proj[a] - proj[b]) ** 2)
            / max(np.sum((orig[a] - orig[b]) ** 2), 1e-12)
            for a, b in pairs
        ]
    )
    assert 0.5 <= np.median(ratios) <= 1.5
    # concentration: the heavy mass of ratios inside the JL band for
    # k=16 (eps ~ sqrt(8 ln n / k) is wide at this k — the band below
    # is what k=16 buys; tighter needs more dims, the standard dial)
    inside = np.mean((ratios >= 0.3) & (ratios <= 2.0))
    assert inside >= 0.85, f"JL band coverage = {inside:.2f}"


def test_jl_rerank_recall_vs_exact(spark, sf_dir):
    """Two-stage JL-shortlist + exact-rerank: returned cosines are the
    EXACT full-dimension values (stage 2 recomputes them — only the
    candidate set is approximate), and the shortlist size is a working
    recall dial (the fixture's embeddings are near-random, so small
    shortlists necessarily miss near-tie neighbors; reference
    measurement at 20 queries: 0.27 @ shortlist 20, 0.76 @ shortlist
    150 — this test uses 10 queries for runtime and re-asserts the
    floor on its own numbers)."""
    from pyspark.sql import functions as F

    from swisscourtrulingcorpus_spark.operators.similarity import (
        cosine_topk_bruteforce,
        jl_projection_matrix,
        jl_rerank_topk,
    )
    from swisscourtrulingcorpus_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    m = jl_projection_matrix(64, 16, seed=7)
    exact = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in cosine_topk_bruteforce(emb, queries, k=5).collect()
    }

    def run(sl):
        return {
            (r.query_id, r.neighbor_id): r.cosine
            for r in jl_rerank_topk(
                emb, queries, m, k=5, shortlist=sl
            ).collect()
        }

    small, large = run(20), run(150)
    for res in (small, large):
        for p in set(exact) & set(res):
            assert exact[p] == res[p]  # exact cosines, bit-identical
    r_small = len(set(exact) & set(small)) / len(exact)
    r_large = len(set(exact) & set(large)) / len(exact)
    assert r_large > r_small  # the shortlist IS the recall dial
    assert r_large >= 0.6, f"recall@5 with shortlist 150 = {r_large:.2f}"
