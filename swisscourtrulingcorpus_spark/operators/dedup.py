"""Deduplication operators for large-scale training-data pipelines.

Four escalating strategies, all expressed with built-in DataFrame ops
(JVM-side, codegen-friendly, no Python in the hot path):

- exact           : hash-groupBy on the full text. One shuffle.
- MinHash + LSH   : shingle → 32-bit portable hashes → per-doc min per
                    permutation → band → bucket join. The standard
                    near-dup pipeline (Broder '97 / Lee et al.
                    "Deduplicating Training Data Makes Language Models
                    Better").  Shuffle cost: one groupBy(doc) + one
                    self-join on band keys (tiny signature table).
- SimHash         : per-bit majority vote over shingle hashes
                    (Charikar '02); signature computed in one groupBy.
- n-gram Jaccard  : exact set similarity via an inverted shingle index
                    self-join — with stop-shingle removal so a frequent
                    shingle can't quadratically explode the join (the
                    classic scale failure mode of naive similarity join).

All hashes go through ``functions.hashing.h32`` (md5-based) so the
DuckDB oracle reproduces every number exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from swisscourtrulingcorpus_spark.functions.hashing import (
    h32,
    h32_sql,
    h32_window,
    md5_seeded,
    normalize_ws,
    normalize_ws_sql,
    word_shingles_from_words,
    word_shingles_from_words_sql,
)

NUM_MINHASH = 8
LSH_BANDS = 4  # 8 hashes / 4 bands => 2 rows per band


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact duplicate groups: keep min(id) per identical text, report
    group size (P9 `drop_duplicates` analogue, `dataset_creator.py:540`).

    groupBy on the text hash, not the text itself, so the shuffle moves
    16-byte keys instead of multi-KB documents at 100 TB.
    """
    return (
        df.select(F.col(id_col), F.col(text_col), F.md5(F.col(text_col)).alias("__h"))
        .groupBy("__h")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .drop("__h")
    )


def _spread(df: DataFrame, id_col: str, spread: bool) -> DataFrame:
    """Optionally repartition the narrow (id, text) input to the session's
    default parallelism BEFORE the CPU-heavy shingle/hash map stage.

    Shingle hashing costs far more CPU per byte than a scan, so its
    parallelism must not be bound by the source file layout: a corpus
    that arrives as a handful of small parquet files would otherwise run
    the whole hash pipeline on a handful of cores (measured at sf0.1:
    the 594 KB documents table scans as ONE partition — LSH warm time
    3.6s → 1.7s with the spread).  At petabyte scale the scan already
    yields thousands of partitions; callers there pass spread=False and
    skip the extra pass over the text."""
    if not spread:
        return df
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism, id_col)


def _shingle_sets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    drop_empty: bool = False,
    spread: bool = False,
) -> DataFrame:
    """(id, __sh: array<string>) — the DISTINCT k-shingle set per doc,
    computed entirely map-side.  Each projection binds its intermediate
    to a real column (``__w``, then ``__sh``) so Catalyst evaluates the
    split / shingle construction once per row, not once per reference
    (see word_shingles_from_words for why that matters).

    ``drop_empty`` filters docs with < k words — equivalent to (and much
    cheaper than) filtering ``size(__sh) > 0`` afterwards: predicate
    pushdown would copy the whole shingle-construction expression into
    the Filter node, doubling both per-row work and the generated-code
    size; ``size(__w) >= k`` only duplicates the split.

    Built via selectExpr (SQL-text twins in functions.hashing): the
    Column form cost ~200 py4j round trips per construction (guide §1 —
    the bench times construction too); one parsed string is one call.
    The analyzed plan is identical."""
    words = _spread(df.select(F.col(id_col), F.col(text_col)), id_col, spread).selectExpr(
        f"`{id_col}`",
        f"split({normalize_ws_sql(f'`{text_col}`')}, ' ') AS __w",
    )
    if drop_empty:
        words = words.where(F.size("__w") >= k)
    return words.selectExpr(
        f"`{id_col}`",
        f"array_distinct({word_shingles_from_words_sql('__w', k)}) AS __sh",
    )


def _shingled(
    df: DataFrame, text_col: str, id_col: str, k: int, spread: bool = False
) -> DataFrame:
    """One row per (doc, distinct shingle). The explode happens AFTER
    projecting away the document text, so the wide column never
    shuffles."""
    return _shingle_sets(df, text_col, id_col, k, spread=spread).select(
        id_col, F.explode("__sh").alias("shingle")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    num_hashes: int = NUM_MINHASH,
    spread: bool = False,
) -> DataFrame:
    """Per-document MinHash signature: for permutation j, the min of the
    seeded 32-bit hash over the doc's distinct shingles.  Columns
    ``mh0..mh{n-1}`` (BIGINT).  Empty docs (< k words) drop out —
    they have no shingles, hence no signature (same as the oracle).

    Computed with ``array_min(transform(...))`` over the per-doc shingle
    array — pure map-side narrow work, ZERO shuffles (the previous
    explode + groupBy formulation shuffled one row per (doc, shingle);
    at 100 TB that shuffle is ~50× the size of the corpus row count).

    Hash j = 4*s + w is hex window w (0..3) of md5(s|shingle): one md5
    digest yields FOUR independent 32-bit hashes, so 8 signatures cost
    2 md5 computations per shingle instead of 8 — md5 dominates the
    map CPU, which dominates the whole operator at scale.  Each per-seed
    digest array binds to its own column so it is evaluated once.
    """
    sets_ = _shingle_sets(df, text_col, id_col, k, drop_empty=True, spread=spread)
    n_seeds = (num_hashes + 3) // 4

    # SQL-text construction (r11): the Column/lambda form of these two
    # projections cost ~900 py4j round trips ≈ 0.3 s per bench-timed
    # construction; the parsed strings build the identical plan in two
    # calls.  Each per-seed digest array still binds to its own column
    # (__m{s}) so it is evaluated once per row.
    digests = sets_.selectExpr(
        f"`{id_col}`",
        *[
            f"transform(__sh, x -> md5(concat('{s}|', x))) AS __m{s}"
            for s in range(n_seeds)
        ],
    )

    def _mh_sql(j: int) -> str:
        s, w = divmod(j, 4)
        return (
            f"array_min(transform(__m{s}, x -> "
            f"cast(conv(substring(x, {1 + 8 * w}, 8), 16, 10) as bigint)"
            f")) AS mh{j}"
        )

    return digests.selectExpr(
        f"`{id_col}`", *[_mh_sql(j) for j in range(num_hashes)]
    )


def _banded(
    sig: DataFrame, id_col: str, num_hashes: int, bands: int
) -> DataFrame:
    """(id, band: int, band_key: bigint) — one row per (doc, band).

    The band key is the band's MinHash values packed bitwise into one
    BIGINT (``shiftleft(mh_i, 32) | mh_{i+1}``; each mh is a 32-bit
    value carried in a bigint, so for 2 rows/band the packing is an
    EXACT bijection — no collisions, unlike hashing a concat).  Join key
    = 12 bytes of ints instead of a ~25-byte string, and the join
    compares longs instead of strings.  Bands with > 2 rows fold the
    same way; there the packing wraps (bit truncation), which only
    merges buckets the way any LSH band-hash would — still
    deterministic, still reproducible.

    ``posexplode`` supplies the band index, keeping bucket spaces of
    different bands disjoint via the ("band", "band_key") compound key.
    """
    keys = _band_key_exprs(num_hashes, bands)
    # SQL-text construction (r12): one parsed string instead of ~3 py4j
    # round trips per packed key; identical analyzed plan.
    return sig.selectExpr(
        f"`{id_col}`",
        f"posexplode(array({', '.join(keys)})) AS (band, band_key)",
    )


def _band_key_exprs(num_hashes: int, bands: int) -> list[str]:
    """The packed band-key SQL expressions shared by :func:`_banded`
    and the whole-query SQL twins below — one definition so the two
    construction paths cannot drift."""
    rows_per_band = num_hashes // bands
    keys = []
    for b in range(bands):
        key = f"mh{b * rows_per_band}"
        for r in range(1, rows_per_band):
            key = f"shiftleft({key}, 32) | mh{b * rows_per_band + r}"
        keys.append(key)
    return keys


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    num_hashes: int = NUM_MINHASH,
    bands: int = LSH_BANDS,
    spread: bool = False,
) -> DataFrame:
    """Candidate near-duplicate pairs: docs agreeing on ALL hashes of at
    least one band.  Output (id_a < id_b) distinct.

    The self-join runs on the signature table (one short row per doc),
    never on the corpus — at 100 TB the bucket join input is ~0.01% of
    the data.  Skewed buckets (many docs sharing a band) are AQE's
    skew-join case.
    """
    sig = minhash_signatures(df, text_col, id_col, k, num_hashes, spread=spread)
    # One explicit shuffle on the join key: both self-join sides (and any
    # downstream groupBy on band_key) hang off the SAME Exchange, which
    # Spark de-duplicates via ReusedExchange — without it the whole
    # map-side signature computation (scan + shingling + 8 md5s/shingle)
    # runs twice, once per join side.  Measured at sf0.1 (with spread):
    # one-shot 8.0s → 3.5s.
    banded = _banded(sig, id_col, num_hashes, bands).repartition(
        F.col("band"), F.col("band_key")
    )
    left = banded.alias("a")
    right = banded.alias("b")
    return (
        left.join(right, on=["band", "band_key"])
        .where(f"a.`{id_col}` < b.`{id_col}`")
        .selectExpr(f"a.`{id_col}` AS id_a", f"b.`{id_col}` AS id_b")
        .distinct()
    )


def lsh_verified_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    num_hashes: int = NUM_MINHASH,
    bands: int = LSH_BANDS,
    max_chars: int = 2000,
    threshold_pct: int = 30,
) -> DataFrame:
    """Exact edit-distance VERIFICATION of LSH candidate pairs — the
    standard second stage of banded near-dup dedup (band collisions are
    probabilistic; production pipelines confirm candidates with a real
    similarity before dropping documents, cf. the verify step in
    Gyawali et al. 2020 "Exclusion criteria for large-scale corpus
    dedup", public).  Output per candidate pair: (id_a, id_b,
    edit_dist, max_len, dist_pct, verified) — all ints/bool, where
    verified ⇔ 100*edit_dist <= threshold_pct * max_len (exact integer
    cross-multiply; dist_pct is the truncated ratio for reporting).

    Scale shape: candidates come from the banded signature self-join
    (`minhash_lsh_candidates` — never all-pairs); the text projection
    is pulled ONLY for docs that appear in some candidate pair
    (semi-join pruned) and capped at ``max_chars``, so the O(n·m)
    Levenshtein cost is bounded by candidate count × cap², independent
    of corpus size.  The distance runs on an ASCII projection of the
    normalized text (non-ASCII stripped identically on both engines):
    Spark's `levenshtein` counts UTF-16 chars while DuckDB's counts
    BYTES — on pure ASCII the two agree exactly, making the gate
    engine-independent (a documented deviation: multi-byte chars don't
    contribute to the distance).
    """
    cands = minhash_lsh_candidates(df, text_col, id_col, k, num_hashes, bands)
    ids = cands.select(F.col("id_a").alias(id_col)).union(
        cands.select(F.col("id_b").alias(id_col))
    ).distinct()
    proj = (
        df.join(ids, on=id_col, how="left_semi")
        .select(
            F.col(id_col),
            F.substring(
                F.regexp_replace(
                    normalize_ws(text_col), r"[^\x20-\x7e]", ""
                ),
                1,
                max_chars,
            ).alias("__t"),
        )
    )
    ta = proj.select(F.col(id_col).alias("id_a"), F.col("__t").alias("__ta"))
    tb = proj.select(F.col(id_col).alias("id_b"), F.col("__t").alias("__tb"))
    j = cands.join(ta, on="id_a").join(tb, on="id_b")
    ed = F.levenshtein("__ta", "__tb").cast("long")
    max_len = F.greatest(F.length("__ta"), F.length("__tb")).cast("long")
    bound = j.select(
        "id_a",
        "id_b",
        ed.alias("edit_dist"),
        F.greatest(max_len, F.lit(1)).alias("max_len"),
    )
    return bound.select(
        "id_a",
        "id_b",
        "edit_dist",
        "max_len",
        F.expr("(100 * edit_dist) DIV max_len").alias("dist_pct"),
        (F.col("edit_dist") * 100 <= F.lit(threshold_pct) * F.col("max_len")).alias(
            "verified"
        ),
    )


def minhash_dedup_groups(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    num_hashes: int = NUM_MINHASH,
    bands: int = LSH_BANDS,
    spread: bool = False,
) -> DataFrame:
    """Scale path for LSH dedup: per-document cluster REPRESENTATIVE
    instead of candidate pairs.

    Pair enumeration is quadratic in duplicate-group size (a 10k-copy
    boilerplate document yields 50M pairs — measured: a 20×-duplicated
    100k-doc corpus produced 1.3M pairs).  Production dedup instead
    assigns each doc the min id over its LSH buckets: one row per doc,
    ``keep = (representative == id)``.  This is the single-pass
    min-over-buckets approximation of connected components — docs
    sharing any band collapse to one survivor; chains longer than one
    hop may keep an extra doc (acceptable for near-dup dedup, and the
    standard trade in large-scale pipelines).

    Cost: two shuffles (bucket min, doc min) over short rows, NO
    quadratic term.
    """
    sig = minhash_signatures(df, text_col, id_col, k, num_hashes, spread=spread)
    return dedup_groups_from_signatures(sig, id_col, num_hashes, bands)


def quality_dedup_representatives(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    num_hashes: int = NUM_MINHASH,
    bands: int = LSH_BANDS,
) -> DataFrame:
    """LSH dedup representatives chosen by QUALITY instead of min id:
    each near-dup group keeps its LONGEST member (token count; ties →
    min id) — the standard representative rule of production dedup
    (truncated/partial copies collapse into the fullest version, which
    min-id cannot guarantee).

    Same one-pass min-over-buckets approximation class as
    `minhash_dedup_groups`, with argmax instead of min: per LSH bucket
    the best (n_words desc, id asc) member, then per doc the best over
    its buckets — two slim shuffles of (key, int, int) rows, no pair
    enumeration, no quadratic term.  Output (doc_id, rep_id,
    rep_n_words, keep).
    """
    from pyspark.sql import Window

    sig = minhash_signatures(df, text_col, id_col, k, num_hashes, spread=True)
    # explicit shuffle on the bucket key so BOTH consumers (the
    # bucket-argmax window and the final join back) hang off one
    # ReusedExchange — without it the signature computation (the whole
    # MinHash CPU cost) runs twice, same idiom as minhash_lsh_candidates
    banded = _banded(sig, id_col, num_hashes, bands).repartition(
        F.col("band"), F.col("band_key")
    )
    nw = df.select(
        F.col(id_col),
        F.size(F.split(normalize_ws(text_col), " ")).cast("bigint").alias("n_words"),
    )
    sb = banded.join(nw, on=id_col)
    wb = Window.partitionBy("band", "band_key").orderBy(
        F.col("n_words").desc(), F.col(id_col).asc()
    )
    bucket_best = (
        sb.withColumn("__rn", F.row_number().over(wb))
        .where(F.col("__rn") == 1)
        .select(
            "band",
            "band_key",
            F.col(id_col).alias("best_id"),
            F.col("n_words").alias("best_n"),
        )
    )
    wd = Window.partitionBy(id_col).orderBy(
        F.col("best_n").desc(), F.col("best_id").asc()
    )
    return (
        banded.join(bucket_best, on=["band", "band_key"])
        .withColumn("__rn", F.row_number().over(wd))
        .where(F.col("__rn") == 1)
        .select(
            F.col(id_col),
            F.col("best_id").alias("rep_id"),
            F.col("best_n").alias("rep_n_words"),
            (F.col("best_id") == F.col(id_col)).alias("keep"),
        )
    )


def dedup_groups_from_signatures(
    sig: DataFrame,
    id_col: str,
    num_hashes: int = NUM_MINHASH,
    bands: int = LSH_BANDS,
) -> DataFrame:
    """Signature-level core of :func:`minhash_dedup_groups` — shared
    with :func:`incremental_minhash_dedup_sig` so the representative
    logic (tie-breaks, skew handling) lives in ONE place."""
    # Same ReusedExchange trick as minhash_lsh_candidates: the explicit
    # band_key shuffle is computed once and feeds BOTH the bucket-min
    # aggregation (no further exchange — already partitioned on the
    # grouping key) and the probe side of the join.
    banded = _banded(sig, id_col, num_hashes, bands).repartition(
        F.col("band"), F.col("band_key")
    )
    bucket_min = banded.groupBy("band", "band_key").agg(
        F.expr(f"min(`{id_col}`) AS bucket_rep")
    )
    return (
        banded.join(bucket_min, on=["band", "band_key"])
        .groupBy(id_col)
        .agg(F.expr("min(bucket_rep) AS representative"))
        .selectExpr(
            f"`{id_col}`",
            "representative",
            f"(representative = `{id_col}`) AS keep",
        )
    )


def _minhash_signatures_select(
    table: str,
    text_col: str,
    id_col: str,
    k: int = 3,
    num_hashes: int = NUM_MINHASH,
    spread_partitions: int | None = None,
) -> str:
    """Whole-query SQL text of :func:`minhash_signatures` over a
    FROM-able table expression (r12, session 2 — see
    :func:`ngram_jaccard_pairs_sql` for the why; plan equality is
    pinned by tests/test_sql_construction.py)."""
    norm = normalize_ws_sql(f"`{text_col}`")
    sh = word_shingles_from_words_sql("__w", k)
    n_seeds = (num_hashes + 3) // 4
    spread_hint = (
        f"/*+ REPARTITION({int(spread_partitions)}, `{id_col}`) */ "
        if spread_partitions
        else ""
    )
    digest_cols = ", ".join(
        f"transform(__sh, x -> md5(concat('{s}|', x))) AS __m{s}"
        for s in range(n_seeds)
    )

    def mh(j: int) -> str:
        s, w = divmod(j, 4)
        return (
            f"array_min(transform(__m{s}, x -> "
            f"cast(conv(substring(x, {1 + 8 * w}, 8), 16, 10) as bigint)"
            f")) AS mh{j}"
        )

    mh_cols = ", ".join(mh(j) for j in range(num_hashes))
    return f"""
  SELECT `{id_col}`, {mh_cols} FROM (
    SELECT `{id_col}`, {digest_cols} FROM (
      SELECT `{id_col}`, array_distinct({sh}) AS __sh FROM (
        SELECT `{id_col}`, split({norm}, ' ') AS __w FROM (
          SELECT {spread_hint}`{id_col}`, `{text_col}` FROM {table}
        )
      ) WHERE size(__w) >= {k}
    )
  )"""


def _banded_cte(
    sig_select: str, id_col: str, num_hashes: int, bands: int
) -> str:
    """``banded AS (...)`` CTE text: posexplode of the packed band keys
    over a signature subquery + the explicit (band, band_key)
    repartition both consumers hang off (the ReusedExchange idiom of
    :func:`minhash_lsh_candidates`)."""
    keys = ", ".join(_band_key_exprs(num_hashes, bands))
    return f"""banded AS (
  SELECT /*+ REPARTITION(band, band_key) */ * FROM (
    SELECT `{id_col}`, posexplode(array({keys})) AS (band, band_key)
    FROM ({sig_select})
  )
)"""


def minhash_lsh_candidates_sql(
    table: str,
    text_col: str,
    id_col: str,
    k: int = 3,
    num_hashes: int = NUM_MINHASH,
    bands: int = LSH_BANDS,
    spread_partitions: int | None = None,
) -> str:
    """Whole-query SQL text of :func:`minhash_lsh_candidates` (r12,
    session 2; plan equality pinned by
    tests/test_sql_construction.py)."""
    sig = _minhash_signatures_select(
        table, text_col, id_col, k, num_hashes, spread_partitions
    )
    return f"""
WITH {_banded_cte(sig, id_col, num_hashes, bands)}
SELECT DISTINCT id_a, id_b FROM (
  SELECT a.`{id_col}` AS id_a, b.`{id_col}` AS id_b
  FROM banded a JOIN banded b USING (band, band_key)
  WHERE a.`{id_col}` < b.`{id_col}`
)
"""


def minhash_dedup_groups_sql(
    table: str,
    text_col: str,
    id_col: str,
    k: int = 3,
    num_hashes: int = NUM_MINHASH,
    bands: int = LSH_BANDS,
    spread_partitions: int | None = None,
) -> str:
    """Whole-query SQL text of :func:`minhash_dedup_groups` (r12,
    session 2; plan equality pinned by
    tests/test_sql_construction.py)."""
    sig = _minhash_signatures_select(
        table, text_col, id_col, k, num_hashes, spread_partitions
    )
    return f"""
WITH {_banded_cte(sig, id_col, num_hashes, bands)},
bucket_min AS (
  SELECT band, band_key, min(`{id_col}`) AS bucket_rep
  FROM banded GROUP BY band, band_key
)
SELECT `{id_col}`, representative, (representative = `{id_col}`) AS keep
FROM (
  SELECT `{id_col}`, min(bucket_rep) AS representative
  FROM banded JOIN bucket_min USING (band, band_key)
  GROUP BY `{id_col}`
)
"""


def simhash64(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    bits: int = 32,
    spread: bool = False,
) -> DataFrame:
    """SimHash signature: bit b of the signature is the majority vote of
    bit b across the doc's shingle hashes.

    Map-side only: hash the per-doc shingle array once (bound to a real
    column so it's evaluated once), then each bit's vote is
    ``2 * count(bit set) - n >= 0`` via ``filter`` + ``size`` — ZERO
    shuffles, all inside whole-stage codegen.
    """
    hashed = (
        _shingle_sets(df, text_col, id_col, k, drop_empty=True, spread=spread)
        .select(
            id_col,
            F.transform(F.col("__sh"), lambda s: h32(s, seed="sim")).alias("__hs"),
        )
    )
    def _ones(b: int):
        # one-parameter lambda on purpose: two parameters would select
        # pyspark's (element, index) filter form and shadow ``b``.
        return F.size(
            F.filter(
                F.col("__hs"),
                lambda h: F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1,
            )
        )

    sig = None
    for b in range(bits):
        term = F.when(
            _ones(b) * 2 >= F.size("__hs"), F.lit(1 << b).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))
        sig = term if sig is None else sig + term
    return hashed.select(F.col(id_col), sig.alias("simhash"))


def banded_hamming_pairs(
    fp: DataFrame,
    hash_col: str,
    id_col: str = "doc_id",
    threshold: int = 3,
    n_bands: int = 4,
    band_bits: int = 14,
    out_a: str = "doc_a",
    out_b: str = "doc_b",
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Generic banded-hamming near-dup pairing over a slim
    (id, <hash bigint>) table — ONE implementation behind
    `simhash_hamming_pairs` (text), the image dHash gate, and the
    audio energy-hash gate.  ``group_cols`` adds partition keys to the
    band equi-join (e.g. modality over a heterogeneous media corpus):
    pairs only form within a group, and because the columns ride the
    SAME single join no second pass or post-filter is needed.
    Candidates come from an EQUI-join on
    ``n_bands`` x ``band_bits`` bit-bands; by pigeonhole, hamming <=
    ``threshold`` differing bits touch at most ``threshold`` bands, so
    with ``threshold <= n_bands - 1`` at least one band is untouched —
    recall is PERFECT for ``threshold <= n_bands - 1``
    (asserted), including for hashes wider than the banded span
    (a differing bit OUTSIDE every band touches zero bands) and for
    sign-folded 64-bit values (arithmetic shiftright + mask reads the
    same band bits).  Each candidate emits from its FIRST matching
    band only — a free map-side filter computed from the two hashes,
    never a pair-output-sized distinct — then the exact popcount
    filter runs on candidates alone.

    Returns (out_a, out_b, hamming:int) with out_a < out_b.
    """
    assert threshold <= n_bands - 1, "pigeonhole recall needs threshold <= n_bands - 1"
    mask = (1 << band_bits) - 1
    grp = [F.col(c) for c in group_cols]
    bands = fp.select(
        *grp,
        F.col(id_col).alias("__id"),
        F.col(hash_col).alias("__h"),
        F.posexplode(
            F.array(
                *[
                    F.expr(f"shiftright({hash_col}, {band_bits * j}) & {mask}")
                    for j in range(n_bands)
                ]
            )
        ).alias("band", "band_key"),
    )
    left = bands.select(
        *group_cols,
        F.col("__id").alias(out_a),
        F.col("__h").alias("__ha"),
        "band",
        "band_key",
    )
    right = bands.select(
        *group_cols,
        F.col("__id").alias(out_b),
        F.col("__h").alias("__hb"),
        "band",
        "band_key",
    )
    first_band = "CASE " + " ".join(
        f"WHEN (shiftright(__ha, {band_bits * j}) & {mask}) = "
        f"(shiftright(__hb, {band_bits * j}) & {mask}) THEN {j}"
        for j in range(n_bands)
    ) + " END"
    return (
        left.join(right, on=["band", "band_key", *group_cols])
        .where(F.col(out_a) < F.col(out_b))
        .where(F.col("band") == F.expr(first_band))
        .withColumn("hamming", F.expr("bit_count(__ha ^ __hb)"))
        .where(F.col("hamming") <= threshold)
        .select(*group_cols, out_a, out_b, "hamming")
    )


def banded_hamming_probe(
    probe: DataFrame,
    registry: DataFrame,
    hash_col: str,
    id_col: str = "doc_id",
    threshold: int = 3,
    n_bands: int = 4,
    band_bits: int = 14,
    out_a: str = "doc_a",
    out_b: str = "doc_b",
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """ASYMMETRIC banded-hamming lookup: which probe-side fingerprints
    near-match a REGISTRY fingerprint?  The incremental twin of
    `banded_hamming_pairs` — a streaming ingest probes each
    micro-batch against the accumulated registry instead of
    re-self-joining history (history is only ever touched through its
    fingerprint table, the `incremental_minhash_dedup` contract).

    Same banding, same pigeonhole recall bound, same first-matching-
    band single-emission (a probe/registry candidate sharing several
    bands still emits once, via a free map-side filter — never a
    pair-output-sized distinct).  Returns (out_a = probe id, out_b =
    registry id, hamming) — NOT id-ordered: the sides are
    semantically different tables.  Probe ids present in the registry
    never self-match (id equality is excluded), so at-least-once
    replays that re-probe committed docs don't fabricate pairs.
    """
    assert threshold <= n_bands - 1, "pigeonhole recall needs threshold <= n_bands - 1"
    mask = (1 << band_bits) - 1

    def _bands(df: DataFrame, out_id: str, out_h: str) -> DataFrame:
        return df.select(
            *[F.col(c) for c in group_cols],
            F.col(id_col).alias(out_id),
            F.col(hash_col).alias(out_h),
            F.posexplode(
                F.array(
                    *[
                        F.expr(f"shiftright({hash_col}, {band_bits * j}) & {mask}")
                        for j in range(n_bands)
                    ]
                )
            ).alias("band", "band_key"),
        )

    left = _bands(probe, out_a, "__ha")
    right = _bands(registry, out_b, "__hb")
    first_band = "CASE " + " ".join(
        f"WHEN (shiftright(__ha, {band_bits * j}) & {mask}) = "
        f"(shiftright(__hb, {band_bits * j}) & {mask}) THEN {j}"
        for j in range(n_bands)
    ) + " END"
    return (
        left.join(right, on=["band", "band_key", *group_cols])
        .where(F.col(out_a) != F.col(out_b))
        .where(F.col("band") == F.expr(first_band))
        .withColumn("hamming", F.expr("bit_count(__ha ^ __hb)"))
        .where(F.col("hamming") <= threshold)
        .select(*group_cols, out_a, out_b, "hamming")
    )


def simhash_hamming_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    bits: int = 32,
    blocks: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-duplicate PAIRS by Hamming distance — the classic
    web-scale dedup (Manku et al. 2007, Google's simhash crawl dedup,
    public): split each signature into ``blocks`` equal bit-blocks;
    by pigeonhole, two signatures within Hamming distance
    ``blocks - 1`` agree EXACTLY on at least one block, so the
    block-value equi-join has PERFECT recall for ``max_hamming <=
    blocks - 1`` (unlike MinHash banding this stage is not
    probabilistic — only the simhash fingerprint itself is lossy).
    Candidates verify with ``bit_count(xor)``.

    Scale shape: the self-join runs on (block, 8-bit value) keys over
    the signature table (one short row per doc, like the MinHash band
    join); verification is one integer op per candidate pair.  Output
    (id_a < id_b, hamming) — each pair emitted exactly once via
    `banded_hamming_pairs`' first-matching-band filter (the former
    pair-output-sized distinct() is gone — review r07).
    """
    sig = simhash64(df, text_col, id_col, k, bits)
    pairs = banded_hamming_pairs(
        sig,
        "simhash",
        id_col=id_col,
        threshold=max_hamming,
        n_bands=blocks,
        band_bits=bits // blocks,
        out_a="id_a",
        out_b="id_b",
    )
    # hamming as BIGINT: the gate's committed oracle schema predates
    # the shared helper (which emits the natural int of bit_count)
    return pairs.withColumn("hamming", F.col("hamming").cast("bigint"))


def contamination_check(
    eval_df: DataFrame,
    train_df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    spread: bool = False,
) -> DataFrame:
    """Test-set decontamination: per eval doc, how many of its distinct
    k-gram shingles also occur ANYWHERE in the train corpus (the
    standard train/test overlap check for LLM data pipelines).

    Shingles are joined on their 32-bit md5 hash, not the raw string —
    at 100 TB the shuffled keys are 8 bytes instead of ~50-byte
    n-grams.  A hash collision can count one extra shared shingle per
    ~4B distinct-pair comparisons; it is deterministic and identical in
    the SQL oracle (same md5), so parity holds.  Output: id, n_shared,
    n_total, contamination = n_shared / n_total (int/int division —
    bit-identical across engines).

    Plan: ONE eval shingle scan and one train shingle scan.  The train
    side is distinct on the hash, so a LEFT join cannot fan out eval
    rows — total and shared counts come from the same aggregation
    (``count(*)`` vs ``count(__hit)``), with no second eval scan and no
    totals⋈shared re-join.  Both shuffles move 8-byte keys only.
    """
    ev = _shingled(eval_df, text_col, id_col, k, spread=spread).selectExpr(
        f"`{id_col}`", f"{h32_sql('shingle')} AS __h"
    )
    tr = (
        _shingled(train_df, text_col, id_col, k, spread=spread)
        .selectExpr(f"{h32_sql('shingle')} AS __h")
        .distinct()
        .selectExpr("*", "1 AS __hit")
    )
    return (
        ev.join(tr, on="__h", how="left")
        .groupBy(id_col)
        .agg(
            F.expr("count(__hit) AS n_shared"),
            F.expr("count(1) AS n_total"),
        )
        .selectExpr(
            f"`{id_col}`",
            "n_shared",
            "n_total",
            "(n_shared / n_total) AS contamination",
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    threshold: float = 0.2,
    max_doc_freq: int = 100,
    spread: bool = False,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing >= 1 rare shingle.

    Inverted-index self-join: explode distinct shingles, drop shingles
    appearing in more than ``max_doc_freq`` docs (stop-shingle removal —
    without it one ubiquitous shingle makes the join quadratic), join on
    shingle, count shared, Jaccard = shared / (|A| + |B| - shared).

    The per-doc shingle-set size is computed map-side (``size(__sh)``)
    and carried THROUGH the explode, so the pair aggregation groups on
    (id_a, id_b, n_a, n_b) and emits Jaccard directly — no size lookup
    joins after the self-join (two fewer joins than the naive plan).

    The inverted index is keyed on the 32-bit md5 hash of the shingle,
    not the string: the shuffled/joined key is 8 bytes instead of a
    ~20-byte n-gram, and the self-join compares longs.  The oracle
    hashes identically (same md5 windows), so a collision — which would
    merge two shingles' postings — is reproduced bit-for-bit there.

    r11 optimization: the doc-frequency filter is a COUNT WINDOW over
    the postings' __h Exchange instead of a separate groupBy+join.  The
    r10 groupBy formulation intended one shared Exchange, but column
    pruning narrowed the aggregation's subtree (only __h survives below
    its Exchange) while the join sides kept (doc_id, n_sh, __h) — the
    subtrees no longer canonicalized equal, so NOTHING was reused and
    the scan + tokenize + shingle + md5 chain ran FOUR times (plan
    evidence: plans/r11/ngram_jaccard_pairs_before.txt, four separate
    `Scan parquet` subtrees).  With the window, the postings subtree is
    defined ONCE; the self-join's two sides canonicalize identically
    (the Window also blocks non-partition-key predicate pushdown, so
    the join's isnotnull(id) filters stay ABOVE the shared Exchange)
    and the second side becomes a ReusedExchange — one scan, one
    tokenize pass, one shuffle of 24-byte posting rows
    (plans/r11/ngram_jaccard_pairs_after.txt).  Trade-off, documented:
    WindowExec buffers one bucket (= one shingle hash's postings) per
    group; buckets above ``max_doc_freq`` are dropped right after
    counting, and a hot stop-shingle bucket spills to disk rather than
    OOM — far cheaper at any scale than re-reading and re-tokenizing
    the corpus three extra times.
    """
    from pyspark.sql import Window

    posts = (
        _shingle_sets(df, text_col, id_col, k, drop_empty=True, spread=spread)
        .selectExpr(
            f"`{id_col}`",
            "size(__sh) AS n_sh",
            "explode(__sh) AS shingle",
        )
        .selectExpr(f"`{id_col}`", "n_sh", f"{h32_sql('shingle')} AS __h")
        .repartition(F.col("__h"))
    )
    # Hot-bucket buffering (VERDICT r11 item 4, guide §2.5): the count
    # window buffers one __h bucket (sort + WindowExec group buffer)
    # before the __df filter can drop it, so a stop-shingle shared by
    # a large corpus fraction spills its bucket to disk before being
    # discarded.  Two bounded-buffer guards were built and A/B'd in
    # r12, and both REJECTED on measurement (guide §1.1: the "ideal"
    # plan lost to the empirical loop; OPTIMIZATION_r12.md §4, plans in
    # plans/r12/ngram_jaccard_pairs_guard*.txt):
    # - broadcast anti-join of over-threshold keys (rank probe off the
    #   same exchange): adds a blocking stage + broadcast before the
    #   pair join can start — 1.50 -> 2.05 s at sf0.1;
    # - WindowGroupLimit cap (row_number <= max_doc_freq + 1 filter
    #   below this count window; identical keep/drop set): bounds
    #   every buffer at 101 rows but adds a second non-codegen window
    #   pass on BOTH self-join sides — 1.47 -> 1.77 s at sf0.1.
    # The uncapped count window stays: WindowExec spills (never OOMs)
    # and the hot bucket is read/written once, which both measured
    # guards exceeded in steady-state cost.  Revisit only with
    # evidence of real stop-shingle spill at production scale.
    rare = (
        posts.selectExpr("*", "count(1) OVER (PARTITION BY __h) AS __df")
        .where(f"__df <= {int(max_doc_freq)}")
        .select(id_col, "n_sh", "__h")
    )

    a = rare.selectExpr(f"`{id_col}` AS id_a", "n_sh AS n_a", "__h")
    b = rare.selectExpr(f"`{id_col}` AS id_b", "n_sh AS n_b", "__h")
    return (
        a.join(b, on="__h")
        .where("id_a < id_b")
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.expr("count(1) AS shared"))
        .selectExpr(
            "id_a",
            "id_b",
            # int/int division -> identical double in Spark and DuckDB;
            # no round() (engines' rounding of doubles differs).
            "(shared / (n_a + n_b - shared)) AS jaccard",
        )
        .where(f"jaccard >= {threshold!r}D")
    )


def ngram_jaccard_pairs_sql(
    table: str,
    text_col: str,
    id_col: str,
    k: int = 3,
    threshold: float = 0.2,
    max_doc_freq: int = 100,
    spread_partitions: int | None = None,
) -> str:
    """Whole-query SQL text of :func:`ngram_jaccard_pairs` over a
    FROM-able table expression (r12, session 2) — ONE parsed statement
    instead of ~250 py4j round trips of chained-DataFrame construction
    (guide §1; the bench times construction 3× per query).  Keep in
    lockstep with the DataFrame form above: the optimized plans are
    asserted string-identical by
    tests/test_sql_construction.py::test_sql_twin_plans_identical, so
    the plan-shape guarantees documented there (single postings scan,
    ReusedExchange on the self-join, count-window doc-frequency filter)
    carry over unchanged.  ``spread_partitions`` is the SQL analogue of
    ``spread=True`` (REPARTITION hint; pass
    ``sc.defaultParallelism``)."""
    norm = normalize_ws_sql(f"`{text_col}`")
    sh = word_shingles_from_words_sql("__w", k)
    spread_hint = (
        f"/*+ REPARTITION({int(spread_partitions)}, `{id_col}`) */ "
        if spread_partitions
        else ""
    )
    return f"""
WITH rare AS (
  SELECT `{id_col}`, n_sh, __h FROM (
    SELECT *, count(1) OVER (PARTITION BY __h) AS __df FROM (
      SELECT /*+ REPARTITION(__h) */ * FROM (
        SELECT `{id_col}`, n_sh, {h32_sql('shingle')} AS __h FROM (
          SELECT `{id_col}`, size(__sh) AS n_sh, explode(__sh) AS shingle
          FROM (
            SELECT `{id_col}`, array_distinct({sh}) AS __sh FROM (
              SELECT `{id_col}`, split({norm}, ' ') AS __w FROM (
                SELECT {spread_hint}`{id_col}`, `{text_col}` FROM {table}
              )
            ) WHERE size(__w) >= {k}
          )
        )
      )
    )
  ) WHERE __df <= {int(max_doc_freq)}
)
SELECT * FROM (
  SELECT id_a, id_b, (shared / (n_a + n_b - shared)) AS jaccard FROM (
    SELECT id_a, id_b, n_a, n_b, count(1) AS shared
    FROM (SELECT `{id_col}` AS id_a, n_sh AS n_a, __h FROM rare)
    JOIN (SELECT `{id_col}` AS id_b, n_sh AS n_b, __h FROM rare) USING (__h)
    WHERE id_a < id_b
    GROUP BY id_a, id_b, n_a, n_b
  )
) WHERE jaccard >= {threshold!r}D
"""


def contamination_check_sql(
    eval_table: str,
    train_table: str,
    text_col: str,
    id_col: str,
    k: int = 5,
    spread_partitions: int | None = None,
) -> str:
    """Whole-query SQL text of :func:`contamination_check` (r12,
    session 2; see :func:`ngram_jaccard_pairs_sql` for the why and the
    equivalence pin).  ``eval_table`` / ``train_table`` are FROM-able
    expressions — a view name or a parenthesized subquery like
    ``(SELECT ... FROM v WHERE ...)``."""
    norm = normalize_ws_sql(f"`{text_col}`")
    sh = word_shingles_from_words_sql("__w", k)
    spread_hint = (
        f"/*+ REPARTITION({int(spread_partitions)}, `{id_col}`) */ "
        if spread_partitions
        else ""
    )

    def shingled(table: str, cols: str) -> str:
        # mirrors _shingled: spread -> split -> distinct shingle set ->
        # explode in the select list (text projected away before the
        # explode), exactly the Generate shape the DataFrame form makes
        return f"""
  SELECT {cols}explode(__sh) AS shingle FROM (
    SELECT `{id_col}`, array_distinct({sh}) AS __sh FROM (
      SELECT `{id_col}`, split({norm}, ' ') AS __w FROM (
        SELECT {spread_hint}`{id_col}`, `{text_col}` FROM {table}
      )
    )
  )"""

    ev = shingled(eval_table, f"`{id_col}`, ")
    tr = shingled(train_table, "")
    return f"""
WITH ev AS (
  SELECT `{id_col}`, {h32_sql('shingle')} AS __h FROM ({ev})
),
tr AS (
  SELECT *, 1 AS __hit FROM (
    SELECT DISTINCT __h FROM (
      SELECT {h32_sql('shingle')} AS __h FROM ({tr})
    )
  )
)
SELECT `{id_col}`, n_shared, n_total, (n_shared / n_total) AS contamination
FROM (
  SELECT `{id_col}`, count(__hit) AS n_shared, count(1) AS n_total
  FROM ev LEFT JOIN tr USING (__h)
  GROUP BY `{id_col}`
)
"""


def paragraph_dedup(
    df: DataFrame,
    id_col: str,
    paras_col: str,
) -> DataFrame:
    """Cross-document paragraph dedup (the Lee-et-al-style boilerplate
    removal a pretraining corpus needs: identical Rechtsmittelbelehrung
    blocks, platform footers and shared templates collapse to their
    first occurrence corpus-wide).

    Input: one row per document with an array of paragraphs.  Output:
    one row per (document, paragraph position) with a ``kept`` flag —
    True only on the globally FIRST occurrence of that paragraph text
    (ordered by (id, position), so the result is deterministic on any
    cluster).

    Scale shape: explode → shuffle on the 16-byte md5 of the paragraph
    (never the text itself) → min_by partial-aggregates map-side; the
    join back to flag keepers is on the same hash, so AQE reuses the
    exchange.  Nothing here is quadratic and no document text moves
    through the shuffle."""
    exploded = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(F.col(paras_col)).alias("__pos", "__para"),
    ).withColumn("__h", F.md5(F.col("__para")))
    first = exploded.groupBy("__h").agg(
        F.min(F.struct("__id", "__pos")).alias("__first")
    )
    return (
        exploded.join(first, on="__h")
        .select(
            F.col("__id").alias(id_col),
            F.col("__pos").alias("pos"),
            F.col("__para").alias("paragraph"),
            (
                (F.col("__id") == F.col("__first.__id"))
                & (F.col("__pos") == F.col("__first.__pos"))
            ).alias("kept"),
        )
    )


def transitive_dedup_clusters(
    pairs: DataFrame,
    left_col: str = "id_a",
    right_col: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Connected components over a near-duplicate pair graph (the
    transitive closure `minhash_dedup_groups`' single-pass
    representative cannot give when a cluster spans multiple LSH
    bands): iterative min-label propagation — every node repeatedly
    adopts the smallest label among itself and its neighbours until no
    label changes.

    Scale shape: each round is one groupBy on the node id (shuffle on
    ids only, never payloads); convergence takes O(cluster diameter)
    rounds — near-dup clusters are shallow (diameter ≤ a handful), so
    the loop is bounded in practice and hard-capped by
    ``max_iterations``.  Each round materializes via ``localCheckpoint``
    so the lineage (and its re-execution cost) doesn't grow with the
    iteration count.

    Returns (node, cluster) with cluster = the minimum node id reachable
    from the node.
    """
    edges = (
        pairs.select(F.col(left_col).alias("src"), F.col(right_col).alias("dst"))
        .union(pairs.select(F.col(right_col).alias("src"), F.col(left_col).alias("dst")))
        .distinct()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("cluster", F.col("node"))
    )
    for _ in range(max_iterations):
        neighbour_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("cluster").alias("nbr_cluster"))
        )
        updated = (
            labels.join(neighbour_min, labels.node == neighbour_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("cluster"), F.coalesce(F.col("nbr_cluster"), F.col("cluster"))
                ).alias("cluster"),
            )
        )
        updated = updated.localCheckpoint(eager=True)
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), "node")
            .where(F.col("u.cluster") != F.col("l.cluster"))
            .limit(1)
            .count()
        )
        labels = updated
        if changed == 0:
            break
    return labels


def incremental_minhash_dedup(
    new_docs: DataFrame,
    store_sig: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    num_hashes: int = NUM_MINHASH,
    bands: int = LSH_BANDS,
    spread: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Dedup a NEW batch against an existing signature STORE — the
    ingestion-time shape at 100 TB: history is never re-scanned, only
    its fixed-width signature table (``minhash_signatures`` schema,
    one short row per historic doc) joins against the new batch.

    Three relational steps, all linear (no pair materialization):

    1. new-batch signatures — the zero-shuffle map;
    2. batch-internal representative per LSH bucket (min id over every
       bucket a doc occupies — the ``minhash_dedup_groups`` linear
       form): only self-representatives go on;
    3. banded anti-join against the store: an internal representative
       sharing ANY band bucket with a stored signature duplicates
       history and drops.  (Single-pass chain caveat, as in
       ``minhash_dedup_groups``: a representative whose only link to
       history runs THROUGH a dropped batch-mate survives — a
       transitive near-dup may be admitted.)

    Returns ``(survivors, updated_store)``: the surviving new ids and
    ``store_sig ∪ survivors' signatures`` — commit the updated store
    through `sources/versioned.py::commit_version` (base-checked) for
    snapshot-isolated, lost-update-safe history.
    """
    new_sig = minhash_signatures(
        new_docs, text_col, id_col, k, num_hashes, spread=spread
    )
    return incremental_minhash_dedup_sig(
        new_sig, store_sig, id_col, num_hashes, bands
    )


def incremental_minhash_dedup_sig(
    new_sig: DataFrame,
    store_sig: DataFrame,
    id_col: str,
    num_hashes: int = NUM_MINHASH,
    bands: int = LSH_BANDS,
) -> tuple[DataFrame, DataFrame]:
    """Signature-level core of :func:`incremental_minhash_dedup` — for
    callers that already computed the batch signatures (the streaming
    job computes them once and reuses them for the pass-through set).

    Same single-pass chain approximation as
    :func:`minhash_dedup_groups`: a batch-internal representative is
    only checked against the store DIRECTLY — if it shares a bucket
    with a batch-mate that matches history but none with history
    itself, it survives (a transitive near-dup of history may be
    admitted; the standard one-hop trade of linear LSH dedup).
    """
    internal = dedup_groups_from_signatures(
        new_sig, id_col, num_hashes, bands
    ).where(F.col("keep")).select(id_col)
    # only representatives can survive — shrink the store probe to
    # their band rows (a 10k-copy boilerplate group probes once, not
    # 10k times)
    rep_banded = _banded(
        new_sig.join(internal, on=id_col, how="left_semi"),
        id_col,
        num_hashes,
        bands,
    )
    store_buckets = (
        _banded(store_sig, id_col, num_hashes, bands)
        .select("band", "band_key")
        .distinct()
    )
    matched = (
        rep_banded.join(store_buckets, on=["band", "band_key"], how="left_semi")
        .select(id_col)
        .distinct()
    )
    survivors = internal.join(matched, on=id_col, how="left_anti")
    updated = store_sig.unionByName(
        new_sig.join(survivors, on=id_col, how="left_semi")
    )
    return survivors, updated


def repeated_ngram_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 10,
) -> DataFrame:
    """Substring-level exact-duplicate detection (the suffix-array-free
    Spark shape of Lee et al. 2022 "Deduplicating Training Data Makes
    Language Models Better", public): find every maximal span of a
    document whose k-token windows also occur elsewhere in the corpus
    (or again in the same document), and report per-document span
    statistics — the signal a pretraining pipeline uses to CUT repeated
    boilerplate out of otherwise-unique documents, which doc-level
    MinHash cannot see.

    Plan shape: positional k-token windows are hashed map-side to a
    64-bit compound key (two 32-bit hex windows of ONE md5 digest —
    this is EXACT-match semantics, so unlike the collision-tolerant
    MinHash estimates a single 32-bit key would birthday-collide and
    flag unrelated windows long before 100 TB scale); one
    groupBy finds hashes occurring >= 2 times; matched positions join
    back (co-partitioned on the hash) and collapse into maximal islands
    with a lag + running-sum window — every shuffled row is (id, pos)
    or (hash, count), never text.  Output per doc (only docs with at
    least one duplicated window): n_dup_windows, n_spans,
    covered_tokens (exact union size of the [pos, pos+k-1] intervals),
    longest_span — all ints.
    """
    from pyspark.sql import Window

    words = df.select(
        F.col(id_col), F.split(normalize_ws(text_col), " ").alias("__w")
    ).where(F.size("__w") >= k)
    # shared slice+zip_with shingler (measured ~4x faster per row than
    # the indexed-transform shape; see its docstring) — posexplode gives
    # the 1-based window position directly.
    # md5 bound in its own projection so the two hex-window slices don't
    # recompute it (CollapseProject keeps non-cheap aliases referenced
    # more than once in their own project).
    wins = (
        words.select(
            id_col,
            F.posexplode(word_shingles_from_words(F.col("__w"), k)).alias(
                "pos0", "sh"
            ),
        )
        .select(
            id_col,
            (F.col("pos0") + 1).alias("pos"),
            md5_seeded("sh", "span").alias("__d"),
        )
        .select(
            id_col,
            "pos",
            h32_window(F.col("__d"), 0).alias("h1"),
            h32_window(F.col("__d"), 1).alias("h2"),
        )
    )
    dup = (
        wins.groupBy("h1", "h2")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 2)
    )
    matched = (
        wins.join(dup.select("h1", "h2"), on=["h1", "h2"])
        .select(id_col, "pos")
        .distinct()
    )
    wp = Window.partitionBy(id_col).orderBy("pos")
    islands = (
        matched.withColumn("prev", F.lag("pos").over(wp))
        .withColumn(
            "new_island",
            F.when(
                F.col("prev").isNull() | (F.col("pos") - F.col("prev") > k), 1
            ).otherwise(0),
        )
        .withColumn(
            "island",
            F.sum("new_island").over(
                wp.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    spans = islands.groupBy(id_col, "island").agg(
        F.count(F.lit(1)).alias("n_windows"),
        (F.max("pos") + F.lit(k - 1) - F.min("pos") + F.lit(1))
        .cast("long")
        .alias("span_len"),
    )
    return spans.groupBy(id_col).agg(
        F.sum("n_windows").alias("n_dup_windows"),
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("span_len").alias("covered_tokens"),
        F.max("span_len").alias("longest_span"),
    )


def cross_corpus_lsh_contamination(
    train: DataFrame,
    test: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    num_hashes: int = NUM_MINHASH,
    bands: int = LSH_BANDS,
    spread: bool = False,
    broadcast_test: bool = True,
) -> DataFrame:
    """NEAR-duplicate decontamination between a training corpus and an
    eval/test set — the fuzzy counterpart of the exact shingle-hash
    `test_set_contamination`: an eval example that leaked into training
    with light edits (reflowed whitespace, an added sentence) shares
    most of its shingles, so its MinHash signatures still collide on
    some LSH band even though no exact n-gram window survives intact.
    The standard benchmark-decontamination gap (exact 13-gram matching
    misses paraphrased leakage; GPT-3 appendix C discusses exactly
    this, public).

    Scale shape: signatures for BOTH corpora are map-side zero-shuffle
    (`minhash_signatures`); the only shuffle is the banded equi-join of
    the two fixed-width signature tables — train never self-joins, and
    ``broadcast_test`` (default: eval benchmarks are small by
    definition) ships the banded test table to every executor so the
    100 TB train side is scanned WITHOUT a shuffle at all
    (plan-asserted).  Pass False for corpus-vs-corpus sweeps where
    both sides are large.  Output per flagged train doc:
    (id, n_test_matches, first_test_match), all ints.
    """
    sig_tr = minhash_signatures(train, text_col, id_col, k, num_hashes, spread=spread)
    sig_te = minhash_signatures(test, text_col, id_col, k, num_hashes, spread=spread)
    btr = _banded(sig_tr, id_col, num_hashes, bands)
    bte = _banded(sig_te, id_col, num_hashes, bands).withColumnRenamed(
        id_col, "__test_id"
    )
    if broadcast_test:
        bte = F.broadcast(bte)
    pairs = (
        btr.join(bte, on=["band", "band_key"])
        .select(id_col, "__test_id")
        .distinct()
    )
    return pairs.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_test_matches"),
        F.min("__test_id").alias("first_test_match"),
    )


# --- content-defined chunking (Rabin-Karp CDC) -------------------------

#: CDC parameters: 16-char rolling window, polynomial base 257 mod the
#: Mersenne prime 2^31 - 1, cut where the window hash % 64 == 0 (~64-
#: char expected chunks).  Products stay < 2^63 (cp < 2^21, h < 2^31).
CDC_WINDOW, CDC_BASE, CDC_MODULUS, CDC_DIVISOR = 16, 257, (1 << 31) - 1, 64


#: Window weights BASE^(W-1-j) mod M for the direct windowed-
#: polynomial form of the rolling hash (computed once at import).
_CDC_WEIGHTS = None


def _cdc_weights():
    global _CDC_WEIGHTS
    if _CDC_WEIGHTS is None:
        import numpy as np

        _CDC_WEIGHTS = np.array(
            [
                pow(CDC_BASE, CDC_WINDOW - 1 - j, CDC_MODULUS)
                for j in range(CDC_WINDOW)
            ],
            dtype=np.int64,
        )
    return _CDC_WEIGHTS


def _cdc_cut_points_py(text: str) -> list[int]:
    """Sequential pure-Python reference for `cdc_cut_points` — kept as
    the property-test twin pinning the exact cut semantics the numpy
    path must reproduce (and as executable documentation of the
    recurrence: h ← (h − out·B^(W−1))·B + in mod M)."""
    n = len(text)
    if n == 0:
        return []
    cuts: list[int] = []
    if n >= CDC_WINDOW:
        cps = [ord(c) for c in text]
        pw1 = pow(CDC_BASE, CDC_WINDOW - 1, CDC_MODULUS)
        h = 0
        for j in range(CDC_WINDOW):
            h = (h * CDC_BASE + cps[j]) % CDC_MODULUS
        if h % CDC_DIVISOR == 0:
            cuts.append(CDC_WINDOW)
        for i in range(CDC_WINDOW, n):
            h = ((h - cps[i - CDC_WINDOW] * pw1) * CDC_BASE + cps[i]) % CDC_MODULUS
            if h % CDC_DIVISOR == 0:
                cuts.append(i + 1)
    if not cuts or cuts[-1] != n:
        cuts.append(n)
    return cuts


def cdc_cut_points(text: str) -> list[int]:
    """1-based end positions of the content-defined chunks of ``text``
    (the final position ``len(text)`` always closes the last chunk).
    Pure Rabin-Karp CDC (Muthitacharoen et al. 2001, LBFS, public): a
    cut lands wherever the rolling hash of the trailing CDC_WINDOW
    characters is ≡ 0 mod CDC_DIVISOR — boundaries depend only on
    LOCAL content, so an insertion near the start of a document shifts
    every byte yet re-synchronizes at the next content cut and the
    remaining chunks hash identically (the property fixed-size
    chunking lacks, and what makes chunk-level dedup robust to
    prepended boilerplate).

    Vectorized (VERDICT r08 "what's wrong" #3): instead of the per-
    character sliding recurrence, every window hash is computed at
    once as the windowed polynomial dot product
    ``H_i = Σ_j cp[i−W+1+j] · B^(W−1−j) (mod M)`` — W=16 vectorized
    multiply-adds done by ONE ``np.correlate`` C pass over the code-
    point array (utf-32-le frombuffer, no per-char Python).
    Exactness: cp < 2^21 and each weight < 2^31, so one product
    < 2^52 and the 16-term sum < 2^56 — int64 never overflows and one
    final ``% M`` equals the sequential mod-at-every-step value.
    ~12× single-core over the old loop on 2 KB docs, ~30× on 16 KB
    (SCALE.md round 9); cut points byte-identical (property-tested
    against `_cdc_cut_points_py`)."""
    n = len(text)
    if n == 0:
        return []
    cuts: list[int] = []
    if n >= CDC_WINDOW:
        import numpy as np

        # dtype '<u4' pins little-endian to match the explicit -le
        # encoding (native-endian uint32 would byte-swap every code
        # point on a big-endian host)
        cps = np.frombuffer(
            text.encode("utf-32-le"), dtype="<u4"
        ).astype(np.int64)
        acc = np.correlate(cps, _cdc_weights())
        hits = np.nonzero((acc % CDC_MODULUS) % CDC_DIVISOR == 0)[0]
        cuts = (hits + CDC_WINDOW).tolist()
    if not cuts or cuts[-1] != n:
        cuts.append(n)
    return cuts


def cdc_chunks(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Content-defined chunks of every document: (id, chunk_hash,
    chunk_len) — one slim row per chunk, md5-hex chunk identity.

    Scale shape: the rolling hash, cut detection, and chunk hashing
    all run inside ONE mapInPandas pass (linear per document, Arrow
    batches) — the text never shuffles; everything downstream works on
    the fixed-width chunk-hash rows.  At 100 TB the hex identity would
    pack to 16 binary bytes; the hex string keeps the DuckDB oracle
    byte-identical here."""
    import hashlib

    import pandas as pd
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("chunk_hash", StringType()),
            StructField("chunk_len", LongType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                t = str(text)
                prev = 0
                for e in cdc_cut_points(t):
                    chunk = t[prev:e]
                    prev = e
                    rows.append(
                        {
                            id_col: doc_id,
                            "chunk_hash": hashlib.md5(
                                chunk.encode("utf-8")
                            ).hexdigest(),
                            "chunk_len": len(chunk),
                        }
                    )
            if rows:
                yield pd.DataFrame(rows)

    return df.select(id_col, text_col).mapInPandas(gen, schema)


def cdc_chunk_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Cross-document duplicate-chunk report over the CDC chunking:
    (chunk_hash, chunk_len, n_docs, n_occurrences) for every chunk
    seen more than once — the storage-dedup / fuzzy-boilerplate view
    of the corpus (shared passages surface as shared chunks even when
    the surrounding documents differ, because CDC boundaries
    re-synchronize after local edits).

    Scale shape: one map-side chunking pass (text never shuffles) then
    one groupBy on the fixed-width chunk identity with map-side
    partial aggregation; output is bounded by the DISTINCT duplicated
    chunks, not by corpus size."""
    ch = cdc_chunks(df, text_col, id_col)
    return (
        ch.groupBy("chunk_hash", "chunk_len")
        .agg(
            F.countDistinct(id_col).alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .where(F.col("n_occurrences") > 1)
    )
