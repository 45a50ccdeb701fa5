"""Two-SF empirical scale measurement (VERDICT r04 item 1/#3).

SCALE.md argues the dedup/ANN/packing family is ~linear by
construction; this tool MEASURES it.  It synthesizes a 10× corpus
(each replica of the sf0.1 documents/embeddings tables perturbed with
a replica-unique token / offset, so the per-replica duplicate
structure is identical and the TRUE scaling of every linear claim is
exactly 10×), runs the representative registry queries at both scales
in one Spark app with the public event log enabled, and reports per
query: wall seconds, output rows, and shuffle read/write bytes (the
deltas of the event-log task metrics between queries — public
`spark.eventLog.*` config, no JVM internals).

    python tools/scale_measure.py [OUT_JSON]

Scaling exponents: alpha = log10(metric_10x / metric_1x); ~1.0 is
linear, ~2.0 quadratic.  Results are committed into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = 10
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

QUERIES = [
    # (name, what the linear claim is)
    ("cusum_drift_events", "CUSUM in window closed form: (type, day) partial agg then two fused windows over calendar-bounded rows"),
    ("chi2_weekday_events", "contingency cells bounded by |types|x7; one partial-agg groupBy + broadcast totals"),
    ("audience_overlap_event_types", "pairs bounded by |types|^2 per user; distinct (user,type) is the only row-sized shuffle"),
    ("nb_classifier_auc", "distinct-margin window only; (score) groupBy with map-side combine"),
    ("nb_calibration_deciles", "selection rounds over cached slim (score,label); bucket groupBy bounded by 10"),
    ("leadlag_xcorr_event_types", "daily partial agg first; lag grid explodes only the slim series table"),
    ("exact_dedup_documents", "hash groupBy, text never shuffles"),
    ("minhash_signatures_documents", "zero-shuffle map-side signatures"),
    ("minhash_lsh_pairs", "band-bucket equi-join, no all-pairs"),
    ("minhash_dedup_groups", "linear representative form"),
    ("simhash_documents", "map-side fingerprints"),
    ("ngram_jaccard_pairs", "inverted index + stop-shingle guard (the guarded quadratic)"),
    ("incremental_minhash_dedup", "store probe over signatures only"),
    ("sequence_packing_documents", "two-phase parallel prefix sum"),
    ("test_set_contamination", "distinct-hash join per corpus"),
    ("ivf_assignment", "broadcast-centroid argmin"),
    ("semantic_dedup_groups", "within-IVF-bucket cosine"),
    # round-5 extension: quality/tokenize/sample/ANN families
    ("gopher_quality_filter", "pure JVM column math, zero shuffles"),
    ("repetition_filter_documents", "per-doc n-gram counts, one shuffle of (doc, gram)"),
    ("tfidf_top_terms", "explode + two aggs, vocab-sized DF table"),
    ("token_ids_documents", "posexplode + broadcast vocab join"),
    ("pii_redaction_documents", "chained codegen regexp, map-side"),
    ("chunked_documents", "fixed fan-out explode"),
    ("training_shuffle_rank", "two-phase parallel prefix sum"),
    ("stratified_sample_documents", "slim (id, stratum) shuffle + semi-join back"),
    ("length_grouped_shards", "range partition + local rank"),
    ("cosine_topk_bruteforce", "broadcast query side, O(n·q) scan"),
    ("ivf_topk_bucketed", "bucket equi-join candidates only"),
    # round-5b extension: streaming/window family (10x events corpus =
    # 10 replicas with shifted user/event ids, per-replica session
    # structure identical to the source)
    ("tumbling_hourly_events", "partial agg: map-side combine, window-key shuffle only"),
    ("session_windows_events", "per-user sessionization, (user) key shuffle"),
    ("first_event_per_user", "top-1 per key via min-struct partial agg"),
    ("event_gap_stats", "per-user lag window over slim columns"),
    # round-6 extension: retrieval + curation family
    ("bm25_query_topk", "index build linear in tokens; probe touches queried-term postings only"),
    ("dsir_importance_weights", "map-side hashed features; B-row broadcast bucket models"),
    ("postings_incremental_merge", "index-sized union + vocab-sized df merge"),
    ("int8_dot_topk_embeddings", "broadcast quantized queries, single corpus scan"),
    # round-6b extension: curation/graph family
    ("char_entropy_documents", "explode + two slim groupBys, text read once"),
    ("blocklist_filter_documents", "pure JVM word membership, zero shuffles"),
    ("temperature_sample_languages", "slim (id, lang) phases + broadcast semi-join back"),
    ("cc_bigstar_long_chains", "O(log) star phases, (bigint, bigint) shuffles only"),
    ("repeated_ngram_spans_documents", "windowed shingle hash index, (id, pos) shuffles"),
    ("curation_funnel_documents", "stage-chained scan predicates; counts are 1-row aggs"),
    ("near_contamination_check", "map-side signatures both sides, broadcast banded eval join"),
    ("script_mix_documents", "map-side codepoint classes, zero shuffles"),
    # round-6c extension: LSH verification stage + trained classifier
    ("lsh_verified_pairs", "Levenshtein bounded by candidate count x char cap, never all-pairs"),
    ("verified_dedup_clusters", "star CC over verified pairs only; (bigint, bigint) shuffles"),
    ("nb_quality_classifier", "train = one slim groupBy; fixed 2x4096 broadcast model"),
    ("ivf_mutual_nn_bitext", "cell-product candidates, never |A|x|B|; symmetric 3-probe"),
    ("bm25_hard_negatives", "postings equi-join only; negatives re-rank over <= k rows/query"),
    ("unigram_token_counts", "DP over the DISTINCT-WORD table; corpus joins broadcast seg table"),
    # round-6f extension: portable-sketch family (events corpus: user
    # ids shift per replica, so distinct users scale exactly 10x)
    ("hll_register_table_users", "fixed 64-register state: shuffle bytes FLAT while input grows"),
    ("kmv_sketch_users", "bottom-k TakeOrdered over a slim 8-byte distinct-hash shuffle"),
    ("kmv_jaccard_event_types", "per-type bottom-k windows over slim (type, hash) rows"),
    # round-6f extension 2: citation-graph + keyword extraction
    ("cocitation_pairs", "3 targets/doc -> 3 pairs/doc, linear; count shuffle on pair key"),
    ("bibliographic_coupling_hist", "hub-capped target self-join, pairs linear under the cap"),
    ("rake_keywords_documents", "map-side phrase split; vocab-sized word stats; TakeOrdered 20"),
    # round-6f extension 3: association mining + behavioral windows
    ("cooccurrence_lift_documents", "map-side zip_with pairs (no self-join); pair-count shuffle"),
    ("sliding_topk_event_types", "(window, type) partial agg; rank input bounded by type domain"),
    ("event_transition_counts", "per-user lead window over slim columns; 25-cell matrix out"),
    ("hll_distinct_per_hour", "per-window register exchange capped at 64 rows/window"),
    # round-6g extension: media decode family (pure map-side codecs —
    # zero shuffle by construction, wall linear in payload bytes)
    ("image_resize_stats", "decode -> box filter -> re-encode, all inside mapInPandas"),
    ("gif_frame_sample_stats", "LZW decode + frame fan-out, map-side"),
    ("media_router_stats", "per-row sniff dispatch to 4 codecs, map-side"),
    ("g711_decode_stats", "table-free formula expansion per byte, map-side"),
    # round-7 additions
    ("adpcm_decode_stats", "stateful block recurrence, still pure map-side"),
    ("phrase_search_documents", "broadcast term join + anchor agg; only phrase-term postings move"),
    ("interval_overlap_events", "bucket-exploded equi-join, <= 2 buckets/interval"),
    ("image_dhash_neardup_pairs", "map-side decode+hash; banded hamming join over slim fingerprints"),
    ("wordpiece_segmentation", "greedy rounds over the DISTINCT-WORD table, broadcast vocab"),
    ("preference_pairs_documents", "broadcast-model scoring + per-lang slim rank/self-join"),
    ("kcore_citation_clusters", "bounded-round peel, (bigint,bigint) shuffles only"),
    ("wordpiece_token_counts", "apply-tokenizer: broadcast segmentation join, corpus one explode"),
    ("multitouch_attribution_events", "user-key equi-join + per-(user,purchase) windows, 8-cell report"),
    ("audio_fingerprint_neardup_pairs", "map-side decode+energy hash; shared banded hamming join"),
    ("video_fingerprint_neardup_pairs", "map-side AVI decode+temporal hash; shared banded hamming join"),
    # round-8 additions
    ("quality_quota_sample", "NB scoring map-side; per-bucket quota rank over slim (id, score) rows"),
    ("media_neardup_pairs", "one sniff+fingerprint pass, payloads never shuffle; grouped banded join"),
    ("incremental_media_neardup", "asymmetric registry probe; candidates bounded by shared bands"),
    ("coreness_citation_nodes", "h-index rounds: slim (bigint,bigint) shuffles, depth-bounded"),
    ("cdc_chunk_dedup", "map-side rolling-hash chunking; one groupBy on fixed-width chunk keys"),
    ("windowed_funnel_events", "filtered min-agg chain; slim (user, us) joins, 3-cell report"),
    # round-10 (VERDICT r09 item 5): the TPC-H facts are now genuinely
    # replicated (per-replica key shifts, FK-consistent), so the
    # relational-only gates get REAL two-SF rows instead of prose
    ("fd_check_lineitem", "one distinct-pair groupBy per FD candidate; rows shuffle as distinct (lhs, rhs) combos"),
    ("exact_median_order_value", "<= 3 rounds of binning aggregates; driver sees <= bins rows/round"),
    ("weighted_median_line_price", "the selection shape with cumulative-weight ranks"),
    ("gini_customer_spend", "per-customer groupBy + ONE window over the distinct-value table"),
    ("join_size_estimate_nations", "two map-side fixed-size sketches; nothing row-sized shuffles"),
    ("key_skew_orders", "key-count groupBy + TakeOrdered 10, never a global sort"),
    ("fk_integrity_tpch", "six left-anti orphan probes over distinct child keys"),
    # round-10 drift family + the streaming-CUSUM replay gate
    ("ks_drift_order_priority", "distinct-value groupBy + two-phase prefix sum; no single-task window"),
    ("psi_doclen_snapshots", "one (bin, side) groupBy; <= 41 bins whatever the corpus size"),
    ("js_token_drift_snapshots", "token explode -> vocab-sized groupBy; totals broadcast as one row"),
    ("incremental_cusum_drift", "one shuffle on event_type into the replayed stateful fold; per-key linear"),
    ("cumulative_users_by_day", "slim (user,date) min-agg; window bounded by the date domain"),
    ("ewma_gap_events", "sequential per-user fold over slim (user, us) rows, one state int/key"),
    ("event_path_mining", "two lead windows, bounded |types|^3 key domain, TakeOrdered top-k"),
    ("nearest_click_to_purchase", "tolerance-banded equi-join + min-struct, no window over pairs"),
    # round-10b: model-guided curation diagnostics + survival
    ("label_noise_confident_joint", "NB scoring shuffles + one slim (label, margin) groupBy; joint is 6 cells"),
    ("uncertainty_margin_sample", "TakeOrderedAndProject over per-doc margins; no global sort"),
    ("nb_loo_self_influence", "ONE featurization, two corpus exchanges; model/count tables broadcast"),
    ("kaplan_meier_customer_churn", "per-customer min/max agg; risk table bounded by distinct durations"),
    # round-11: grouped drift, doc-level mislabel, k-class joint,
    # streaming PSI register
    ("ks_drift_by_region", "ONE prefix-sum pass for all slices (per-slice diffs sum to zero); slice totals broadcast, zero driver collects"),
    ("mislabel_candidates_docs", "NB scoring shuffles + map-side filter over the checkpointed slim projection"),
    ("label_noise_joint_language", "LID model broadcast; margins from one doc-partitioned window; k-row threshold collect"),
    ("incremental_psi_drift", "one snapshot-key shuffle into the replayed register fold; state bin-bounded"),
    ("psi_doclen_by_lang", "one (slice, bin) groupBy; slice-sized totals broadcast back, zero driver collects"),
    ("mislabel_candidates_language", "LID chain + margin checkpoint; candidates filter map-side over it"),
    ("cvm_drift_order_priority", "KS's distinct-value prefix pass + one decimal square-sum aggregate"),
    ("js_token_drift_by_lang", "one (slice, token) groupBy; slice totals broadcast; vocab-bounded emission"),
    ("logrank_churn_by_segment", "distinct-duration table; both at-risk countdowns in ONE prefix pass"),
    ("ks_drift_fdr_by_nation", "per-slice KS prefix pass; BH windows run over the 25-row report only"),
]


def synth_10x(spark, src: str, dst: str) -> None:
    """10 replicas; texts get a replica token appended (replica dup
    structure == source's, no cross-replica near-dups), embeddings a
    tiny deterministic per-replica offset.  Other tables symlink."""
    from pyspark.sql import functions as F

    replicated = (
        "documents", "embeddings", "events",
        # round-10: TPC-H facts replicate with per-replica key shifts
        "orders", "lineitem", "customer", "supplier",
    )
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        link = os.path.join(dst, f"{t}.parquet")
        if os.path.islink(link) and t in replicated:
            os.unlink(link)  # stale symlink from an earlier-round run
        if t in replicated or os.path.exists(link):
            continue
        os.symlink(os.path.join(src, f"{t}.parquet"), link)

    # TPC-H facts: shift the REPLICATED tables' keys per replica so
    # every FK that points at a replicated parent shifts consistently
    # (lineitem.l_orderkey -> orders, l_suppkey -> supplier,
    # orders.o_custkey -> customer) while FKs into SYMLINKED dims
    # (l_partkey -> part, *_nationkey -> nation) stay unshifted — the
    # 10x corpus passes the same fk_integrity audit with zero orphans
    # and every per-replica group/FD/skew structure is identical to
    # the source.  Values (prices, quantities, dates) are untouched:
    # medians/Gini stay at the source value while the input is 10x.
    def _maxkey(table: str, col: str) -> int:
        return (
            spark.read.parquet(os.path.join(src, f"{table}.parquet"))
            .agg(F.max(col))
            .collect()[0][0]
            + 1
        )

    rel_shifts = {
        "orders": {"o_orderkey": ("orders", "o_orderkey"),
                   "o_custkey": ("customer", "c_custkey")},
        "lineitem": {"l_orderkey": ("orders", "o_orderkey"),
                     "l_suppkey": ("supplier", "s_suppkey")},
        "customer": {"c_custkey": ("customer", "c_custkey")},
        "supplier": {"s_suppkey": ("supplier", "s_suppkey")},
    }
    if not all(
        os.path.exists(os.path.join(dst, f"{t}.parquet")) for t in rel_shifts
    ):
        bases = {
            (pt, pc): _maxkey(pt, pc)
            for shifts in rel_shifts.values()
            for pt, pc in shifts.values()
        }
        reps_r = spark.range(REPLICAS).withColumnRenamed("id", "rep")
        for t, shifts in rel_shifts.items():
            out_path = os.path.join(dst, f"{t}.parquet")
            if os.path.exists(out_path):
                continue
            tdf = spark.read.parquet(os.path.join(src, f"{t}.parquet"))
            big_t = tdf.crossJoin(reps_r)
            for col, parent in shifts.items():
                dtype = dict(tdf.dtypes)[col]
                big_t = big_t.withColumn(
                    col,
                    (F.col(col) + F.col("rep") * bases[parent]).cast(dtype),
                )
            big_t.drop("rep").repartition(32).write.mode("overwrite").parquet(
                out_path
            )

    # events: shift user/event ids per replica, keep timestamps — the
    # per-replica window/session structure is IDENTICAL to the source,
    # so per-user outputs scale exactly 10x and window-keyed aggs see
    # 10x input over the same window keys.  load_table converts the
    # source's TIMESTAMP(NANOS) to real timestamps; the rewritten
    # table carries plain TIMESTAMP and loads through the same path.
    from swisscourtrulingcorpus_spark.sources.catalog import load_table

    if not os.path.exists(os.path.join(dst, "events.parquet")):
        ev = load_table(spark, src, "events")
        nu = ev.agg(F.max("user_id")).collect()[0][0] + 1
        nev = ev.agg(F.max("event_id")).collect()[0][0] + 1
        reps0 = spark.range(REPLICAS).withColumnRenamed("id", "rep")
        (
            ev.crossJoin(reps0)
            .withColumn("user_id", F.col("user_id") + F.col("rep") * nu)
            .withColumn("event_id", F.col("event_id") + F.col("rep") * nev)
            .drop("rep")
            .repartition(32)
            .write.mode("overwrite")
            .parquet(os.path.join(dst, "events.parquet"))
        )

    if os.path.exists(os.path.join(dst, "documents.parquet")):
        return  # pre-r05b corpus already synthesized (idempotent rerun)
    docs = spark.read.parquet(os.path.join(src, "documents.parquet"))
    n = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    reps = spark.range(REPLICAS).withColumnRenamed("id", "rep")
    # Replica transform must be a BIJECTION on texts (within-replica
    # dup/near-dup structure identical to the source) with ZERO
    # cross-replica shingle overlap (no cross-replica near-dups) —
    # suffix every word with the replica id.  A weak perturbation
    # (one appended token) leaves cross-replica Jaccard ≈ 1 and the
    # corpus stops being linear-structured.
    big = (
        docs.crossJoin(reps)
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * n)
        .withColumn(
            "text",
            F.when(
                (F.col("text").isNotNull()) & (F.col("rep") > 0),
                F.regexp_replace(
                    F.col("text"),
                    F.lit(r"(\S+)"),
                    F.concat(F.lit("$1x"), F.col("rep").cast("string")),
                ),
            ).otherwise(F.col("text")),
        )
        .drop("rep")
    )
    big.repartition(32).write.mode("overwrite").parquet(
        os.path.join(dst, "documents.parquet")
    )

    emb = spark.read.parquet(os.path.join(src, "embeddings.parquet"))
    ne = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    # decorrelate replicas HARD (cosine(v, v') far from 1): elementwise
    # offsets of ~2x the mean |component|, varying with (rep, i)
    scale = (
        emb.select(
            F.avg(
                F.aggregate(
                    F.transform("embedding", lambda v: F.abs(v)),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
                / F.size("embedding")
            )
        ).collect()[0][0]
        or 1.0
    )
    bige = (
        emb.crossJoin(reps)
        .withColumn("vec_id", F.col("vec_id") + F.col("rep") * ne)
        .withColumn(
            "embedding",
            F.transform(
                "embedding",
                lambda v, i: F.when(F.col("rep") == 0, v).otherwise(
                    v
                    + (
                        ((F.col("rep") * 31 + i) % 7 - 3).cast("double")
                        * F.lit(2.0 * scale)
                    ).cast(
                        "float"
                    )
                ),
            ),
        )
        .drop("rep")
    )
    bige.repartition(32).write.mode("overwrite").parquet(
        os.path.join(dst, "embeddings.parquet")
    )


def _shuffle_totals(event_dir: str, app_id: str) -> tuple[int, int]:
    """(read_bytes, write_bytes) summed over all TaskEnd events so far.
    Handles both the flat single-file layout and the rolling v2
    directory layout (compression is disabled in the session conf so
    the JSON is directly readable)."""
    paths: list[str] = []
    for cand in os.listdir(event_dir):
        if app_id not in cand:
            continue
        full = os.path.join(event_dir, cand)
        if os.path.isdir(full):
            paths += [
                os.path.join(full, f)
                for f in sorted(os.listdir(full))
                if f.startswith("events")
            ]
        else:
            paths.append(full)
    read = write = 0
    for path in paths:
        with open(path) as fh:
            _tally(fh, totals := [0, 0])
            read += totals[0]
            write += totals[1]
    return read, write


def _tally(fh, totals: list[int]) -> None:
    for line in fh:
            if '"SparkListenerTaskEnd"' not in line:
                continue
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue  # partially-flushed tail line
            tm = ev.get("Task Metrics") or {}
            srm = tm.get("Shuffle Read Metrics") or {}
            swm = tm.get("Shuffle Write Metrics") or {}
            totals[0] += (srm.get("Remote Bytes Read") or 0) + (
                srm.get("Local Bytes Read") or 0
            )
            totals[1] += swm.get("Shuffle Bytes Written") or 0


# --- streaming state-scale measurement (VERDICT r05 item 8) -----------
#
# The batch section measures shuffle bytes; the streaming analog of
# "does this scale" is STATE-STORE growth under watermark: session
# windows hold one row per open (user, session), the stream-stream
# interval join buffers both sides until watermark + join-window pass.
# Measured from StreamingQueryProgress.stateOperators (public API) at
# both SFs, over multi-batch AvailableNow runs so watermark eviction
# actually executes between micro-batches.

STREAM_QUERIES = [
    (
        "stream_session_windows",
        "state rows == open (user, session) pairs; closed sessions evicted at watermark",
    ),
    (
        "stream_tumbling_counts",
        "state rows == open window keys (time-bounded, independent of input size)",
    ),
    (
        "stream_interval_join",
        "buffered rows bounded by watermark + 30-min join window on both sides",
    ),
    # round-9 (VERDICT r08 item 4): the applyInPandasWithState custom
    # stateful operators — state must grow with |keys|, never |events|
    (
        "stream_user_profile_state",
        "custom stateful op: state == ONE (n_events, total, last_ts) tuple per user — bytes/key flat, rows track |users| not |events|",
    ),
    (
        "stream_ewma_gap_state",
        "custom stateful op: state == ONE (last_us, n, s) integer triple per user — bytes/key flat, rows track |users| not |events|",
    ),
    # round-10: the streaming CUSUM twin (value-gated this round via
    # the batch replay) — state must track |event types|, not |events|
    (
        "stream_cusum_drift_state",
        "custom stateful op: state == ONE (cur_day, counters) tuple per event_type — rows flat at |types| whatever the stream length",
    ),
    # round-11: the streaming PSI count register (value-gated via the
    # batch replay) — state is one bin-bounded count table per key
    (
        "stream_psi_register_state",
        "custom stateful op: state == ONE csv-packed (bins, cnts) register per snapshot key — rows flat at |keys|, bytes bounded by |keys|x|bins|, whatever the stream length",
    ),
]

#: queries whose sink must run in update mode (applyInPandasWithState
#: emits per-key updates, not appendable finalized rows)
_UPDATE_MODE = {
    "stream_user_profile_state",
    "stream_ewma_gap_state",
    "stream_cusum_drift_state",
    "stream_psi_register_state",
}


def measure_streaming(spark, sf_label: str, sf_dir: str, results: dict, names=None) -> None:
    import tempfile
    import time as _t

    from swisscourtrulingcorpus_spark.streaming.jobs import (
        purchase_attribution_stream,
        session_counts_stream,
        tumbling_counts_stream,
    )

    from swisscourtrulingcorpus_spark.streaming.jobs import read_events_stream
    from swisscourtrulingcorpus_spark.streaming.stateful import (
        cusum_drift_stream,
        cusum_history_refs,
        ewma_gap_stream,
        user_profile_stream,
    )

    def _cusum_stream(s):
        # history-derived constants from the batch table at this SF —
        # the ONE shared definition (streaming/stateful.py); computed
        # lazily so a `names` filter that excludes the CUSUM stream
        # never pays the two aggregation jobs
        from swisscourtrulingcorpus_spark.sources.catalog import load_table

        refs, hs = cusum_history_refs(load_table(spark, sf_dir, "events"))
        return cusum_drift_stream(s, refs, hs)

    def _psi_stream(s):
        # snapshot key = event_type, bins = hour-of-day (24-bounded);
        # the baseline bin list is the full hour domain
        from pyspark.sql import functions as F

        from swisscourtrulingcorpus_spark.streaming.stateful import (
            psi_register_stream,
        )

        binned = s.select(
            F.col("event_type").alias("snapshot"),
            F.hour("ts").cast("long").alias("bin"),
        )
        return psi_register_stream(binned, list(range(24)))

    makers = {
        "stream_psi_register_state": _psi_stream,
        "stream_cusum_drift_state": _cusum_stream,
        "stream_session_windows": session_counts_stream,
        "stream_tumbling_counts": tumbling_counts_stream,
        "stream_interval_join": purchase_attribution_stream,
        "stream_user_profile_state": user_profile_stream,
        "stream_ewma_gap_state": ewma_gap_stream,
    }
    claims = dict(STREAM_QUERIES)
    # the 10x events table is written as a 32-part directory, the 1x
    # fixture is one file; cap files/trigger so both run >= 1 batch and
    # the 10x run sees ~8 watermark advances
    for name, maker in makers.items():
        if names is not None and name not in names:
            continue
        stream = read_events_stream(spark, sf_dir, max_files=4)
        out = maker(stream)
        ckpt = tempfile.mkdtemp(prefix=f"ckpt_sm_{name}_{sf_label}_")
        t0 = _t.time()
        q = (
            out.writeStream.format("noop")
            .outputMode("update" if name in _UPDATE_MODE else "append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = _t.time() - t0
        progresses = q.recentProgress
        state_rows_max = 0
        state_mb_max = 0.0
        input_rows = 0
        batches = 0
        for p in progresses:
            if isinstance(p, str):
                p = json.loads(p)
            batches += 1
            input_rows += int(p.get("numInputRows") or 0)
            ops = p.get("stateOperators") or []
            rows = sum(int(op.get("numRowsTotal") or 0) for op in ops)
            mem = sum(int(op.get("memoryUsedBytes") or 0) for op in ops)
            state_rows_max = max(state_rows_max, rows)
            state_mb_max = max(state_mb_max, mem / 1e6)
        rec = results.setdefault(name, {"claim": claims[name]})
        rec[sf_label] = {
            "wall_s": round(wall, 2),
            "rows": input_rows,
            "batches": batches,
            "state_rows_max": state_rows_max,
            "state_mb_max": round(state_mb_max, 2),
            # generic alpha pass reads shuffle_write_mb; state bytes
            # are the streaming analog of bytes moved
            "shuffle_write_mb": round(state_mb_max, 2),
        }
        print(
            f"{sf_label:>3} {name:32s} {wall:7.2f}s in={input_rows:>9} "
            f"batches={batches} stateRows={state_rows_max:>8} "
            f"stateMB={state_mb_max:8.2f}",
            flush=True,
        )


def main() -> None:
    args = list(sys.argv[1:])
    only: set[str] | None = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        del args[i : i + 2]
    out_json = args[0] if args else "SCALE_MEASURE.json"
    event_dir = "/tmp/scale_eventlog"
    os.makedirs(event_dir, exist_ok=True)

    from pyspark.sql import SparkSession

    from swisscourtrulingcorpus_spark.plans import registry

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("scale-measure")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", f"file://{event_dir}")
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
    )
    app_id = spark.sparkContext.applicationId

    big_dir = "/tmp/scale_sf1"
    print("synthesizing 10x corpus (idempotent per table) ...", flush=True)
    synth_10x(spark, SF_DIR, big_dir)

    qs = registry.queries()
    results: dict[str, dict] = {}
    if only is not None and os.path.exists(out_json):
        # --only: measure a subset, merge over the existing file
        with open(out_json) as fh:
            results = json.load(fh)
    if only is not None:
        unknown = only - {n for n, _ in QUERIES} - {n for n, _ in STREAM_QUERIES}
        if unknown:
            # fail fast — a typo must not silently rewrite the JSON
            # with zero new measurements (r05 review)
            raise SystemExit(
                f"--only names not in QUERIES/STREAM_QUERIES: {sorted(unknown)}"
            )
    todo = [(n, c) for n, c in QUERIES if only is None or n in only]
    stream_todo = [n for n, _ in STREAM_QUERIES if only is None or n in only]
    # warm the JVM/codegen once so the first measured query isn't
    # billed for startup
    qs["exact_dedup_documents"](spark, SF_DIR).count()
    for sf_label, sf_dir in (("1x", SF_DIR), ("10x", big_dir)):
        for name, claim in todo:
            # warm run first (codegen compile for this plan), then the
            # measured run with shuffle-byte deltas around it.
            # Execution is a NOOP WRITE, not .count(): count() lets
            # Catalyst prune aggregate functions (group keys survive
            # but computed columns don't), and a one-row ungrouped
            # aggregate — or a union of them, like fd_check_lineitem —
            # prunes to NOTHING (measured: 64 shuffle records instead
            # of 21M).  The noop sink consumes every column, so the
            # measured run executes the full plan.  rows is taken from
            # a separate count() — it's the OUTPUT row count metric,
            # unaffected by how the measured run executes.
            def _exec():
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()

            _exec()
            spark.sparkContext.setJobGroup(name, f"{name}@{sf_label}")
            time.sleep(1.0)  # settle async event-log flush
            r0, w0 = _shuffle_totals(event_dir, app_id)
            t0 = time.time()
            _exec()
            wall = time.time() - t0
            time.sleep(1.0)
            r1, w1 = _shuffle_totals(event_dir, app_id)
            # AFTER the delta read, so its shuffles don't pollute it
            rows = qs[name](spark, sf_dir).count()
            rec = results.setdefault(name, {"claim": claim})
            rec[sf_label] = {
                "wall_s": round(wall, 2),
                "rows": rows,
                "shuffle_read_mb": round((r1 - r0) / 1e6, 2),
                "shuffle_write_mb": round((w1 - w0) / 1e6, 2),
            }
            print(
                f"{sf_label:>3} {name:32s} {wall:7.2f}s rows={rows:>9} "
                f"shW={(w1 - w0) / 1e6:8.2f}MB",
                flush=True,
            )
        if stream_todo:
            measure_streaming(spark, sf_label, sf_dir, results, stream_todo)

    import math

    for name, rec in results.items():
        # a partial run (crash between SF loops, or an --only merge
        # over a half-measured file) leaves one SF missing; skip the
        # entry instead of KeyError-ing away every fresh measurement
        if "1x" not in rec or "10x" not in rec:
            continue
        a, b = rec["1x"], rec["10x"]
        rec["alpha_wall"] = round(math.log10(max(b["wall_s"], 0.01) / max(a["wall_s"], 0.01)), 2)
        rec["alpha_rows"] = round(
            math.log10(max(b["rows"], 1) / max(a["rows"], 1)), 2
        )
        if "state_rows_max" in a and "state_rows_max" in b:
            rec["alpha_state_rows"] = round(
                math.log10(max(b["state_rows_max"], 1) / max(a["state_rows_max"], 1)), 2
            )
        sw_a, sw_b = a["shuffle_write_mb"], b["shuffle_write_mb"]
        rec["alpha_shuffle"] = (
            round(math.log10(max(sw_b, 0.01) / max(sw_a, 0.01)), 2)
            if sw_a > 0.05
            else None
        )
    with open(out_json, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"\nwrote {out_json}")
    spark.stop()


if __name__ == "__main__":
    main()
