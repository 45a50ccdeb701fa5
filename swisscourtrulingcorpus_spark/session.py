"""SparkSession factory tuned for the engine.

The reference hand-manages memory and parallelism (chunked cursors,
Pool(16)/ThreadPool(4), dask — SURVEY.md §4); under Spark all of that is
the scheduler's job.  What we DO own is configuration: AQE for runtime
re-planning and skew joins (the corpus is skewed: one court dominates),
Arrow for the pandas_udf extraction layer, and shuffle sizing.

At 100 TB these settings are cluster-level; the helpers here only make
local runs representative (AQE coalescing keeps small-SF plans from
drowning in empty partitions while the static ``shuffle.partitions``
stays high enough to exercise real exchanges).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for the driver's local[32] / 128 GiB box; on a real
# cluster these come from spark-submit conf, not code.
_DEFAULT_CONFS = {
    # local[32] runs driver+executors in ONE JVM: the default 1g heap
    # leaves ~32 MB per concurrent task and OOM'd a 500k x 64-double
    # map-only job.  24g on the 128 GiB box ≈ 750 MB/task — in line
    # with a real cluster's per-core allotment.  (Only effective at
    # JVM launch; ignored when attaching to a live session.)
    "spark.driver.memory": "24g",
    # Runtime re-planning: coalesce post-shuffle partitions, split skewed
    # ones (the CH_BGer-style skew in SURVEY.md §4), re-plan joins.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Static shuffle width; AQE coalesces below this at small SF.  Env
    # override (r11 optimization round): a cluster run sizes this to
    # cores×(2-4) / target 100-1000 MB per post-shuffle partition
    # (guide §2.2) via SPARK_GRAFT_SHUFFLE_PARTITIONS without a code
    # change; the local default stays 32 so driver benches at any core
    # count keep comparing the same plans.
    "spark.sql.shuffle.partitions": os.environ.get(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"
    ),
    # InferFiltersFromGenerate is a pessimization for every explode in
    # this engine: the generators explode COMPUTED arrays (shingle
    # sets, band keys, token arrays), so the inferred
    # ``size(arr)>0 AND isnotnull(arr)`` filter is pushed below the
    # projection that defines the array and re-evaluates the whole
    # construction expression twice more per row (measured on
    # ngram_jaccard_pairs: the tokenize→shingle chain ran 3× per row
    # per scan; plan evidence in plans/r11/).  explode() already skips
    # null/empty arrays, so excluding the rule cannot change results —
    # it only stops the optimizer from duplicating expensive
    # expressions into scan-level filters.  Scale-independent: at
    # 100 TB the duplicated work grows with the corpus.
    "spark.sql.optimizer.excludedRules": (
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
    ),
    # PySpark's DataFrame-debugging layer wraps EVERY DataFrame/Column
    # API call to capture the Python call site for error messages:
    # per call it walks the Python stack AND makes ~4 extra py4j round
    # trips (getActiveSession + PySparkCurrentOrigin.set/conf-read/
    # clear).  Driver-side plan construction is inside the bench's
    # timed region (guide §1), and the r12 census measured 7652 round
    # trips per headline pass dropping to 3262 with this off —
    # interleaved A/B: 1650-1985 ms -> 1005-1103 ms of construction
    # per pass, every query improved (OPTIMIZATION_r12.md).  Purely a
    # diagnostics feature: error messages lose the enriched call-site
    # line, execution plans and results are bit-identical.
    "spark.python.sql.dataFrameDebugging.enabled": "false",
    # Arrow transfer for the pandas_udf extraction layer; bounded batches
    # keep per-batch memory flat regardless of document size.  4096 is
    # the measured sweet spot for the extraction pipeline (fewer
    # Python/Arrow round trips: 1408→1605 docs/s vs 2048; 8192 adds
    # another ~10% but at the reference's 100 KB-doc upper bound that
    # is ~800 MB per in-flight batch — too fat for small executors).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "4096",
    # Deterministic wall-clock-independent semantics for oracle parity.
    "spark.sql.session.timeZone": "UTC",
    # Dims (language/canton/court/chamber analogues: region/nation/...)
    # are tiny — let autoBroadcast catch them; AQE converts the rest.
    "spark.sql.autoBroadcastJoinThreshold": "64MB",
    # Big text columns (html_raw/pdf_raw analogues): cap scan partition
    # size so a partition of fat rows still fits in executor memory.
    "spark.sql.files.maxPartitionBytes": "128MB",
    "spark.sql.parquet.compression.codec": "zstd",
    # Some sources write TIMESTAMP(NANOS) parquet (the events fixture);
    # Spark has no nanos timestamp — read as long, converted to micros
    # in sources.catalog (integer DIV, matching DuckDB's truncation).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def get_spark(
    app_name: str = "swisscourtrulingcorpus_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default *)
    so tests, bench.py and the driver share one code path.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    for k, v in _DEFAULT_CONFS.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
