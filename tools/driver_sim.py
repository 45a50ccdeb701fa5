"""Simulate the round driver's CORRECTNESS gate locally.

Runs the FIRST 50 `__spark_entry__.queries()` entries at sf0.01 against
their `oracle_sql()` through DuckDB, comparing row count, column-sorted
schema, and an order-insensitive value hash — the same three signals
the driver records.  Prints one summary line per query and exits
non-zero on any mismatch.

Usage: python tools/driver_sim.py [N] [SF_DIR] [--only name1,name2]

``--only`` restricts the run to the named queries (ignoring N) — the
fast loop while iterating on one gate.
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swisscourtrulingcorpus_spark.plans.parity import value_hash  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    args = list(sys.argv[1:])
    only: list[str] | None = None
    if "--only" in args:
        i = args.index("--only")
        if i + 1 >= len(args):
            print("usage: driver_sim.py [N] [SF_DIR] [--only name1,name2]")
            return 1
        only = args[i + 1].split(",")
        del args[i : i + 2]
    n = int(args[0]) if args else 50
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"

    import __spark_entry__ as entry
    from swisscourtrulingcorpus_spark.session import get_spark

    spark = get_spark(app_name="driver-sim")
    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = entry.queries(), entry.oracle_sql()
    if only is not None:
        unknown = [x for x in only if x not in qs]
        if unknown:
            print(f"unknown queries: {unknown}")
            return 1
        names = only
    else:
        names = list(qs)[:n]
    failures = 0
    for name in names:
        try:
            got = qs[name](spark, sf_dir).toPandas()
            if name not in oracles:
                print(f"{name}: rows-only rows={len(got)}")
                continue
            want = duck.execute(oracles[name]).fetchdf()
            rows_ok = len(got) == len(want)
            schema_ok = sorted(got.columns) == sorted(want.columns)
            hash_ok = rows_ok and schema_ok and value_hash(got) == value_hash(want)
            status = "OK" if (rows_ok and schema_ok and hash_ok) else "FAIL"
            if status == "FAIL":
                failures += 1
            print(
                f"{name}: {status} rows={len(got)}/{len(want)} "
                f"schema={schema_ok} hash={hash_ok}"
            )
        except Exception as e:  # driver records err rows the same way
            failures += 1
            print(f"{name}: ERROR {type(e).__name__}: {e}")
    print(f"\n{len(names) - failures}/{len(names)} pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
