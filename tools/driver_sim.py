"""Simulate the round driver's CORRECTNESS gate locally.

Runs the FIRST 50 `__spark_entry__.queries()` entries at sf0.01 against
their `oracle_sql()` through DuckDB, comparing row count, column-sorted
schema, and an order-insensitive value hash — the same three signals
the driver records.  Prints one summary line per query and exits
non-zero on any mismatch.

Usage: python tools/driver_sim.py [N] [SF_DIR] [--only name1,name2]
                                  [--sweep [OUT.json]]

``--only`` restricts the run to the named queries (ignoring N) — the
fast loop while iterating on one gate.

``--sweep`` runs ALL registry entries (not just the 50-entry driver
window) and writes a CORRECTNESS-shaped JSON artifact — by default
``SWEEP_r{N}.json`` in the repo root with N = (max committed
CORRECTNESS round) + 1, i.e. the round currently being built.  The
committed sweep is the driver-facing evidence for gates the rotating
window hasn't reached yet (VERDICT r06 "what's wrong" #3);
tests/test_registry_window.py asserts it exists, covers every
registered gate, and is all-green.
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


def current_round(repo_root: str) -> int:
    """The round being built: one past the newest committed driver
    CORRECTNESS file (the driver writes CORRECTNESS_r{N}.json at the
    END of round N, so while round N is in progress the newest file is
    r{N-1})."""
    import glob
    import re

    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    return (max(rounds) if rounds else 0) + 1


def main() -> int:
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    args = list(sys.argv[1:])
    only: list[str] | None = None
    sweep_out: str | None = None
    if "--sweep" in args:
        i = args.index("--sweep")
        if i + 1 < len(args) and args[i + 1].endswith(".json"):
            sweep_out = args[i + 1]
            del args[i : i + 2]
        else:
            sweep_out = os.path.join(
                repo_root, f"SWEEP_r{current_round(repo_root):02d}.json"
            )
            del args[i]
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
    elif sweep_out is not None:
        names = list(qs)
    else:
        names = list(qs)[:n]
    failures = 0
    records: dict[str, dict] = {}
    for name in names:
        try:
            got = qs[name](spark, sf_dir).toPandas()
            if name not in oracles:
                print(f"{name}: rows-only rows={len(got)}")
                records[name] = {
                    "rows_match": None,
                    "schema_match": None,
                    "hash_match": None,
                    "spark_rows": len(got),
                    "oracle_rows": None,
                    "err": None,
                }
                continue
            want = duck.execute(oracles[name]).fetchdf()
            rows_ok = len(got) == len(want)
            schema_ok = sorted(got.columns) == sorted(want.columns)
            hash_ok = rows_ok and schema_ok and value_hash(got) == value_hash(want)
            status = "OK" if (rows_ok and schema_ok and hash_ok) else "FAIL"
            if status == "FAIL":
                failures += 1
            records[name] = {
                "rows_match": rows_ok,
                "schema_match": schema_ok,
                "hash_match": hash_ok,
                "spark_rows": len(got),
                "oracle_rows": len(want),
                "err": None,
            }
            print(
                f"{name}: {status} rows={len(got)}/{len(want)} "
                f"schema={schema_ok} hash={hash_ok}"
            )
        except Exception as e:  # driver records err rows the same way
            failures += 1
            records[name] = {
                "rows_match": False,
                "schema_match": False,
                "hash_match": False,
                "spark_rows": None,
                "oracle_rows": None,
                "err": f"{type(e).__name__}: {e}",
            }
            print(f"{name}: ERROR {type(e).__name__}: {e}")
    if sweep_out is not None:
        import json
        import subprocess
        import time

        # Per-gate provenance stamp (ADVICE r07: a merged sweep's
        # un-rerun rows keep results from an older code state — make
        # that visible instead of implicit): every row RUN by this
        # invocation records the commit + wall time it ran at; merged
        # rows keep their original stamps, so a reader can tell exactly
        # which code state produced each row.
        try:
            head = subprocess.run(
                ["git", "-C", repo_root, "rev-parse", "--short", "HEAD"],
                capture_output=True, text=True, timeout=10,
            ).stdout.strip() or None
        except Exception:
            head = None
        stamp = {
            "commit": head,
            "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        for row in records.values():
            row["swept_at"] = stamp
        # --sweep --only name1,...: merge the re-run gates into the
        # existing artifact (adding a gate mid-round must not force a
        # full 207-gate re-run to keep the sweep-coverage test green);
        # a bare --sweep rewrites the whole file from this run
        if only is not None and os.path.exists(sweep_out):
            with open(sweep_out) as f:
                merged = json.load(f)
            merged.update(records)
            records = merged
        # key-sorted so the committed artifact diffs stably round-over-round
        with open(sweep_out, "w") as f:
            json.dump(dict(sorted(records.items())), f, indent=2, sort_keys=False)
            f.write("\n")
        print(f"sweep written: {sweep_out}")
    print(f"\n{len(names) - failures}/{len(names)} pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
