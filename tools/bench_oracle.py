#!/usr/bin/env python3
"""Time the DuckDB oracle for every benchable query at a given scale
factor, so the bench record can carry a measured spark_sec/duckdb_sec
ratio per query instead of an argued one.

Usage: python3 tools/bench_oracle.py <sfDir> <oracleSqlJson>
Prints ONE JSON line {query_name: seconds}, -1.0 for failed/timed-out.

Methodology mirrors the Spark side (graft.Bench): one warm run, then the
min of two timed runs. fetchall() materializes the result like Spark's
toRdd.count() forces full evaluation; outputs are small (<= ~30k rows)
so transfer cost is noise. DuckDB runs with its default thread count
(all cores) — the same parallelism budget as local[32].

This is a DRIVER-SIDE harness tool (like check.py): the Scala library
has no DuckDB dependency; graft.Bench shells out to this script and
degrades gracefully when python3/duckdb are unavailable.
"""
import json
import os
import sys
import threading
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

PER_QUERY_BUDGET_SEC = 120.0   # interrupt a runaway query (quadratic tail)
TOTAL_BUDGET_SEC = 900.0       # stop timing altogether past this, mark rest -1


def timed_run(con, sql, budget):
    """One timed execution, interrupted past `budget` (raises on interrupt)."""
    fired = threading.Event()

    def _interrupt():
        fired.set()
        con.interrupt()

    timer = threading.Timer(budget, _interrupt)
    timer.start()
    try:
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        return time.perf_counter() - t0
    finally:
        timer.cancel()
        # join: if the timer fired concurrently with query completion the
        # interrupt flag can land on the connection with NO query running,
        # poisoning the NEXT execute (a healthy query would record -1.0).
        # Wait for any in-flight _interrupt, then absorb the stale flag.
        timer.join()
        if fired.is_set():
            try:
                con.execute("SELECT 1").fetchall()
            except Exception:
                pass


def main(sf_dir, oracle_path):
    con = duckdb.connect()
    for tbl in TABLES:
        # driver fixtures are single-FILE parquet; locally-generated
        # multi-split fixtures (graft.FixtureGen) are DIRECTORIES of part
        # files — glob those so the same oracle runs on both layouts
        path = f"{sf_dir}/{tbl}.parquet"
        src = f"'{path}/**/*.parquet'" if os.path.isdir(path) else f"'{path}'"
        con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM {src}")
    oracle = json.load(open(oracle_path))
    out = {}
    seen = {}  # sql text -> seconds: byte-identical oracle SQL (e.g. a
    # query and its prebuilt-artifact variant) is timed ONCE and the
    # measurement reused — re-running the heaviest DuckDB query under a
    # second name burns up to 3x its per-query budget for a number that
    # is equal by construction
    started = time.perf_counter()
    for name, sql in sorted(oracle.items()):
        if sql in seen:
            out[name] = seen[sql]
            continue
        # each run's budget is capped by the REMAINING total budget, so a
        # query straddling the total cutoff cannot overshoot it by up to
        # 3x the per-query budget (warm + two timed runs)
        def remaining():
            return min(PER_QUERY_BUDGET_SEC,
                       TOTAL_BUDGET_SEC - (time.perf_counter() - started))
        if remaining() <= 0:
            out[name] = -1.0
            continue
        # runs are taken one at a time so a budget interrupt mid-run-2
        # keeps run 1's valid measurement instead of discarding it with
        # the whole min(...) expression
        runs = []
        try:
            timed_run(con, sql, remaining())  # warm
            runs.append(timed_run(con, sql, remaining()))
            runs.append(timed_run(con, sql, remaining()))
        except Exception:
            pass
        if runs:
            out[name] = round(min(runs), 4)
            seen[sql] = out[name]
        else:
            out[name] = -1.0  # not cached: a later twin may still fit budget
    print(json.dumps(out, sort_keys=True))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
