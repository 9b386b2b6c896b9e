#!/usr/bin/env python3
"""Local differential check: run DuckDB oracle SQL against the fixture
parquet tables and compare with the Spark results dumped by graft.Verify.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Mirrors the driver's compare: sort columns by name, sort rows, compare
values cell-by-cell (floats with tolerance reported separately so we can
decide whether rounding discipline is sufficient for a hash match).
"""
import json, math, os, sys
import duckdb

# tools/ must be importable for the oracle_type_guard used in main() —
# anchored to this file's own directory so `import check; check.main(...)`
# from any cwd works, not just the __main__ entry
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import oracle_type_guard

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver hashes values; emulate exact-repr compare
        return repr(round(v, 9))
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        # DuckDB surfaces STRUCT/MAP cells as dicts: recurse so nested
        # floats get the same rounding/NaN normalization as flat ones
        # (a NaN inside a struct would otherwise be a guaranteed false
        # FAIL — NaN != NaN)
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for tbl in ["region", "nation", "customer", "supplier", "part",
                "orders", "lineitem", "events", "documents", "embeddings"]:
        # driver fixtures are single-FILE parquet; locally-generated
        # multi-split fixtures (graft.FixtureGen) are DIRECTORIES — glob
        path = f"{sf_dir}/{tbl}.parquet"
        src = f"'{path}/**/*.parquet'" if os.path.isdir(path) else f"'{path}'"
        con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM {src}")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.execute(sql)
            want_cols = [d[0] for d in want.description]
            want_rows = want.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        try:
            got = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = [d[0] for d in got.description]
            got_rows = got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_bad += 1
            continue
        wc, wr = canon(want_rows, want_cols)
        gc, gr = canon(got_rows, got_cols)
        if wc != gc:
            print(f"FAIL {name}: columns differ\n  oracle: {wc}\n  spark:  {gc}")
            n_bad += 1
            continue
        if len(wr) != len(gr):
            print(f"FAIL {name}: row count differs oracle={len(wr)} spark={len(gr)}")
            n_bad += 1
            continue
        bad = [(a, b) for a, b in zip(wr, gr) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(wr)} rows differ; first: ")
            print(f"  oracle: {bad[0][0]}")
            print(f"  spark:  {bad[0][1]}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(wr)} rows)")
            n_ok += 1
    # queries without oracle: just report row counts
    import glob  # os already imported at module scope (an inner
    # `import os` would make it function-local and unbind the view-glob
    # reference above)
    for p in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(p.rstrip("/"))
        if name not in oracle:
            try:
                n = con.execute(f"SELECT count(*) FROM '{p}*.parquet'").fetchone()[0]
                print(f"INFO {name}: no oracle, {n} rows")
            except Exception as e:
                print(f"FAIL {name}: unreadable no-oracle output: {e}")
                n_bad += 1
    # standing type guard: DESCRIBE every oracle string and fail on output
    # types Spark cannot produce (the round-9 HUGEINT class) — wired into
    # the main check loop so the omission of a CAST can never pass silently
    guard_bad = oracle_type_guard.main(sf_dir, out_dir)
    if guard_bad:
        n_bad += 1

    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
