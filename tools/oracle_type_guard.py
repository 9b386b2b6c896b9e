#!/usr/bin/env python3
"""Oracle output-type guard: DESCRIBE every oracle SQL string and fail on
any output column whose DuckDB type Spark cannot produce, so type-only
hash mismatches (rows+schema match, hash red) can never recur.

Root cause this guards against (round 9): DuckDB's sum(BIGINT) returns
HUGEINT (int128). Spark writes int64. The driver's hash is type-sensitive,
so a bare sum over a BIGINT column turns the record row red even when
every value is equal. The fix is always CAST(sum(..) AS BIGINT) on the
oracle side; this guard makes the omission a hard failure at check time.

Rules:
  - HUGEINT / UHUGEINT anywhere in an output column type -> FAIL always.
  - DECIMAL output -> FAIL unless the Spark-side parquet for that query
    (when present in <verifyOutDir>) has a decimal column of the same name
    (the u64 coercion family legitimately compares DECIMAL(20,0)).

Usage: python3 tools/oracle_type_guard.py <sfDir> <verifyOutDir>
Exit 0 = all oracle strings type-clean; 1 = violations printed.
"""
import json, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def spark_decimal_cols(con, out_dir, name):
    try:
        desc = con.execute(
            f"DESCRIBE SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchall()
        return {c for c, t, *_ in desc if "DECIMAL" in t.upper()}
    except Exception:
        return None  # no Spark dump available (e.g. SPARK_GRAFT_ONLY run)


def main(sf_dir, out_dir):
    import os
    con = duckdb.connect()
    for tbl in TABLES:
        # driver fixtures are single-FILE parquet; locally-generated
        # multi-split fixtures (graft.FixtureGen) are DIRECTORIES — glob
        path = f"{sf_dir}/{tbl}.parquet"
        src = f"'{path}/**/*.parquet'" if os.path.isdir(path) else f"'{path}'"
        con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM {src}")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            print(f"FAIL {name}: DESCRIBE error: {e}")
            bad += 1
            continue
        spark_dec = None
        for col, typ, *_ in desc:
            t = typ.upper()
            if "HUGEINT" in t:
                print(f"FAIL {name}: column '{col}' is {typ} — Spark cannot "
                      f"produce int128; cast the aggregate in the oracle SQL")
                bad += 1
            elif "DECIMAL" in t:
                if spark_dec is None:
                    spark_dec = spark_decimal_cols(con, out_dir, name)
                if spark_dec is not None and col not in spark_dec:
                    print(f"FAIL {name}: column '{col}' is {typ} but the "
                          f"Spark result column is not decimal")
                    bad += 1
    if bad:
        print(f"{bad} type violation(s)")
        return 1
    print(f"OK: {len(oracle)} oracle strings type-clean")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
