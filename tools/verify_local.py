#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: after `sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/vout"`,
run `python3 tools/verify_local.py /root/testdata/sf0.01 /tmp/vout`.

For each query dir under outDir: read the Spark parquet result, run the
oracle SQL from oracle_sql.json in DuckDB against the sf parquet tables,
and compare row counts + per-cell values (columns sorted by name, rows
sorted) with exact match for non-floats and tiny-epsilon for floats.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return round(v, 6)
    return v


def dtype_mismatches(con, spark_rel_sql, oracle_sql):
    """The driver's hash is DTYPE-sensitive (CORRECTNESS_r08 failed
    q33/q34/t42 on decimal/hugeint width with byte-identical values).
    Compare the DuckDB-visible column types of the Spark parquet
    result vs the oracle relation, aligned by sorted column name.
    Returns a list of "col: spark_type vs oracle_type" strings."""
    srel = con.sql(spark_rel_sql)
    orel = con.sql(oracle_sql)
    stypes = dict(zip(srel.columns, [str(t) for t in srel.types]))
    otypes = dict(zip(orel.columns, [str(t) for t in orel.types]))
    out = []
    for c in sorted(set(stypes) & set(otypes)):
        if stypes[c] != otypes[c]:
            out.append(f"{c}: spark={stypes[c]} oracle={otypes[c]}")
    return out


def main(sf_dir, out_dir, partial=False):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = []
    skipped = 0
    for name, sql in sorted(oracle.items()):
        import os
        if not os.path.isdir(f"{out_dir}/{name}"):
            # a registered oracle with no dump is a FAILURE unless the
            # run explicitly opted into a partial dump (--partial, the
            # single-query iteration flow) — otherwise a query that
            # crashed mid-Verify would silently pass the gate (ADVICE r9)
            if partial:
                skipped += 1
            else:
                fails.append((name, "no Spark dump (query crashed in Verify? "
                                    "pass --partial for single-query iteration)"))
            continue
        try:
            spark_df = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchall()
            spark_cols = [d[0] for d in con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet' LIMIT 0").description]
        except Exception as e:
            fails.append((name, f"spark result unreadable: {e}"))
            continue
        try:
            res = con.sql(sql)
            oracle_cols = [d[0] for d in res.description]
            oracle_df = res.fetchall()
        except Exception as e:
            fails.append((name, f"oracle sql failed: {e}"))
            continue
        if sorted(spark_cols) != sorted(oracle_cols):
            fails.append((name, f"columns differ: spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}"))
            continue
        dt = dtype_mismatches(
            con, f"SELECT * FROM '{out_dir}/{name}/*.parquet' LIMIT 0", sql)
        if dt:
            fails.append((name, "dtype mismatch: " + "; ".join(dt)))
            continue
        if len(spark_df) != len(oracle_df):
            fails.append((name, f"row count: spark={len(spark_df)} oracle={len(oracle_df)}"))
            continue
        # driver sorts columns by name before hashing values
        sperm = [spark_cols.index(c) for c in sorted(spark_cols)]
        operm = [oracle_cols.index(c) for c in sorted(oracle_cols)]
        srows = sorted([tuple(norm(r[i]) for i in sperm) for r in spark_df],
                       key=repr)
        orows = sorted([tuple(norm(r[i]) for i in operm) for r in oracle_df],
                       key=repr)
        bad = None
        for i, (a, b) in enumerate(zip(srows, orows)):
            if a != b:
                ok = len(a) == len(b)
                if ok:
                    for x, y in zip(a, b):
                        if x == y:
                            continue
                        if isinstance(x, float) and isinstance(y, float) and \
                           math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9):
                            continue
                        ok = False
                        break
                if not ok:
                    bad = (i, a, b)
                    break
        if bad:
            fails.append((name, f"row {bad[0]} differs:\n  spark={bad[1]}\n  oracle={bad[2]}"))
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
    for name, msg in fails:
        print(f"FAIL {name}: {msg}")
    checked = len(oracle) - skipped
    note = f" ({skipped} not dumped, skipped)" if skipped else ""
    print(f"\n{checked - len(fails)}/{checked} passed{note}")
    return 1 if fails else 0


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a != "--partial"]
    sys.exit(main(argv[0], argv[1], partial="--partial" in sys.argv))
