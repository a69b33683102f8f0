#!/usr/bin/env python3
"""Byte-level exactness audit — STRONGER than verify_local.py.

verify_local compares floats with a tiny epsilon; the driver may hash
exactly. This script compares Spark and DuckDB results with plain
tuple equality (repr-level, no tolerance), which is what caught the
cross-engine ROUND-tie bug in round 1.

Usage:
  sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/vout01"
  python3 tools/exact_audit.py /root/testdata/sf0.1 /tmp/vout01
"""
import decimal
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir, partial=False):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = 0
    skipped = 0
    for name, sql in sorted(oracle.items()):
        import os
        if not os.path.isdir(f"{out_dir}/{name}"):
            # missing dump = failure unless --partial (single-query
            # iteration) — see ADVICE r9: a crashed query must not
            # silently pass the byte-exact gate
            if partial:
                skipped += 1
            else:
                print(f"FAIL {name}: no Spark dump (pass --partial for "
                      f"single-query iteration)")
                fails += 1
            continue
        try:
            sdesc = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet' LIMIT 0").description
            scols = [d[0] for d in sdesc]
            order = sorted(range(len(scols)), key=lambda i: scols[i])
            srows = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchall()
            orows = con.sql(sql).fetchall()
            ocols = [d[0] for d in con.sql(sql).description]
            oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
            if sorted(scols) != sorted(ocols):
                print(f"FAIL {name}: columns {sorted(scols)} vs {sorted(ocols)}")
                fails += 1
                continue
            # driver hash is dtype-sensitive (r08: q33/q34/t42 red on
            # decimal/hugeint width with byte-identical values)
            srel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet' LIMIT 0")
            orel = con.sql(sql)
            stypes = dict(zip(srel.columns, [str(t) for t in srel.types]))
            otypes = dict(zip(orel.columns, [str(t) for t in orel.types]))
            dt = [f"{c}: spark={stypes[c]} oracle={otypes[c]}"
                  for c in sorted(stypes) if stypes[c] != otypes[c]]
            if dt:
                print(f"FAIL {name}: dtype mismatch: {'; '.join(dt)}")
                fails += 1
                continue
            # NULL-safe total order (q25's asof join emits NULL sides);
            # numerics normalized to one class token + float value so
            # int-vs-Decimal type drift across engines can't misalign
            # the zip; equality below stays plain tuple equality on the
            # RAW tuples — no tolerance.
            def keyval(v):
                if v is None:
                    return (True, "none", 0)
                if isinstance(v, (bool, int, float, decimal.Decimal)):
                    return (False, "num", float(v))
                return (False, repr(type(v)), v)

            def key(row):
                return tuple(keyval(v) for v in row)
            s = sorted((tuple(r[i] for i in order) for r in srows), key=key)
            o = sorted((tuple(r[i] for i in oorder) for r in orows), key=key)
            if len(s) != len(o):
                print(f"FAIL {name}: {len(s)} vs {len(o)} rows")
                fails += 1
                continue
            bad = [(a, b) for a, b in zip(s, o) if a != b]
            if bad:
                print(f"FAIL {name}: {len(bad)} differing rows; first: {bad[0]}")
                fails += 1
            else:
                print(f"EXACT {name} ({len(s)} rows)")
        except Exception as e:
            print(f"ERROR {name}: {e}")
            fails += 1
    checked = len(oracle) - skipped
    note = f" ({skipped} not dumped, skipped)" if skipped else ""
    print(f"{checked - fails}/{checked} byte-exact{note}")
    return 1 if fails else 0


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a != "--partial"]
    sys.exit(main(argv[0], argv[1], partial="--partial" in sys.argv))
