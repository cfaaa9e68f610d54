#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify's
parquet dumps against SparkEntry.oracleSql via DuckDB and diff.

Usage: python3 scripts/compare.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    """Column-name-sorted, row-sorted canonical form (mirrors the driver:
    sorts columns by name before hashing values)."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in idx))
    out.sort(key=lambda t: tuple((v is None, str(v)) for v in t))
    return [sorted(c for c in cols)] + out


def norm(v):
    import datetime
    import math
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            spark = canon(spark_rel.fetchall(), spark_rel.columns)
            duck_rel = con.sql(sql)
            duck = canon(duck_rel.fetchall(), duck_rel.columns)
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if spark == duck:
            print(f"PASS {name} ({len(spark)-1} rows)")
            n_pass += 1
        else:
            n_fail += 1
            if spark[0] != duck[0]:
                print(f"FAIL {name}: columns spark={spark[0]} duck={duck[0]}")
                continue
            sset, dset = set(map(str, spark[1:])), set(map(str, duck[1:]))
            only_s = list(sset - dset)[:3]
            only_d = list(dset - sset)[:3]
            print(f"FAIL {name}: rows spark={len(spark)-1} duck={len(duck)-1}"
                  f"\n  only-spark: {only_s}\n  only-duck:  {only_d}")
    # Queries WITHOUT an oracle get the driver's weaker rows-only check —
    # but ONLY if they are intentionally oracle-less (explicit allowlist).
    # An unexpected extra (stale dir from a renamed query, or an oracle
    # entry accidentally dropped) must FAIL, not silently downgrade from
    # hash-checked to rows>0. Currently every query has an oracle.
    ROWS_ONLY_OK: set = set()
    import glob
    import os
    for d in sorted(glob.glob(f"{out_dir}/q_*")):
        name = os.path.basename(d)
        if name in oracle:
            continue
        if name not in ROWS_ONLY_OK:
            print(f"FAIL {name}: output dir has no oracle entry and is not "
                  f"in the rows-only allowlist (stale dir or dropped oracle?)")
            n_fail += 1
            continue
        try:
            n = con.sql(f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0]
        except Exception as e:
            print(f"FAIL {name} (rows-only): {e}")
            n_fail += 1
            continue
        if n > 0:
            print(f"PASS {name} (rows-only, {n} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name} (rows-only): empty result")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
