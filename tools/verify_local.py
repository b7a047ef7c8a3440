"""Local stand-in for the driver's correctness gate.

Runs every declared query at a given sf_dir on Spark AND its oracle SQL on
DuckDB, then compares row count + column names + an order-insensitive value
multiset (floats rounded to 6 dp before compare, mirroring the rounding both
sides already apply).

Usage: python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from collections import Counter

sys.path.insert(0, ".")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{round(v, 6):.6f}"
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    return v


def _multiset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(_norm_cell(row[i]) for i in order) for row in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    from vector_mcp_spark.session import get_spark
    from vector_mcp_spark.suite import SUITE

    spark = get_spark("verify_local")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, entry in SUITE.items():
        if only and name not in only:
            continue
        sdf = entry.spark_fn(spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = list(sdf.columns)
        if entry.oracle is None:
            print(f"{name}: rows-only check, spark={len(srows)} rows  [no oracle]")
            continue
        ocur = con.execute(entry.oracle)
        ocols = [d[0] for d in ocur.description]
        orows = ocur.fetchall()
        ok = True
        if sorted(scols) != sorted(ocols):
            print(f"{name}: SCHEMA MISMATCH spark={sorted(scols)} oracle={sorted(ocols)}")
            ok = False
        if len(srows) != len(orows):
            print(f"{name}: ROWCOUNT MISMATCH spark={len(srows)} oracle={len(orows)}")
            ok = False
        if ok:
            sm, om = _multiset(srows, scols), _multiset(orows, ocols)
            if sm != om:
                diff_s = list((sm - om).items())[:3]
                diff_o = list((om - sm).items())[:3]
                print(f"{name}: VALUE MISMATCH\n  spark-only: {diff_s}\n  oracle-only: {diff_o}")
                ok = False
        print(f"{name}: {'OK' if ok else 'FAIL'} ({len(srows)} rows)")
        if not ok:
            failures.append(name)

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
