"""Local stand-in for the driver's correctness gate.

Runs every declared query at a given sf_dir on Spark AND its oracle SQL on
DuckDB, then compares row count + column names + an order-insensitive value
multiset (floats rounded to 6 dp before compare, mirroring the rounding both
sides already apply).

Usage: python tools/verify_local.py [--window] [sf_dir] [query ...]
(--window = verify exactly the driver's 50-entry correctness window)

The comparison core (`verify_entries`) is importable so the test suite can
run the same gate over the FULL registry at sf0.001 each round — entries
outside the driver's 50-entry window can't silently rot between their
driver rounds (ADVICE r4 #3).
"""

from __future__ import annotations

import math
import sys
from collections import Counter

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


def duckdb_connection(sf_dir: str):
    """A DuckDB connection with the standard tables registered as views."""
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


# DuckDB output types the driver's canonicalizer hashes differently from any
# Spark type (VERDICT r5: bare SUM(int) → HUGEINT red despite equal values;
# r4: DECIMAL). Oracles must cast these away (BIGINT / DOUBLE / VARCHAR).
_BANNED_ORACLE_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def lint_oracle_types(con, oracle_sql: str) -> list[tuple[str, str]]:
    """Return (column, type) pairs whose DuckDB output type would hash
    differently from the Spark side at the driver. Planning-only: builds the
    relation without executing it."""
    rel = con.sql(oracle_sql)
    bad = []
    for col, typ in zip(rel.columns, rel.types):
        t = str(typ).upper()
        if any(t.startswith(b) for b in _BANNED_ORACLE_TYPES):
            bad.append((col, t))
    return bad


def verify_entry(spark, con, entry, sf_dir: str) -> tuple[bool, int, str]:
    """Run one suite entry both ways. Returns (ok, spark_rows, detail)."""
    sdf = entry.spark_fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)
    if entry.oracle is None:
        return True, len(srows), "rows-only check [no oracle]"
    bad_types = lint_oracle_types(con, entry.oracle)
    if bad_types:
        return False, len(srows), (
            f"ORACLE TYPE LINT {bad_types} — cast to BIGINT/DOUBLE/VARCHAR; the "
            "driver canonicalizer hashes these differently from Spark"
        )
    ocur = con.execute(entry.oracle)
    ocols = [d[0] for d in ocur.description]
    orows = ocur.fetchall()
    if sorted(scols) != sorted(ocols):
        return False, len(srows), f"SCHEMA MISMATCH spark={sorted(scols)} oracle={sorted(ocols)}"
    if len(srows) != len(orows):
        return False, len(srows), f"ROWCOUNT MISMATCH spark={len(srows)} oracle={len(orows)}"
    sm, om = _multiset(srows, scols), _multiset(orows, ocols)
    if sm != om:
        diff_s = list((sm - om).items())[:3]
        diff_o = list((om - sm).items())[:3]
        return False, len(srows), f"VALUE MISMATCH\n  spark-only: {diff_s}\n  oracle-only: {diff_o}"
    return True, len(srows), "OK"


def verify_entries(spark, sf_dir: str, names=None, verbose: bool = True) -> list[str]:
    """Run the driver-style gate over `names` (default: whole SUITE).
    Returns the list of failing entry names."""
    from vector_mcp_spark.suite import SUITE

    con = duckdb_connection(sf_dir)
    failures = []
    for name, entry in SUITE.items():
        if names is not None and name not in names:
            continue
        ok, n_rows, detail = verify_entry(spark, con, entry, sf_dir)
        if verbose:
            if detail not in ("OK",):
                print(f"{name}: {detail}")
            print(f"{name}: {'OK' if ok else 'FAIL'} ({n_rows} rows)")
        if not ok:
            failures.append(name)
    return failures


def main() -> int:
    sys.path.insert(0, ".")
    args = sys.argv[1:]
    window_only = "--window" in args
    if window_only:
        args = [a for a in args if a != "--window"]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:]) or None
    if window_only:
        # exactly what the driver will check this round: the first 50
        from vector_mcp_spark.suite import SUITE

        only = set(list(SUITE)[:50])

    from vector_mcp_spark.session import get_spark

    spark = get_spark("verify_local")
    failures = verify_entries(spark, sf_dir, only)
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
