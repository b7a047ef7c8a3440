"""Declarative data-quality expectations — the gate a pipeline runs before
promoting a snapshot.

Each expectation is a named, SQL-expressible predicate over a table;
``expectation_report`` evaluates ALL of them in ONE scan (conditional
aggregation — no per-rule jobs) and returns a row per rule with violation
counts. Uniqueness rules need their own grouped pass, still one shuffle
for any number of key sets. The report is plain data, so it can gate a
write, feed a dashboard, or diff across snapshots.

Rules:
* ``("not_null", col)`` — col IS NOT NULL
* ``("unique", col)`` — no value occurs twice
* ``("in_set", col, values)`` — col ∈ values (NULL counts as violation)
* ``("range", col, lo, hi)`` — lo ≤ col ≤ hi (NULL counts as violation)
* ``("expr", name, sql_bool)`` — arbitrary boolean SQL; False/NULL = violation
* ``("ref", col, other_df, other_col)`` — referential integrity: every
  ``col`` value must exist in ``other_df[other_col]`` (left-anti count;
  one extra pass per ref rule)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def expectation_report(df: DataFrame, rules: list[tuple]) -> DataFrame:
    """Evaluate rules → (rule, violations bigint, passed boolean), one scan
    for row-level rules + one grouped pass per set of unique rules."""
    if not rules:
        raise ValueError("expectation_report: no rules given")
    row_aggs = []
    row_names = []
    unique_cols = []
    ref_rules = []
    for rule in rules:
        kind = rule[0]
        if kind == "not_null":
            _, col = rule
            name, bad = f"not_null:{col}", F.col(col).isNull()
        elif kind == "in_set":
            _, col, values = rule
            name = f"in_set:{col}"
            bad = ~F.col(col).isin(*values) | F.col(col).isNull()
        elif kind == "range":
            _, col, lo, hi = rule
            name = f"range:{col}"
            bad = ~F.col(col).between(lo, hi) | F.col(col).isNull()
        elif kind == "expr":
            _, name, sql = rule
            name = f"expr:{name}"
            bad = ~F.coalesce(F.expr(sql), F.lit(False))
        elif kind == "unique":
            unique_cols.append(rule[1])
            continue
        elif kind == "ref":
            ref_rules.append((rule[1], rule[2], rule[3]))
            continue
        else:
            raise ValueError(f"unknown expectation kind: {kind}")
        row_names.append(name)
        row_aggs.append(F.sum(bad.cast("long")).alias(name))

    parts = []
    if row_aggs:
        wide = df.agg(*row_aggs)
        stack = ", ".join(f"'{n}', `{n}`" for n in row_names)
        parts.append(
            wide.selectExpr(
                f"stack({len(row_names)}, {stack}) AS (rule, violations)"
            )
        )
    for col in unique_cols:
        dupes = (
            df.groupBy(col)
            .count()
            .where(F.col("count") > 1)
            .agg(F.coalesce(F.sum(F.col("count") - 1), F.lit(0)).alias("violations"))
            .select(F.lit(f"unique:{col}").alias("rule"), "violations")
        )
        parts.append(dupes)
    for col, other_df, other_col in ref_rules:
        orphans = (
            df.select(F.col(col))
            .join(other_df.select(F.col(other_col).alias(col)), col, "left_anti")
            .agg(F.count("*").alias("violations"))
            .select(F.lit(f"ref:{col}").alias("rule"), "violations")
        )
        parts.append(orphans)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select("rule", "violations", (F.col("violations") == 0).alias("passed"))
