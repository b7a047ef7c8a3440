"""Full-registry oracle gate at sf0.001.

The grading driver verifies only the first 50 SUITE entries per round; this
test replays the same Spark-vs-DuckDB comparison over EVERY registered entry
so queries outside the current rotation window cannot silently rot between
their driver rounds (ADVICE r4 #3). Runs at sf0.001 to keep it CI-speed;
`tools/verify_local.py /root/testdata/sf0.01` remains the pre-commit check
at driver scale.
"""

from __future__ import annotations

import pytest

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.verify_local import duckdb_connection, lint_oracle_types, verify_entries  # noqa: E402


def test_oracle_output_types_are_canonicalizer_safe(sf_dir):
    """No oracle may emit HUGEINT/UHUGEINT/DECIMAL output columns: the driver
    canonicalizer hashes those differently from any Spark type even when the
    values are equal (VERDICT r5 — three bare SUM(int) HUGEINT reds; r4 — one
    DECIMAL red). Planning-only, so it lints all oracles in seconds."""
    from vector_mcp_spark.suite import SUITE

    con = duckdb_connection(sf_dir)
    offenders = {
        name: bad
        for name, entry in SUITE.items()
        if entry.oracle is not None
        for bad in [lint_oracle_types(con, entry.oracle)]
        if bad
    }
    assert offenders == {}, f"cast these oracle columns to BIGINT/DOUBLE/VARCHAR: {offenders}"
    # the lint itself must catch a seeded regression
    assert lint_oracle_types(con, "SELECT SUM(1) AS s") == [("s", "HUGEINT")]
    assert lint_oracle_types(con, "SELECT CAST(1 AS DECIMAL(10,2)) AS d") == [("d", "DECIMAL(10,2)")]


@pytest.mark.slow
def test_every_suite_entry_matches_its_oracle(spark, sf_dir):
    from vector_mcp_spark.suite import SUITE

    assert len(SUITE) >= 124  # the registry only grows
    failures = verify_entries(spark, sf_dir, names=None, verbose=True)
    assert failures == []
