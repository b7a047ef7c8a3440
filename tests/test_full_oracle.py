"""Full-registry oracle gate at sf0.001.

The grading driver verifies only the first 50 SUITE entries per round; this
test replays the same Spark-vs-DuckDB comparison over EVERY registered entry
so queries outside the current rotation window cannot silently rot between
their driver rounds (ADVICE r4 #3). Runs at sf0.001 to keep it CI-speed;
`tools/verify_local.py /root/testdata/sf0.01` remains the pre-commit check
at driver scale.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.verify_local import verify_entries  # noqa: E402


def test_every_suite_entry_matches_its_oracle(spark, sf_dir):
    from vector_mcp_spark.suite import SUITE

    assert len(SUITE) >= 124  # the registry only grows
    failures = verify_entries(spark, sf_dir, names=None, verbose=True)
    assert failures == []
