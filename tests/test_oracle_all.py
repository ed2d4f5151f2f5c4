"""Every oracle-backed queries() entry, checked in CI regardless of the
driver gate's 50-entry prefix window (ADVICE r3: displaced oracle entries
must be machine-checked on every commit, not ad hoc). Runs the whole
registry against DuckDB at sf0.001 — ~60 s, one Spark job per entry."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_every_oracle_entry_matches_duckdb(spark):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import check_oracle

    failures = check_oracle.main(sf_dir="/root/testdata/sf0.001")
    assert failures == []
