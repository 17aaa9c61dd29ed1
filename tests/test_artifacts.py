"""Committed-proof-artifact guards (VERDICT r5 #6): the driver's
CORRECTNESS artifact truncates at ~50 rows, so each round commits a
self-check (tools/check_oracle.py --json) covering EXACTLY queries().
This test pins that the newest committed artifact's key set equals the
live surface — a truncated or stale artifact can never pass silently."""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_self_check_artifact_covers_full_surface():
    files = glob.glob(os.path.join(REPO, "CORRECTNESS_SELF_r*.json"))
    assert files, "no committed CORRECTNESS_SELF_r*.json artifact"
    latest = max(
        files, key=lambda p: int(re.search(r"_r(\d+)\.json$", p).group(1))
    )
    with open(latest) as fh:
        data = json.load(fh)

    import __spark_entry__ as entrymod

    surface = set(entrymod.queries().keys())
    recorded = set(data["results"].keys())
    assert recorded == surface, (
        f"{os.path.basename(latest)} records {len(recorded)} queries but "
        f"queries() has {len(surface)}: missing={sorted(surface - recorded)} "
        f"stale={sorted(recorded - surface)} — regenerate the artifact "
        f"(python tools/check_oracle.py --json CORRECTNESS_SELF_rN.json)"
    )
    assert data["n_queries"] == len(surface)

    # and every recorded row is GREEN: oracle-matched, or explicitly
    # rows-only (match fields None — the artifact cannot overstate)
    for name, row in data["results"].items():
        assert row["err"] is None, (name, row["err"])
        if row.get("rows_only"):
            assert row["rows_match"] is None  # never a fabricated match
            continue
        assert row["rows_match"] is True, name
        assert row["schema_match"] is True, name
        assert row["hash_match"] is True, name
