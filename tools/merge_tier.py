#!/usr/bin/env python
"""Merge a partial scale_bench record (e.g. a --only run for a newly
added query) into a committed tier JSON: entries are upserted, `value`
recomputed as the sum of steady seconds, everything else kept. Avoids
re-running a full multi-hour tier for one new operator while keeping
one self-consistent record per tier.

Usage: python tools/merge_tier.py TIER_JSON PARTIAL_JSON
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    tier_path, part_path = sys.argv[1], sys.argv[2]
    with open(tier_path) as f:
        tier = json.load(f)
    with open(part_path) as f:
        part = json.load(f)
    if part.get("sf") != tier.get("sf"):
        raise SystemExit(f"sf mismatch: {part.get('sf')} vs {tier.get('sf')}")
    # entries measured under a non-default memory profile carry it, so
    # the tier report can mark the rows (r9 verdict #7: every number's
    # profile must be reproducible from the record)
    if part.get("profile", "default") != "default":
        for e in part.get("queries", {}).values():
            if isinstance(e, dict):
                e["profile"] = part["profile"]
    tier["queries"].update(part.get("queries", {}))
    tier.setdefault("skipped", {}).update(part.get("skipped", {}))
    tier["value"] = round(
        sum(e["steady_seconds"] for e in tier["queries"].values()), 4
    )
    with open(tier_path, "w") as f:
        json.dump(tier, f, indent=1)
    print(f"merged {sorted(part.get('queries', {}))} into {tier_path}")


if __name__ == "__main__":
    main()
