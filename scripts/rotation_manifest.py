#!/usr/bin/env python3
"""Driver-gate rotation manifest (VERDICT r08 item 3).

The per-round driver gate (CORRECTNESS_r{N}.json) samples ~50 of the
catalog's queries; the committed selfcheck logs cover the full catalog
with the same strict compare. This script merges both evidence streams
into ROTATION.json, a machine-readable record answering, per query:

  - which driver rounds verified it (rows+schema+hash green),
  - its latest driver round and staleness (rounds since last sample),
  - which committed full-catalog selfcheck runs covered it,
  - whether it has EVER been driver-sampled (selfcheck-only queries
    are typically the newest additions, not yet rotated in).

Usage: python scripts/rotation_manifest.py [repo_root]
Writes <repo>/ROTATION.json and prints a summary.
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys


def load_driver_rounds(root: str) -> dict[int, dict]:
    rounds = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        n = int(m.group(1))
        with open(path) as f:
            d = json.load(f)
        rounds[n] = d.get("queries", d)
    return rounds


def load_selfchecks(root: str) -> dict[str, set[str]]:
    """selfcheck_r*.log lines look like '  <qname>: PASS ...' (driver-
    strict compare, full catalog). Collect qname -> set(log file) for
    passing lines only."""
    cov: dict[str, set[str]] = {}
    for path in sorted(glob.glob(os.path.join(root, "selfcheck_r*.log"))):
        base = os.path.basename(path)
        with open(path, errors="replace") as f:
            for line in f:
                # anchored on the actual selfcheck format: 'PASS <qname>:'
                # (Spark \r progress-bar junk may precede it on the same
                # physical line, so search — but the token must be the
                # literal PASS immediately before the query name)
                m = re.search(r"\bPASS (q\d+\w*):", line)
                if m:
                    cov.setdefault(m.group(1), set()).add(base)
    return cov


def catalog_queries() -> list[str]:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entry

    return sorted(entry.queries().keys())


def main() -> int:
    root = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    rounds = load_driver_rounds(root)
    selfchecks = load_selfchecks(root)
    latest_round = max(rounds) if rounds else 0
    cat = catalog_queries()

    manifest: dict[str, dict] = {}
    for q in cat:
        green, red = [], []
        for n, qs in sorted(rounds.items()):
            if q in qs:
                v = qs[q]
                ok = bool(v.get("rows_match")) and bool(v.get("schema_match", True)) \
                    and bool(v.get("hash_match", True)) and not v.get("err")
                (green if ok else red).append(n)
        last = max(green) if green else None
        manifest[q] = {
            "driver_rounds_green": green,
            "driver_rounds_failed": red,
            "last_driver_round": last,
            "driver_staleness_rounds": (latest_round - last) if last is not None else None,
            "selfcheck_logs": sorted(selfchecks.get(q, ())),
            "ever_driver_sampled": bool(green or red),
        }

    never = [q for q in cat if not manifest[q]["ever_driver_sampled"]]
    stale = {
        q: m["driver_staleness_rounds"]
        for q, m in manifest.items()
        if m["driver_staleness_rounds"] is not None
    }
    out = {
        "latest_driver_round": latest_round,
        "catalog_size": len(cat),
        "driver_sampled_ever": len(cat) - len(never),
        "never_driver_sampled": never,
        "max_driver_staleness_rounds": max(stale.values()) if stale else None,
        "selfcheck_full_coverage": sorted(
            {q for q in cat if manifest[q]["selfcheck_logs"]}
        ) == cat,
        "queries": manifest,
    }
    dest = os.path.join(root, "ROTATION.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=1, sort_keys=False)
    print(
        f"catalog={len(cat)} driver-sampled-ever={out['driver_sampled_ever']} "
        f"never={len(never)} max-staleness={out['max_driver_staleness_rounds']} "
        f"selfcheck-full={out['selfcheck_full_coverage']} -> {dest}"
    )
    if never:
        print("never driver-sampled (selfcheck-only):", ", ".join(never[:20]),
              "..." if len(never) > 20 else "")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
