#!/usr/bin/env python3
"""Round-close automation (VERDICT r11 item 6, "What's wrong #2" x3).

Every round the driver drops CORRECTNESS_r{N}.json / BENCH_r{N}.json into
the repo root AFTER the builder's last commit, so each round opened with
untracked gate artifacts and a ROTATION.json whose `latest_driver_round`
was one behind. This script makes the hygiene structural:

  1. stage every CORRECTNESS_r*.json / BENCH_r*.json / bench_r*_pair.json
     / duckbase_r*.json / selfcheck_r*.log present on disk,
  2. regenerate ROTATION.json from the full artifact set
     (scripts/rotation_manifest.py),
  3. refresh COVERAGE.md's "Current totals:" sentence from the live
     catalog (query count, oracle coverage) and — when --pytest-count is
     given — the collected-test count,
  4. commit (unless --no-commit) with a deterministic message.

Run as the FIRST act of a round (to sweep the driver's just-written
artifacts for the PREVIOUS round) and again as the LAST act (idempotent:
nothing staged -> no commit).

Usage: python scripts/round_close.py [--no-commit] [--pytest-count N]
"""
from __future__ import annotations

import argparse
import glob
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARTIFACT_GLOBS = [
    "CORRECTNESS_r*.json",
    "BENCH_r*.json",
    "bench_r*_pair.json",
    "duckbase_r*.json",
    "selfcheck_r*.log",
    "ROTATION.json",
    "COVERAGE.md",
    # round gates added r14 (VERDICT r13 items 1 and 5): the whole-
    # catalog timing sweep and the volume-tier span regression cell
    "catalogtime_r*.json",
    "spantier_r*.json",
]


def sh(*args: str) -> str:
    return subprocess.run(
        args, cwd=ROOT, check=True, capture_output=True, text=True
    ).stdout


def latest_round() -> int:
    ns = [
        int(m.group(1))
        for p in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    return max(ns) if ns else 0


def catalog_counts() -> tuple[int, int]:
    """(queries, full-oracle queries) from the live entry point."""
    sys.path.insert(0, ROOT)
    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    return len(qs), len(set(qs) & set(oracles))


def refresh_coverage_totals(n_queries: int, n_oracle: int, pytest_count: int | None) -> bool:
    path = os.path.join(ROOT, "COVERAGE.md")
    with open(path) as f:
        text = f.read()
    orig = text
    oracle_phrase = (
        "ALL oracle-matched" if n_oracle == n_queries else f"{n_oracle} oracle-matched"
    )
    text = re.sub(
        r"Current totals: \*\*\d+ queries, (?:ALL|\d+) oracle-matched",
        f"Current totals: **{n_queries} queries, {oracle_phrase}",
        text,
        count=1,
    )
    if pytest_count is not None:
        text = re.sub(
            r"\d+ collected pytest tests", f"{pytest_count} collected pytest tests", text, count=1
        )
    if text != orig:
        with open(path, "w") as f:
            f.write(text)
    return text != orig


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-commit", action="store_true")
    ap.add_argument(
        "--pytest-count",
        type=int,
        default=None,
        help="collected-test count to splice into COVERAGE.md (from a prior "
        "`pytest --collect-only -q` run; omitted -> leave the old number)",
    )
    args = ap.parse_args()

    n = latest_round()
    nq, no = catalog_counts()
    print(f"latest driver round on disk: r{n}; catalog {nq} queries, {no} with oracles")

    # 2. regenerate manifest BEFORE staging so the fresh ROTATION.json is swept.
    subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "rotation_manifest.py")],
        cwd=ROOT,
        check=True,
    )

    # 3. refresh coverage totals.
    changed = refresh_coverage_totals(nq, no, args.pytest_count)
    print(f"COVERAGE.md totals {'updated' if changed else 'already current'}")

    # 1. stage everything.
    paths: list[str] = []
    for g in ARTIFACT_GLOBS:
        paths.extend(
            os.path.relpath(p, ROOT) for p in sorted(glob.glob(os.path.join(ROOT, g)))
        )
    sh("git", "add", "--", *paths)

    staged = sh("git", "diff", "--cached", "--name-only").strip()
    if not staged:
        print("nothing to commit — artifacts already tracked and current")
        return 0
    print("staged:\n" + staged)
    if args.no_commit:
        print("--no-commit: leaving staged")
        return 0
    sh(
        "git",
        "commit",
        "-m",
        f"round close: sweep r{n} gate artifacts, regen ROTATION.json, refresh COVERAGE totals",
    )
    print(sh("git", "log", "--oneline", "-1").strip())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
