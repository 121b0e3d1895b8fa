"""Dump `.explain("formatted")` for the named queries into
plans/<round>/<query>_<tag>.txt — the committed evidence pairs the
judge checks plan claims against (run once from the before-worktree
with tag=before, once from the after-tree with tag=after).

Usage: python scripts/planpair.py <plans_dir> <tag> <sf_dir> <query ...>
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# match the bench/catalog measurement environment: repaired scan layout
os.environ.setdefault("SPARK_GRAFT_LAYOUT_CACHE", "1")


def main() -> None:
    plans_dir, tag, sf_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    os.makedirs(plans_dir, exist_ok=True)

    from batch_process_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(f"planpair-{tag}")
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        out = os.path.join(plans_dir, f"{name}_{tag}.txt")
        with open(out, "w") as fh:
            fh.write(buf.getvalue())
        print(f"# wrote {out}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
