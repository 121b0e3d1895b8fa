"""CLI: run or preview a rule-config pipeline over a directory tree.

Mirrors the reference's ``python -m batch_process.cli <root> -c
config.yaml`` lifecycle (SURVEY §3.1):

    python -m batch_process_spark.cli run <root> -c config.yaml
    python -m batch_process_spark.cli simulate <root> -c config.yaml
    python -m batch_process_spark.cli ops            # operator listing
    python -m batch_process_spark.cli compact <dir> --target-mb 128
                                                     # small-files rewrite
    python -m batch_process_spark.cli template config.yaml
                                                     # starter rule config
    python -m batch_process_spark.cli query q01_pricing_summary \
        --sf-dir /root/testdata/sf0.01 [--limit 20] [--json] [--explain]
                                                     # run a catalog query
    python -m batch_process_spark.cli index-compact <dir> [--target-mb 128]
    python -m batch_process_spark.cli index-delete <dir> --ids 1,2,3|@file
    python -m batch_process_spark.cli index-recluster <dir> \
        [--skew-threshold 4.0] [--force]             # stored-index lifecycle
    python -m batch_process_spark.cli index-hubness <dir> \
        [--k 10] [--nprobe auto] [--max-queries 100000]
                                                     # serving-path hubness audit

Plugins: ``--plugins <dir>`` imports every ``*.py`` there; modules
self-register via the ``@operator`` decorator.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import sys
from pathlib import Path


# Cap on per-step detail lines printed by `run` — the full log is the
# --history parquet sink; the driver never holds more than one partition
# of the results frame (toLocalIterator) plus this many printed rows.
MAX_CLI_ROWS = 1000


def load_plugins(plugin_dir: str) -> None:
    for py in sorted(Path(plugin_dir).glob("*.py")):
        spec = importlib.util.spec_from_file_location(py.stem, py)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)  # type: ignore[union-attr]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="batch_process_spark")
    ap.add_argument(
        "command",
        choices=[
            "run", "simulate", "ops", "compact", "template", "query",
            "index-compact", "index-delete", "index-recluster",
            "index-hubness",
        ],
    )
    ap.add_argument("root", nargs="?", help="directory tree to process / query name / index dir")
    ap.add_argument("-c", "--config", help="YAML/JSON rule config")
    ap.add_argument("--plugins", help="directory of plugin modules")
    ap.add_argument("--history", help="parquet dir for the run history sink")
    ap.add_argument("--with-text", action="store_true", help="read file contents (text) for stages")
    ap.add_argument("--target-mb", type=int, default=128, help="compact: target file size")
    ap.add_argument("--sort-by", help="compact: comma-separated sort columns for data skipping")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01", help="query: parquet table dir")
    ap.add_argument("--limit", type=int, default=50, help="query: max rows printed")
    ap.add_argument("--json", action="store_true", help="query: JSON-lines output")
    ap.add_argument("--explain", action="store_true", help="query: print the physical plan instead of rows")
    ap.add_argument("--ids", help="index-delete: comma-separated vector ids, or @file with one id per line")
    ap.add_argument("--id-col", default="vec_id", help="index-delete: id column name")
    ap.add_argument("--skew-threshold", type=float, default=4.0, help="index-recluster: rebuild when max-cell/mean-cell exceeds this")
    ap.add_argument("--force", action="store_true", help="index-recluster: rebuild regardless of skew")
    ap.add_argument("--k", type=int, default=10, help="index-hubness: neighbors per query")
    ap.add_argument("--nprobe", default="auto", help="index-hubness: cells probed per query (int or 'auto')")
    ap.add_argument("--max-queries", type=int, default=100_000, help="index-hubness: query-side sample bound (0 = all vectors)")
    args = ap.parse_args(argv)

    import batch_process_spark.plans.builtin_ops  # noqa: F401  (registers built-ins)
    from batch_process_spark.plans.registry import REGISTRY

    if args.plugins:
        load_plugins(args.plugins)

    if args.command == "ops":
        for op in REGISTRY.all():
            print(f"{op.phase:>8}  prio={op.priority:<3} {op.name}  {op.metadata or ''}")
        return 0

    if args.command == "query":
        import __spark_entry__ as entrymod
        from batch_process_spark.session import get_spark

        qs = entrymod.queries()
        if not args.root:
            ap.error(
                "query needs a <name>; available: " + " ".join(sorted(qs)[:8]) + " ..."
            )
        if args.root not in qs:
            import difflib

            close = difflib.get_close_matches(args.root, qs, n=3)
            ap.error(f"unknown query {args.root!r}" + (f"; did you mean {close}?" if close else ""))
        spark = get_spark("batch_process_spark.cli")
        df = qs[args.root](spark, args.sf_dir)
        if args.explain:
            df.explain("formatted")
            return 0
        rows = df.limit(args.limit).collect()
        if args.json:
            for r in rows:
                print(json.dumps(r.asDict(recursive=True), default=str))
        else:
            widths = {c: max(len(c), *(len(str(r[c])) for r in rows)) if rows else len(c) for c in df.columns}
            print("  ".join(c.ljust(widths[c]) for c in df.columns))
            for r in rows:
                print("  ".join(str(r[c]).ljust(widths[c]) for c in df.columns))
        print(f"({len(rows)} row{'s' if len(rows) != 1 else ''})", file=sys.stderr)
        return 0

    if args.command == "template":
        if not args.root:
            ap.error("template needs the output <path> (.yaml/.yml/.json)")
        from batch_process_spark.plans.config_io import format_config_yaml, generate_template

        tpl = generate_template(args.root)
        print(format_config_yaml(tpl), end="")
        return 0

    if args.command == "index-hubness":
        # serving-path hubness audit: ONE histogram row per k-occurrence
        # (at most k+1 rows) printed as JSON lines + a summary line
        if not args.root:
            ap.error("index-hubness needs the index <dir>")
        from batch_process_spark.operators.similarity import stored_index_hubness
        from batch_process_spark.session import get_spark

        spark = get_spark("batch_process_spark.cli")
        nprobe = args.nprobe if args.nprobe == "auto" else int(args.nprobe)
        hist = stored_index_hubness(
            spark, args.root, k=args.k, nprobe=nprobe,
            max_queries=args.max_queries,
        ).orderBy("k_occurrence").collect()
        for r in hist:
            print(json.dumps({"k_occurrence": r["k_occurrence"],
                              "n_vectors": r["n_vectors"]}))
        total = sum(r["n_vectors"] for r in hist)
        antihubs = sum(r["n_vectors"] for r in hist if r["k_occurrence"] == 0)
        # when max_queries sampling is active, unsampled query mass
        # counts reachable vectors as k_occurrence 0 — qualify the
        # antihub count so it can be interpreted (the estimator
        # docstring documents the bias; the output must too)
        sampled = bool(args.max_queries) and total > args.max_queries
        summary = {"n_vectors": total, "antihubs": antihubs, "k": args.k,
                   "sampled": sampled}
        if sampled:
            summary["max_queries"] = args.max_queries
        print(json.dumps({"summary": summary}), file=sys.stderr)
        return 0

    if args.command in ("index-compact", "index-delete", "index-recluster"):
        # stored-index lifecycle from the command line: the takedown /
        # maintenance entry points an operator runs without writing a
        # driver script. All three print ONE JSON report line.
        if not args.root:
            ap.error(f"{args.command} needs the index <dir>")
        from batch_process_spark.operators import similarity
        from batch_process_spark.session import get_spark

        spark = get_spark("batch_process_spark.cli")
        if args.command == "index-compact":
            rep = similarity.compact_index(spark, args.root, target_mb=args.target_mb)
        elif args.command == "index-delete":
            if not args.ids:
                ap.error("index-delete needs --ids 1,2,3 or --ids @file")
            if args.ids.startswith("@"):
                with open(args.ids[1:]) as f:
                    ids = [int(line) for line in f if line.strip()]
            else:
                ids = [int(x) for x in args.ids.split(",") if x.strip()]
            rep = similarity.ivf_delete(spark, args.root, ids, id_col=args.id_col)
        else:
            rep = similarity.ivf_recluster(
                spark, args.root,
                skew_threshold=args.skew_threshold, force=args.force,
            )
        print(json.dumps(rep, sort_keys=True))
        return 0

    if args.command == "compact":
        if not args.root:
            ap.error("compact needs the parquet <dir>")
        from batch_process_spark.session import get_spark
        from batch_process_spark.sinks.compact import compact_parquet

        spark = get_spark("batch_process_spark.cli")
        stats = compact_parquet(
            spark,
            args.root,
            target_mb=args.target_mb,
            sort_by=[c.strip() for c in args.sort_by.split(",") if c.strip()]
            if args.sort_by
            else None,
        )
        print(json.dumps(stats))
        return 0

    if not args.root or not args.config:
        ap.error("run/simulate need <root> and --config")

    from batch_process_spark.plans.compiler import Pipeline, load_config
    from batch_process_spark.session import get_spark
    from batch_process_spark.sources.filetree import file_tree_df, read_tree_texts

    spark = get_spark("batch_process_spark.cli")
    tree = (
        read_tree_texts(spark, args.root)
        if args.with_text
        else file_tree_df(spark, args.root)
    )
    pipeline = Pipeline(load_config(args.config), REGISTRY)

    if args.command == "simulate":
        print(json.dumps(pipeline.simulate(tree), indent=2, default=str))
        return 0

    result = pipeline.run(tree)
    # result.results is driver-local with ONE ROW PER PIPELINE STAGE
    # (compiler.py builds it from the stage log, not per input file),
    # so it is small by construction. The truncation below is cheap
    # defense-in-depth for configs with very many stages, not an OOM
    # guard; --history persists the full log either way.
    shown = 0
    for r in result.results.toLocalIterator():
        if shown < MAX_CLI_ROWS:
            line = f"[{r['step']}] {r['phase']:<12} {r['processor']:<20} {r['status']}"
            if r["error"]:
                line += f"  {r['error']}"
            print(line)
        elif shown == MAX_CLI_ROWS:
            print(f"... detail output truncated at {MAX_CLI_ROWS} rows "
                  "(pass --history <dir> for the full log)")
            break
        shown += 1
    from pyspark.sql import functions as F

    counts = {
        r["status"]: r["n"]
        for r in result.results.groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    print("status summary: " + json.dumps(counts, sort_keys=True))
    if args.history:
        result.write_history(args.history)
    return 1 if counts.get("failed", 0) else 0


if __name__ == "__main__":
    sys.exit(main())
