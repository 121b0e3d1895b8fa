"""Document chunking + sequence packing — the two reshaping ops every
LLM training pipeline runs between curation and tokenization.

- ``chunk_documents``: split each document into fixed-size token
  windows with overlap (stride = chunk - overlap). Pure JVM-side:
  tokens array -> ``sequence`` of window starts -> ``posexplode`` ->
  ``slice``. One output row per chunk, no Python.
- ``pack_documents``: assign documents to ~budget-token packs. The
  deterministic formulation (ordered cumulative token sum, pack id =
  floor((cumsum - tokens) / budget)) is reproducible across engines
  and runs — unlike greedy first-fit, which depends on scan order.
  One window over the ordering key; at 100 TB the ordering key is
  normally (shard_key, doc_id) so the window parallelizes per shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from batch_process_spark.operators.dedup import tokens_col


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """One row per (doc, chunk): (id, chunk_idx, n_chunk_tokens, chunk_text).

    Windows start every ``chunk_tokens - overlap`` tokens, but only
    while the window covers NEW tokens (``start < n - overlap``) — a
    tail window containing nothing beyond the previous chunk's overlap
    is pure duplication and is not emitted. The last emitted window may
    be short; empty docs produce no rows.

    Implementation is an Arrow ``mapInPandas`` kernel (1 -> N rows):
    the pure-expression form (sequence + posexplode + slice over the
    token array) runs through interpreted higher-order functions and
    measured 3.3x SLOWER at 336k docs (29s vs 8.8s) — the repo-wide
    lesson that hot array lambdas belong in Arrow kernels. Tokenizer
    matches ``tokens_col`` exactly (split ``[^0-9a-zA-Z]+`` over
    lowercased trimmed text, empties dropped), which the q76 oracle
    pins cross-engine.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    id_type = dict(df.dtypes)[id_col]

    def kernel(it):
        import re

        import pandas as pd

        tok_re = re.compile(r"[^0-9a-zA-Z]+")
        for pdf in it:
            ids, idxs, ns, texts = [], [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks = [t for t in tok_re.split((text or "").strip().lower()) if t]
                n = len(toks)
                if n == 0:
                    continue
                s, i = 0, 0
                while s == 0 or s < n - overlap:
                    ch = toks[s : s + chunk_tokens]
                    ids.append(did)
                    idxs.append(i)
                    ns.append(len(ch))
                    texts.append(" ".join(ch))
                    i += 1
                    s += stride
                    if s >= n - overlap:
                        break
            yield pd.DataFrame(
                {id_col: ids, "chunk_idx": idxs, "n_chunk_tokens": ns, "chunk_text": texts}
            )

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        kernel,
        schema=f"{id_col} {id_type}, chunk_idx int, n_chunk_tokens int, chunk_text string",
    )


# Rows above which an unsharded (single-task global window) pack is
# refused; module-level so tests can exercise both paths cheaply.
GLOBAL_PACK_MAX_ROWS = 1_000_000


def pack_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget_tokens: int = 512,
    order_col: str | None = None,
    shard_col: str | None = None,
    allow_global: bool = False,
) -> DataFrame:
    """Assign each doc a ``pack_id`` so consecutive docs (in
    ``order_col`` order, default the id) fill ~``budget_tokens`` packs:
    pack_id = floor((cumsum(tokens) - tokens) / budget) — i.e. a doc
    joins the pack its FIRST token lands in. Oversized docs occupy
    their own pack(s) without blocking the stream. Deterministic given
    the ordering; chunk first if hard caps matter.

    Scale: without ``shard_col`` the cumulative sum is one GLOBAL
    window (single task — fine up to ~1M rows, wrong at 100 TB) and the
    output is (id, n_tokens, pack_id). Past ``GLOBAL_PACK_MAX_ROWS``
    the unsharded form RAISES unless ``allow_global=True`` (explicit
    opt-in, still warns) — a silent single-task window over a 100 TB
    input is the one scale-killer this module refuses by default. With
    ``shard_col`` packing runs independently per shard —
    embarrassingly parallel, still deterministic — and the output
    carries a ``pack_shard`` column: the globally-unique pack identity
    is the PAIR (pack_shard, pack_id), with pack_id shard-local. (A
    single hashed id would collide across shards at birthday-bound
    rates.) A derived shard (e.g. a hash-bucket of ``order_col``)
    changes pack composition at shard boundaries, so sharding is the
    caller's choice, not silently imposed.
    """
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    order = order_col or id_col
    n = F.size(tokens_col(text_col))
    extra = []
    if order_col and order_col != id_col:
        extra.append(F.col(order_col))
    if shard_col:
        extra.append(F.col(shard_col).alias("pack_shard"))
    base = df.select(F.col(id_col), n.alias("n_tokens"), *extra)
    if shard_col:
        w = Window.partitionBy("pack_shard").orderBy(order).rowsBetween(
            Window.unboundedPreceding, 0
        )
        out_cols = [id_col, "n_tokens", "pack_shard"]
    else:
        # limit-probe, not count(): one cheap job that stops at the bound
        if base.limit(GLOBAL_PACK_MAX_ROWS + 1).count() > GLOBAL_PACK_MAX_ROWS:
            if not allow_global:
                raise ValueError(
                    f"pack_documents without shard_col runs one GLOBAL "
                    f"cumulative-sum window (single task) and the input exceeds "
                    f"{GLOBAL_PACK_MAX_ROWS} rows. Pass shard_col for per-shard "
                    "parallel packing (pack identity becomes the pair "
                    "(pack_shard, pack_id)), or allow_global=True to accept the "
                    "single-task window explicitly."
                )
            import warnings

            warnings.warn(
                "pack_documents(allow_global=True) running one GLOBAL "
                "cumulative-sum window (single task) over "
                f">{GLOBAL_PACK_MAX_ROWS} rows; pass shard_col for per-shard "
                "parallel packing",
                stacklevel=2,
            )
        w = Window.orderBy(order).rowsBetween(Window.unboundedPreceding, 0)
        out_cols = [id_col, "n_tokens"]
    pack = F.floor((F.col("__cum") - F.col("n_tokens")) / budget_tokens)
    return (
        base.withColumn("__cum", F.sum("n_tokens").over(w))
        .select(*out_cols, pack.alias("pack_id"))
    )
