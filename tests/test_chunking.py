"""Chunking + packing operator semantics."""

import pytest
from pyspark.sql import functions as F

from batch_process_spark.operators.chunking import chunk_documents, pack_documents


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),  # 10 tokens
            (2, "only three tokens"),
            (3, ""),  # empty -> no chunks
        ],
        "doc_id long, text string",
    )


def test_chunk_windows_and_overlap(docs):
    out = chunk_documents(docs, chunk_tokens=4, overlap=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1 (10 tokens): starts run while s < n - overlap = 8 -> 0,2,4,6;
    # the would-be s=8 window (t8 t9) is wholly inside chunk 3's tail
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    assert [r["chunk_idx"] for r in c1] == [0, 1, 2, 3]
    assert c1[0]["chunk_text"] == "t0 t1 t2 t3"
    assert c1[1]["chunk_text"] == "t2 t3 t4 t5"  # 2-token overlap
    assert c1[-1]["chunk_text"] == "t6 t7 t8 t9" and c1[-1]["n_chunk_tokens"] == 4
    # every token covered
    covered = set()
    for r in c1:
        covered.update(r["chunk_text"].split())
    assert covered == {f"t{i}" for i in range(10)}
    # doc 2: one short chunk; doc 3: none
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_text"] == "only three tokens"
    assert 3 not in by_doc


def test_chunk_validates_overlap(docs):
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_pack_sharded(spark):
    docs = spark.createDataFrame(
        [(i, "w " * 300, i % 2) for i in range(8)], "doc_id long, text string, shard long"
    )
    out = pack_documents(docs, budget_tokens=512, shard_col="shard").collect()
    # 4 docs of 300 tokens per shard -> packs of 2 docs within each
    # shard; global pack identity is the (pack_shard, pack_id) pair
    packs = {}
    for r in out:
        packs.setdefault((r["pack_shard"], r["pack_id"]), []).append(r["doc_id"])
    assert len(out) == 8
    assert sorted(len(v) for v in packs.values()) == [2, 2, 2, 2]
    # packs never mix shards
    for (shard, _), ids in packs.items():
        assert {i % 2 for i in ids} == {shard}


def test_pack_respects_order_col(spark):
    docs = spark.createDataFrame(
        [(1, "w " * 300, 3), (2, "w " * 300, 1), (3, "w " * 300, 2)],
        "doc_id long, text string, prio long",
    )
    out = {r["doc_id"]: r["pack_id"] for r in
           pack_documents(docs, budget_tokens=512, order_col="prio").collect()}
    # prio order 2,3,1: first two packed together, last spills
    assert out == {2: 0, 3: 0, 1: 1}


def test_pack_assignment(spark):
    docs = spark.createDataFrame(
        [(1, "a " * 300), (2, "b " * 300), (3, "c " * 300), (4, "d " * 600)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["pack_id"] for r in pack_documents(docs, budget_tokens=512).collect()}
    # cum-n: doc1 starts at 0 -> pack 0; doc2 at 300 -> pack 0;
    # doc3 at 600 -> pack 1; doc4 at 900 -> pack 1 (oversized spills)
    assert out == {1: 0, 2: 0, 3: 1, 4: 1}


def test_pack_global_guard_raises_and_opt_in(spark, monkeypatch):
    """Past GLOBAL_PACK_MAX_ROWS an unsharded pack must raise (the
    single-task global window is the scale-killer), allow_global=True
    must warn-and-run, and a sharded call needs no opt-in."""
    import warnings

    import pytest as _pytest

    from batch_process_spark.operators import chunking

    monkeypatch.setattr(chunking, "GLOBAL_PACK_MAX_ROWS", 10)
    docs = spark.range(25).selectExpr(
        "id AS doc_id", "'one two three' AS text", "CAST(id % 3 AS INT) AS shard"
    )
    with _pytest.raises(ValueError, match="GLOBAL"):
        pack_documents(docs, budget_tokens=8)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        rows = pack_documents(docs, budget_tokens=8, allow_global=True).collect()
    assert len(rows) == 25 and any("GLOBAL" in str(x.message) for x in w)
    sharded = pack_documents(docs, budget_tokens=8, shard_col="shard").collect()
    assert len(sharded) == 25  # parallel path: no probe, no opt-in needed


# --- property-based invariants (hypothesis) ---------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_words = st.lists(
    st.text(alphabet="abcdefg h.019", min_size=0, max_size=6), min_size=0, max_size=40
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs_words=st.lists(_words, min_size=1, max_size=5), chunk=st.integers(3, 9), overlap=st.integers(0, 2))
def test_chunk_documents_reconstruction_property(spark, docs_words, chunk, overlap):
    """For ANY text: dropping each chunk's leading `overlap` tokens
    (except the first) and concatenating reconstructs the exact token
    stream — no token lost, none duplicated, chunk sizes within
    bounds, indices dense from 0."""
    import re

    from batch_process_spark.operators.chunking import chunk_documents

    rows = [(i, " ".join(w)) for i, w in enumerate(docs_words)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect()

    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, words in enumerate(rows):
        toks = [t for t in re.split(r"[^0-9a-zA-Z]+", rows[i][1].lower().strip()) if t]
        chunks = sorted(by_doc.get(i, []), key=lambda r: r["chunk_idx"])
        assert [c["chunk_idx"] for c in chunks] == list(range(len(chunks)))
        recon = []
        for j, c in enumerate(chunks):
            ct = c["chunk_text"].split(" ")
            assert 1 <= c["n_chunk_tokens"] <= chunk and len(ct) == c["n_chunk_tokens"]
            recon.extend(ct if j == 0 else ct[overlap:])
        assert recon == toks, (toks, [c["chunk_text"] for c in chunks])


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n_toks=st.lists(st.integers(0, 30), min_size=1, max_size=30),
    budget=st.integers(4, 40),
)
def test_pack_documents_budget_property(spark, n_toks, budget):
    """For ANY doc stream: packs are contiguous in order, pack_ids are
    non-decreasing, and every pack's token sum stays under budget +
    (its largest doc) — i.e. only oversized docs overflow a pack."""
    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(n_toks)]
    from batch_process_spark.operators.chunking import pack_documents

    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = sorted(
        pack_documents(df, budget_tokens=budget).collect(), key=lambda r: r["doc_id"]
    )
    assert [r["doc_id"] for r in out] == list(range(len(n_toks)))
    packs = {}
    last_pack = 0
    for r in out:
        assert r["pack_id"] >= last_pack, "pack_id must be non-decreasing in order"
        last_pack = r["pack_id"]
        packs.setdefault(r["pack_id"], []).append(r["n_tokens"])
    for sizes in packs.values():
        assert sum(sizes) < budget + max(sizes)
