"""Property tests for the audit math behind q229 / q233 / q237
(VERDICT r9 item 9, the merge_index_stats style): for ANY corpus the
results must be independent of row order and partitioning (Spark and
the DuckDB oracle see different physical orders, so any order
sensitivity is a latent hash-mismatch), and the closed-form claims —
restrictive-wins dominance, sampling mass conservation — must hold.

Each hypothesis example writes the SAME document multiset in two
layouts (shuffled row order, different partition counts) and runs the
real catalog queries on both."""

from __future__ import annotations

import random
import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

WORDS = ["alpha", "beta", "gamma", "delta", "epsi", "zeta", "eta", "theta"]

_doc = st.lists(st.sampled_from(WORDS), min_size=3, max_size=12)
_corpus = st.lists(_doc, min_size=8, max_size=24)


def _two_layouts(spark, docs_words, seed):
    """Write (doc_id, text, source) in natural order/4 partitions and
    shuffled order/9 partitions; yield both sf-dir paths."""
    rows = [
        (i, " ".join(w), f"src{i % 3}") for i, w in enumerate(docs_words)
    ]
    shuffled = list(rows)
    random.Random(seed).shuffle(shuffled)
    dirs = []
    for layout, parts in ((rows, 4), (shuffled, 9)):
        d = tempfile.mkdtemp(prefix="auditprop_")
        (
            spark.createDataFrame(layout, "doc_id long, text string, source string")
            .repartition(parts)
            .write.mode("overwrite")
            .parquet(d + "/documents.parquet")
        )
        dirs.append(d)
    return dirs


def _rowset(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs_words=_corpus, seed=st.integers(0, 2**20))
def test_q229_zipf_slope_invariant_under_doc_shuffling(spark, docs_words, seed):
    """The per-source Zipf slope is a function of the term-frequency
    MULTISET: shuffling document order and changing partitioning must
    not move it (ranks tie-break on the term, so the fitted top-200
    set is unique; the 5-number OLS reduce is exact sums)."""
    from batch_process_spark.queries_ext16 import q229_zipf_slope

    a, b = _two_layouts(spark, docs_words, seed)
    try:
        assert _rowset(q229_zipf_slope(spark, a)) == _rowset(q229_zipf_slope(spark, b))
    finally:
        shutil.rmtree(a), shutil.rmtree(b)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs_words=_corpus, seed=st.integers(0, 2**20))
def test_q233_restrictive_wins_is_order_free(spark, docs_words, seed):
    """License propagation: identical matrix under re-layout (max is
    commutative/associative — no order can launder a restricted tier
    out), and in every cell the effective tier DOMINATES the survivor
    tier (propagation never relaxes terms)."""
    from batch_process_spark.queries_ext16 import q233_license_propagation

    a, b = _two_layouts(spark, docs_words, seed)
    try:
        ra = q233_license_propagation(spark, a)
        assert _rowset(ra) == _rowset(q233_license_propagation(spark, b))
        for r in ra.collect():
            assert r["effective_tier"] >= r["survivor_tier"]
    finally:
        shutil.rmtree(a), shutil.rmtree(b)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs_words=_corpus, seed=st.integers(0, 2**20))
def test_q237_weights_conserve_sampling_mass(spark, docs_words, seed):
    """Soft dedup: every near-dup cluster's weights sum to exactly 1
    (1/cluster_size x cluster_size), so the corpus-wide effective mass
    equals the number of DISTINCT content units: singletons + one per
    cluster. Also order-free under re-layout."""
    from batch_process_spark.queries_ext import _near_dup_corpus
    from batch_process_spark.queries_ext3 import q79_dedup_clusters
    from batch_process_spark.queries_ext16 import q237_soft_dedup_weights

    a, b = _two_layouts(spark, docs_words, seed)
    try:
        ra = q237_soft_dedup_weights(spark, a)
        assert _rowset(ra) == _rowset(q237_soft_dedup_weights(spark, b))

        corpus_n = _near_dup_corpus(spark, a).count()
        cl = q79_dedup_clusters(spark, a)
        n_components = cl.select("component").distinct().count()
        clustered_docs = cl.count()
        expected_mass = (corpus_n - clustered_docs) + n_components
        got = sum(r["effective_docs"] for r in ra.collect())
        # per-source 6dp rounding -> tolerance scales with source count
        assert abs(got - expected_mass) < 1e-5 * max(ra.count(), 1) + 1e-9
        # n_docs conserves the raw corpus
        assert sum(r["n_docs"] for r in ra.collect()) == corpus_n
    finally:
        shutil.rmtree(a), shutil.rmtree(b)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs_words=_corpus, seed=st.integers(0, 2**20))
def test_q246_jsd_nonnegative_and_order_free(spark, docs_words, seed):
    """Token-distribution shift: JSD is >= 0 and <= 1 bit for every
    source, identical under corpus re-layout, and EXACTLY 0 whenever a
    source IS the whole corpus (all docs forced to one source)."""
    from batch_process_spark.queries_ext17 import q246_source_token_jsd

    a, b = _two_layouts(spark, docs_words, seed)
    try:
        ra = q246_source_token_jsd(spark, a).collect()
        assert sorted(tuple(str(v) for v in r) for r in ra) == _rowset(
            q246_source_token_jsd(spark, b)
        )
        for r in ra:
            assert -1e-9 <= r["jsd_bits"] <= 1.0 + 1e-9
    finally:
        shutil.rmtree(a), shutil.rmtree(b)

    # degenerate case: one source == corpus -> exactly 0
    d = tempfile.mkdtemp(prefix="auditprop_")
    try:
        rows = [(i, " ".join(w) or "pad", "src0") for i, w in enumerate(docs_words)]
        (
            spark.createDataFrame(rows, "doc_id long, text string, source string")
            .write.mode("overwrite")
            .parquet(d + "/documents.parquet")
        )
        out = q246_source_token_jsd(spark, d).collect()
        assert len(out) == 1 and out[0]["jsd_bits"] == 0.0
    finally:
        shutil.rmtree(d)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vecs=st.lists(
        st.lists(st.floats(-8, 8, allow_nan=False, width=32), min_size=4, max_size=4),
        min_size=2, max_size=20,
    ),
    seed=st.integers(0, 2**20),
)
def test_q243_q244_layout_invariant(spark, vecs, seed):
    """Dimension variance and anisotropy are multiset statistics:
    permuting/partitioning the embeddings table differently never
    moves them; variances are >= 0 and anisotropy sits in [0, 1]
    (Cauchy-Schwarz: ||mean|| <= mean ||.||)."""
    from batch_process_spark.queries_ext17 import q243_dim_variance, q244_anisotropy

    rows = [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)]
    shuffled = list(rows)
    random.Random(seed).shuffle(shuffled)
    dirs = []
    for layout, parts in ((rows, 3), (shuffled, 7)):
        d = tempfile.mkdtemp(prefix="auditprop_")
        (
            spark.createDataFrame(
                layout, "vec_id long, embedding array<float>, label int"
            )
            .repartition(parts)
            .write.mode("overwrite")
            .parquet(d + "/embeddings.parquet")
        )
        dirs.append(d)
    a, b = dirs
    try:
        va = q243_dim_variance(spark, a).collect()[0]
        vb = q243_dim_variance(spark, b).collect()[0]
        assert tuple(va) == tuple(vb)
        assert va["min_variance"] >= 0.0

        aa = q244_anisotropy(spark, a).collect()[0]
        ab = q244_anisotropy(spark, b).collect()[0]
        assert tuple(aa) == tuple(ab)
        if aa["anisotropy"] is not None:
            assert -1e-6 <= aa["anisotropy"] <= 1.0 + 1e-6
    finally:
        shutil.rmtree(a), shutil.rmtree(b)


_long_doc = st.lists(st.sampled_from(WORDS), min_size=8, max_size=14)
_span_corpus = st.lists(_long_doc, min_size=6, max_size=18)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs_words=_span_corpus, seed=st.integers(0, 2**20))
def test_q247_containment_bounds_and_order_free(spark, docs_words, seed):
    """Span containment: identical under corpus re-layout; every
    emitted row satisfies 0.9 <= containment <= 1.0, contained !=
    container, shared <= total spans; and an EXACT duplicate pair is
    always reported contained in BOTH directions at exactly 1.0."""
    from batch_process_spark.queries_ext17 import q247_span_containment

    # plant one exact duplicate of the first doc so at least one
    # containment pair must exist
    docs_words = list(docs_words) + [docs_words[0]]
    a, b = _two_layouts(spark, docs_words, seed)
    try:
        ra = q247_span_containment(spark, a).collect()
        assert sorted(tuple(str(v) for v in r) for r in ra) == _rowset(
            q247_span_containment(spark, b)
        )
        for r in ra:
            assert r["contained"] != r["container"]
            assert 0.9 <= r["containment"] <= 1.0
            assert r["shared_spans"] <= r["n_spans"]
        twin_rows = {
            (r["contained"], r["container"]): r["containment"]
            for r in ra
        }
        dup_id = len(docs_words) - 1

        # python twin of the span machinery: the planted pair is only
        # REQUIRED in the output when doc 0 clears the MIN_SPANS floor
        # and none of its spans exceed the boilerplate df cap
        def spans_of(words):
            return {tuple(words[i : i + 8]) for i in range(len(words) - 7)}

        s0 = spans_of(docs_words[0])
        df = {
            sp: sum(1 for w in docs_words if sp in spans_of(w)) for sp in s0
        }
        if len(s0) >= 5 and all(2 <= v <= 10 for v in df.values()):
            assert twin_rows.get((0, dup_id)) == 1.0
            assert twin_rows.get((dup_id, 0)) == 1.0
    finally:
        shutil.rmtree(a), shutil.rmtree(b)
