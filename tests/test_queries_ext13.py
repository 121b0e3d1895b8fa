"""Tests for query-catalog part 14: deterministic synchronous label
propagation (q201)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _py_lpa(sym_edges, rounds):
    """Reference sync LPA on a symmetric edge list: every node adopts
    its neighbours' most frequent label, ties to the smallest."""
    nodes = sorted({u for u, _ in sym_edges})
    lab = {n: n for n in nodes}
    for _ in range(rounds):
        nxt = {}
        for n in nodes:
            freq = {}
            for u, v in sym_edges:
                if u == n:
                    freq[lab[v]] = freq.get(lab[v], 0) + 1
            best = max(freq.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[n] = best[0]
        lab = nxt
    return lab


def test_lpa_barbell_splits_where_cc_does_not(spark):
    """Two triangles joined by one bridge edge: connected components
    reports ONE label, frequency-LPA keeps each triangle its own
    community — the semantic reason this operator isn't a q79 twin."""
    from batch_process_spark.operators.graph import label_propagation

    canon = [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3)]
    sym = sorted(set(canon) | {(v, u) for u, v in canon})
    sdf = spark.createDataFrame(sym, "u long, v long")
    got = {r.node: r.community for r in label_propagation(sdf, rounds=4).collect()}
    assert got == _py_lpa(sym, 4)
    # the bridge does not merge the triangles
    assert len({got[0], got[1]} | {got[4], got[5]}) == 2
    assert {got[0], got[1]} != {got[4], got[5]}


@given(
    data=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=1,
        max_size=16,
    )
)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_lpa_matches_python_reference(spark, data):
    """On random small graphs (symmetrized, dedup'd, self-loops
    dropped), 3 distributed supersteps equal the dict-based LPA
    exactly — including the min tie-break."""
    from batch_process_spark.operators.graph import label_propagation

    canon = {(u, v) for u, v in data if u != v}
    if not canon:
        return
    sym = sorted(canon | {(v, u) for u, v in canon})
    sdf = spark.createDataFrame(sym, "u long, v long")
    got = {r.node: r.community for r in label_propagation(sdf, rounds=3).collect()}
    assert got == _py_lpa(sym, 3)
