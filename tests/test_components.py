"""Connected-components dedup clustering (operators/components.py)."""

from __future__ import annotations

import pytest

from chatdata_spark.operators.components import (
    canonical_assignment,
    connected_components,
)


def test_chain_and_islands_collapse_to_min_id(spark):
    # chain 1-2-3-4-5 (A~C never emitted), island {10, 11}, singleton 99
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], "i long, j long"
    )
    labels = {r.v: r.c for r in connected_components(pairs).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}


def test_canonical_assignment_includes_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in [1, 2, 3, 10, 11, 99]], "doc_id long")
    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "i long, j long")
    rows = {r.doc_id: r for r in canonical_assignment(docs, "doc_id", pairs).collect()}
    assert rows[99].canonical_id == 99 and rows[99].keep
    assert rows[3].canonical_id == 1 and not rows[3].keep
    assert rows[1].keep and rows[10].keep and not rows[11].keep
    kept = sorted(i for i, r in rows.items() if r.keep)
    assert kept == [1, 10, 99]


def test_nonconvergence_raises(spark):
    # a 6-chain needs >1 round; max_iter=1 must refuse, not return garbage
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)], "i long, j long"
    )
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(pairs, max_iter=1)


def test_edge_direction_irrelevant(spark):
    a = spark.createDataFrame([(7, 3), (3, 9)], "i long, j long")
    b = spark.createDataFrame([(3, 7), (9, 3)], "i long, j long")
    la = sorted(map(tuple, connected_components(a).collect()))
    lb = sorted(map(tuple, connected_components(b).collect()))
    assert la == lb == [(3, 3), (7, 3), (9, 3)]


def test_star_components_match_minlabel_on_fixture_pairs(spark):
    """Two-phase star contraction returns the identical (v, component-min)
    labeling as min-label propagation on the real near-dup pair graph."""
    from chatdata_spark.operators.components import (
        connected_components,
        connected_components_star,
    )
    from chatdata_spark.operators.dedup import jaccard_similarity_join
    from tests.conftest import SF_ORACLE

    d = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    pairs = jaccard_similarity_join(d, "doc_id", "text", k=3, threshold=0.4)
    a = {(r.v, r.c) for r in connected_components(pairs).collect()}
    b = {(r.v, r.c) for r in connected_components_star(pairs).collect()}
    assert a == b and a


def test_star_components_converge_on_long_chain(spark):
    """The case that motivates the algorithm: a 150-node path graph has
    diameter 149, far past min-label's default round budget (it raises),
    while star contraction converges in O(log n) rounds to the same
    everyone-labeled-0 answer."""
    import pytest

    from chatdata_spark.operators.components import (
        connected_components,
        connected_components_star,
    )

    n = 150
    pairs = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "i long, j long")
    got = {(r.v, r.c) for r in connected_components_star(pairs, max_iter=25).collect()}
    assert got == {(v, 0) for v in range(n)}
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(pairs, max_iter=10)
