"""Coarse regression pins on the ANN recall-vs-cost curves (RECALL.md).

The sweep is deterministic (fixed hash-embed queries, fixed seeds, exact
arithmetic), so at sf0.01 the measured recalls are reproducible to the
digit; pins sit slightly below the measured values to absorb only future
fixture regeneration. A failure here means an ANN operator's quality
changed — regenerate RECALL.md (tools/recall_curves.py) and re-pin
deliberately."""

from __future__ import annotations

import importlib.util
import os
import sys

from tests.conftest import SF_ORACLE

_spec = importlib.util.spec_from_file_location(
    "recall_curves",
    os.path.join(os.path.dirname(__file__), "..", "tools", "recall_curves.py"),
)
rc = importlib.util.module_from_spec(_spec)
sys.modules["recall_curves"] = rc
_spec.loader.exec_module(rc)


def _by_param(rows):
    return {r["param"]: r["recall@10"] for r in rows}


def test_ivf_curve_monotone_with_floor(spark):
    qvecs = rc._queries(8)
    got = _by_param(rc.sweep_ivf(spark, SF_ORACLE, qvecs))
    chain = [got[f"n_probe={n}/8"] for n in (1, 2, 4, 8)]
    assert chain == sorted(chain), f"recall not monotone in n_probe: {chain}"
    assert got["n_probe=4/8"] >= 0.6  # measured 0.688
    assert got["n_probe=8/8"] == 1.0  # full probe IS exact


def test_pq_refine_curve_with_floor(spark):
    qvecs = rc._queries(8)
    got = _by_param(rc.sweep_pq(spark, SF_ORACLE, qvecs))
    chain = [got[f"m=8,refine={r}"] for r in (1, 2, 4, 8)]
    assert chain == sorted(chain), f"recall not monotone in refine: {chain}"
    assert got["m=8,refine=4"] >= 0.85  # measured 0.925
    assert got["m=8,refine=8"] >= 0.95  # measured 0.988


def test_binary_rerank_and_matryoshka_floors(spark):
    qvecs = rc._queries(8)
    got_b = _by_param(rc.sweep_binary(spark, SF_ORACLE, qvecs))
    chain = [got_b[f"rerank={r}"] for r in (10, 20, 40, 80)]
    assert chain == sorted(chain), f"recall not monotone in rerank depth: {chain}"
    assert got_b["rerank=80"] >= 0.65  # measured 0.725
    got_m = _by_param(rc.sweep_matryoshka(spark, SF_ORACLE, qvecs))
    assert got_m["dims=64/64"] == 1.0  # full prefix IS exact
    assert got_m["dims=32/64"] >= got_m["dims=8/64"]


def test_pca_curve_monotone_and_flat_spectrum_floor(spark):
    """PCA recall must be monotone in projection rank, and on the
    i.i.d.-random fixture it must TRACK the raw prefix (flat
    eigenspectrum — no variance to concentrate), which doubles as a
    sanity check that the fit did not manufacture structure."""
    qvecs = rc._queries(8)
    got = _by_param(rc.sweep_pca(spark, SF_ORACLE, qvecs))
    chain = [got[f"r={d}/64"] for d in (8, 16, 32)]
    assert chain == sorted(chain), f"recall not monotone in rank: {chain}"
    assert got["r=32/64"] >= 0.1  # ~r/d floor; measured 0.213 at sf0.1
