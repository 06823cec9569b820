"""Retrieval metrics (index/eval.py)."""
import pytest

from multimodal_audio_search_tpu.index.eval import (
    compare_rankings, mrr, overlap_at_k, rank_agreement, recall_at_k)


def test_recall_at_k():
    assert recall_at_k([1, 2, 3, 4], [2, 9], 3) == 0.5
    assert recall_at_k([1, 2], [1, 2], 2) == 1.0
    assert recall_at_k([1, 2], [], 2) == 0.0
    assert recall_at_k([], [1], 5) == 0.0


def test_mrr():
    assert mrr([5, 7, 2], [2]) == pytest.approx(1 / 3)
    assert mrr([2, 7], [2, 7]) == 1.0
    assert mrr([5, 7], [9]) == 0.0


def test_overlap_and_agreement():
    assert overlap_at_k([1, 2, 3], [3, 2, 1], 3) == 1.0   # set equal
    assert rank_agreement([1, 2, 3], [3, 2, 1], 3) == pytest.approx(1 / 3)
    assert overlap_at_k([1, 2], [3, 4], 2) == 0.0
    assert overlap_at_k([], [], 10) == 1.0
    assert rank_agreement([1], [1], 0) == 1.0
    # unequal lengths: missing positions count as disagreement
    assert rank_agreement([1, 2, 3], [1], 3) == pytest.approx(1 / 3)


def test_compare_rankings_shape():
    out = compare_rankings([1, 2, 3], [1, 3, 2], ks=(1, 3))
    assert out == {"overlap@1": 1.0, "overlap@3": 1.0,
                   "exact@1": 1.0, "exact@3": pytest.approx(1 / 3)}
