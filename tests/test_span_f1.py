"""Weak/strong span F1: the 6 documented input/output cases of the
reference metric (/root/reference/elq/vcg_utils/measures.py:19-30) plus the
distributed aggregation path."""

from __future__ import annotations

from blink_spark.operators.eval import _span_lcs_counts, span_f1_weak_strong

REFERENCE_CASES = [
    # (gold, predicted, expected (weak, strong)) — expectations are what the
    # reference CODE returns when executed. NB the reference's committed
    # docstring claims (1, 0) for the two dummy-span cases, but its own
    # function returns (1, 1) (dummy spans (e, 0, 1) satisfy the exact-bounds
    # test too; the doctests are never executed there). We match the
    # executable behavior.
    ([("Q7366", 14, 18), ("Q780394", 19, 35)],
     [("Q7366", 14, 16), ("Q780394", 19, 35)], (2, 1)),
    ([("Q7366", 14, 18), ("Q780394", 19, 35)], [("Q7366", 14, 16)], (1, 0)),
    ([(None, 14, 18), ("Q780394", 19, 35)], [("Q7366", 14, 16)], (0, 0)),
    ([(None, 14, 18), (None,)], [(None,)], (1, 1)),
    ([("Q7366",), ("Q780394",)], [("Q7366", 14, 16)], (1, 1)),
    ([], [("Q7366", 14, 16)], (0, 0)),
]


def test_reference_doctest_cases():
    for gold, pred, expected in REFERENCE_CASES:
        assert _span_lcs_counts(gold, pred) == expected, (gold, pred)


def test_span_f1_distributed_matches_local(spark):
    gold_rows = [
        ("d1", "Q7366", 14, 18), ("d1", "Q780394", 19, 35),
        ("d2", "Q1", 0, 5), ("d2", "Q2", 6, 9),
        ("d3", "Q9", 2, 4),
    ]
    pred_rows = [
        ("d1", "Q7366", 14, 16), ("d1", "Q780394", 19, 35),
        ("d2", "Q1", 0, 5), ("d2", "QX", 6, 9),
        # d3: no predictions at all
    ]
    gold = spark.createDataFrame(gold_rows, "doc_id string, entity string, start int, end int")
    pred = spark.createDataFrame(pred_rows, "doc_id string, entity string, start int, end int")
    row = span_f1_weak_strong(gold, pred).collect()[0]
    # d1: weak 2 / strong 1; d2: weak 1 / strong 1; d3: 0
    assert (row.weak_tp, row.strong_tp) == (3, 2)
    assert (row.n_gold, row.n_pred) == (5, 4)
    prec_w, rec_w = 3 / 4, 3 / 5
    assert abs(row.weak_f1 - 2 * prec_w * rec_w / (prec_w + rec_w)) < 1e-6
