"""Pair-construction parity: the Spark column expressions must reproduce the
reference's quota-rebalancing / candidate / pair semantics
(/root/reference/blink/biencoder/data_process.py:26-97,
/root/reference/blink/crossencoder/train_cross.py:43-60), re-verified here
against a direct python transcription of those rules."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from blink_spark.functions.tokenize import (
    CLS_ID,
    ENT_END_ID,
    ENT_START_ID,
    ENT_TITLE_ID,
    SEP_ID,
    candidate_input_ids,
    context_input_ids,
    pair_input_ids,
    token_ids,
)


def _py_tok(text: str) -> list[int]:
    out = []
    for t in " ".join((text or "").lower().split()).split():
        if t:
            h = hashlib.md5(f"tok:{t}".encode()).hexdigest()[:8]
            out.append(int(h, 16) + 1000)
    return out


def _py_context(left: str, mention: str, right: str, L: int) -> list[int]:
    mt = _py_tok(mention)
    if mt:
        mt = [ENT_START_ID] + mt + [ENT_END_ID]
    lt, rt = _py_tok(left), _py_tok(right)
    lq = (L - len(mt)) // 2 - 1
    rq = L - len(mt) - lq - 2
    if len(lt) <= lq:
        if len(rt) > rq:
            rq += lq - len(lt)
    else:
        if len(rt) <= rq:
            lq += rq - len(rt)
    lq, rq = max(lq, 0), max(rq, 0)
    kept_l = lt if len(lt) <= lq else (lt[-lq:] if lq > 0 else [])
    kept_r = rt[:rq]
    ids = [CLS_ID] + kept_l + mt + kept_r + [SEP_ID]
    ids = ids[:L]
    return ids + [0] * (L - len(ids))


def _py_candidate(title: str, desc: str, L: int) -> list[int]:
    body = (_py_tok(title) + [ENT_TITLE_ID] + _py_tok(desc))[: L - 2]
    ids = [CLS_ID] + body + [SEP_ID]
    return ids + [0] * (L - len(ids))


CASES = [
    # (left, mention, right) — quotas must bite in both directions
    ("a b c d e f", "tango xray", "g h"),          # long left, short right
    ("a b", "tango xray", "p q r s t u v w"),      # short left, long right
    ("a b c d e", "tango", "p q r s t"),           # both overflow
    ("", "tango xray", ""),                        # no context
    ("a b", "", "c d"),                            # empty mention
]


def test_context_quota_rebalancing_matches_reference_rule(spark):
    L = 12
    df = spark.createDataFrame(CASES, "l string, m string, r string")
    got = [
        r.ids
        for r in df.select(context_input_ids("l", "m", "r", L).alias("ids"))
        .collect()
    ]
    expected = [_py_context(l, m, r, L) for l, m, r in CASES]
    assert got == expected
    # the truncating cases genuinely truncate (quota arithmetic exercised)
    assert any(len(_py_tok(l)) + len(_py_tok(m)) + len(_py_tok(r)) + 4 > L
               for l, m, r in CASES)


def test_candidate_and_pair_construction(spark):
    CL, PL = 10, 18
    rows = [("alpha bravo", "one two three four five six seven eight nine")]
    df = spark.createDataFrame(rows, "title string, txt string")
    out = df.select(
        candidate_input_ids("title", "txt", CL).alias("cand"),
        context_input_ids(F.lit("x y"), F.lit("alpha"), F.lit("z"), CL).alias("ctx"),
    ).select(
        "cand", "ctx", pair_input_ids("ctx", "cand", PL).alias("pair")
    ).collect()[0]
    exp_cand = _py_candidate(rows[0][0], rows[0][1], CL)
    assert out.cand == exp_cand
    # pair: ctx + cand[1:], truncated to PL (the `modify` rule)
    assert out.pair == (out.ctx + exp_cand[1:])[:PL]
    assert out.cand[0] == CLS_ID and ENT_TITLE_ID in out.cand


def test_context_quota_property_random(spark):
    """Hypothesis-style randomized parity (fixed seed corpus): random
    word-count combinations of (left, mention, right) at several max lengths
    must all match the python transcription of the reference rule."""
    import itertools

    words = "aa bb cc dd ee ff gg hh ii jj kk ll".split()
    cases = []
    for nl, nm, nr in itertools.product((0, 1, 3, 6, 9), (0, 1, 3, 5), (0, 2, 7)):
        cases.append(
            (" ".join(words[:nl]), " ".join(words[2 : 2 + nm]), " ".join(words[5 : 5 + nr]))
        )
    for L in (8, 12, 20):
        df = spark.createDataFrame(cases, "l string, m string, r string")
        got = [
            r.ids
            for r in df.select(context_input_ids("l", "m", "r", L).alias("ids")).collect()
        ]
        expected = [_py_context(l, m, r, L) for l, m, r in cases]
        assert got == expected, f"max_seq_length={L}"


def test_token_ids_deterministic_and_offset(spark):
    df = spark.createDataFrame([("Alpha  BRAVO ",)], "t string")
    ids = df.select(token_ids("t").alias("ids")).collect()[0].ids
    assert ids == _py_tok("Alpha  BRAVO ")
    assert all(i > SEP_ID for i in ids)  # hashed ids never collide with specials
