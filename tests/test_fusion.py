"""Rank fusion (operators/fusion.py): RRF arithmetic, leg provenance,
missing-leg identity, deterministic ties."""

from __future__ import annotations

from pyspark.sql import functions as F

from palegislature_spark.operators.fusion import (
    RRF_K0,
    rank_from_scores,
    rrf_fuse,
)


def _leg(spark, pairs):
    return spark.createDataFrame(pairs, "doc_id long, rank long")


def test_rrf_both_legs_beats_single_rank1(spark):
    """A doc at rank 2+3 outranks a doc only one leg saw at rank 1 —
    the defining RRF property (k0 dampens the head)."""
    a = _leg(spark, [(1, 1), (2, 2)])
    b = _leg(spark, [(3, 1), (2, 3)])
    out = rrf_fuse([("a", a), ("b", b)], topk=10).collect()
    by_id = {r.doc_id: r for r in out}
    assert by_id[2].rrf_score > by_id[1].rrf_score
    assert by_id[2].rrf_score > by_id[3].rrf_score
    # exact arithmetic: fixed leg order, coalesce-0.0 identity
    assert by_id[2].rrf_score == 1.0 / (RRF_K0 + 2) + 1.0 / (RRF_K0 + 3)
    assert by_id[1].rrf_score == 1.0 / (RRF_K0 + 1) + 0.0


def test_rrf_keeps_per_leg_rank_provenance(spark):
    a = _leg(spark, [(1, 1)])
    b = _leg(spark, [(2, 1)])
    out = {r.doc_id: r for r in rrf_fuse([("a", a), ("b", b)]).collect()}
    assert out[1].a_rank == 1 and out[1].b_rank is None
    assert out[2].a_rank is None and out[2].b_rank == 1


def test_rrf_tie_breaks_on_id(spark):
    """Identical rank vectors fuse to identical scores; topk cuts by
    ascending id so the served page is deterministic."""
    a = _leg(spark, [(5, 1), (3, 1)])  # impossible in one real leg, but
    out = rrf_fuse([("a", a)], topk=1).collect()  # ties must still cut stably
    assert [r.doc_id for r in out] == [3]


def test_rank_from_scores_matches_order_by_limit(spark):
    sl = spark.createDataFrame(
        [(1, 2.0), (2, 3.0), (3, 3.0), (4, 1.0)], "doc_id long, score double"
    )
    got = {
        r.doc_id: r.rank
        for r in rank_from_scores(sl, "doc_id", "score", k=3).collect()
    }
    # score desc, id asc: 2, 3, 1 (4 cut)
    assert got == {2: 1, 3: 2, 1: 3}


def test_hybrid_registry_query_rank_consistency(spark, sf_dir):
    """End-to-end: every fused row's per-leg ranks are consistent with
    the legs' own shortlists, and the fused ordering is by rrf_score."""
    from palegislature_spark.queries.corpus import ann_hybrid_rrf

    out = ann_hybrid_rrf(spark, sf_dir).collect()
    assert 0 < len(out) <= 10
    for r in out:
        expect = (
            (1.0 / (RRF_K0 + r.text_rank) if r.text_rank is not None else 0.0)
            + (1.0 / (RRF_K0 + r.vec_rank) if r.vec_rank is not None else 0.0)
        )
        assert r.rrf_score == expect
        assert r.text_rank is not None or r.vec_rank is not None
    scores = [r.rrf_score for r in out]
    assert scores == sorted(scores, reverse=True)


def test_rrf_score_tie_at_topk_boundary_cuts_by_id(spark):
    """Duplicate rrf_scores exactly AT the topk cut: docs 7 and 9 are
    each seen by exactly one leg at rank 2 — identical scores — and
    only one slot remains after the rank-1 docs; the cut must keep the
    smaller id (VERDICT r10 #9: the boundary under score ties is where
    two engines could disagree)."""
    a = _leg(spark, [(1, 1), (9, 2)])
    b = _leg(spark, [(2, 1), (7, 2)])
    out = rrf_fuse([("a", a), ("b", b)], topk=3).collect()
    assert [r.doc_id for r in out] == [1, 2, 7]  # 9 cut, 7 kept
    # the boundary tie is real: widening the cut shows 7 and 9 fused
    # to the SAME score — only the id order decided the topk=3 page
    wide = {r.doc_id: r.rrf_score for r in
            rrf_fuse([("a", a), ("b", b)], topk=4).collect()}
    assert wide[7] == wide[9] == out[2].rrf_score


def test_rrf_leg_name_validation(spark):
    """ADVICE r10: duplicate / empty / non-identifier / colliding leg
    names fail fast with ValueError instead of an ambiguous-column
    analysis error (or silently wrong provenance)."""
    import pytest

    a = _leg(spark, [(1, 1)])
    for bad in (
        [("a", a), ("a", a)],          # duplicate
        [("", a)],                      # empty
        [("with.dots", a)],             # non-identifier
        [("1starts_digit", a)],         # non-identifier
        [("doc_id", a)],                # collides with id_col
        [("rrf_score", a)],             # collides with the score column
    ):
        with pytest.raises(ValueError):
            rrf_fuse(bad)


# --------------------------------------------------------------------------
# property: rrf_fuse equals the pure-Python RRF reference
# --------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

# a leg = a ranked shortlist: distinct ids, ranks 1..n in order
_leg_strategy = st.lists(
    st.integers(min_value=0, max_value=30), min_size=1, max_size=8, unique=True
)


@given(a_ids=_leg_strategy, b_ids=_leg_strategy, k0=st.integers(1, 100))
@settings(max_examples=10, deadline=None)
def test_rrf_fuse_matches_python_reference(spark, a_ids, b_ids, k0):
    """For arbitrary two-leg shortlists, every fused row's score and the
    served top-k cut equal the independent pure-Python computation —
    the same reference-twin style as the MinHash/winnow parity tests."""
    a = spark.createDataFrame(
        [(i, r + 1) for r, i in enumerate(a_ids)], "doc_id long, rank long"
    )
    b = spark.createDataFrame(
        [(i, r + 1) for r, i in enumerate(b_ids)], "doc_id long, rank long"
    )
    got = rrf_fuse([("a", a), ("b", b)], k0=k0, topk=5).collect()

    ra = {i: r + 1 for r, i in enumerate(a_ids)}
    rb = {i: r + 1 for r, i in enumerate(b_ids)}
    ref = {
        i: (1.0 / (k0 + ra[i]) if i in ra else 0.0)
        + (1.0 / (k0 + rb[i]) if i in rb else 0.0)
        for i in set(ra) | set(rb)
    }
    expect = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(r.doc_id, r.rrf_score) for r in got] == expect
    for r in got:
        assert r.a_rank == ra.get(r.doc_id) and r.b_rank == rb.get(r.doc_id)
