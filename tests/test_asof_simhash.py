"""as-of join semantics (backward, inclusive, left-join, per-key) and
SimHash banded near-dup search (pigeonhole guarantee, hamming verify)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from certified_dogs_and_cats_spark.extensions.dedup import (
    simhash_near_dup_pairs,
)
from certified_dogs_and_cats_spark.operators.joins import asof_join


def ts(h, m=0):
    return datetime(2026, 1, 1, h, m)


@pytest.fixture
def sides(spark):
    left = spark.createDataFrame(
        [
            (1, 100, ts(10)),   # matches right @9:00
            (2, 100, ts(12)),   # matches right @12:00 (inclusive boundary)
            (3, 200, ts(9)),    # no right row at-or-before -> nulls
            (4, 300, ts(15)),   # key absent from right entirely -> nulls
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, ts(9), 1.0),
            (100, ts(12), 2.0),
            (100, ts(14), 3.0),  # after every left row for key 100
            (200, ts(11), 4.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    return left, right


def test_asof_backward_inclusive_left(sides):
    left, right = sides
    out = {
        r.event_id: (r.ts_asof, r.value_asof)
        for r in asof_join(left, right, on=["user_id"]).collect()
    }
    assert out[1] == (ts(9), 1.0)    # latest at-or-before 10:00
    assert out[2] == (ts(12), 2.0)   # equal timestamps match (inclusive)
    assert out[3] == (None, None)    # right rows all later
    assert out[4] == (None, None)    # unmatched key survives (left join)
    assert len(out) == 4


def test_asof_single_shuffle_no_range_join(spark, sides):
    left, right = sides
    plan = asof_join(left, right, on=["user_id"])._jdf.queryExecution()
    text = plan.executedPlan().toString()
    # union + window: there must be NO join operator at all in the plan.
    assert "Join" not in text
    assert "Window" in text


def test_simhash_pairs_pigeonhole_and_verify(spark):
    # 3-bit-apart pair MUST be found (guarantee), 8-bit-apart pair (still
    # band-colliding on band 0) must be verified away, disjoint pair absent.
    sig = spark.createDataFrame(
        [
            (1, "0000000000000000"),
            (2, "000000000000000b"),  # hamming 3 from doc 1
            (3, "00000000000000ff"),  # hamming 8 from doc 1: candidate, fails verify
            (4, "ffffffffffffffff"),
        ],
        "doc_id long, simhash string",
    )
    got = {
        (r.a_id, r.b_id): r.hamming
        for r in simhash_near_dup_pairs(sig, "doc_id", max_hamming=3).collect()
    }
    assert got[(1, 2)] == 3
    assert (1, 3) not in got and (1, 4) not in got


def test_simhash_pairs_rejects_broken_guarantee(spark):
    sig = spark.createDataFrame([(1, "0" * 16)], "doc_id long, simhash string")
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_near_dup_pairs(sig, "doc_id", max_hamming=4, n_bands=4)


def test_interval_join_binning_correct_and_no_nested_loop(spark):
    from certified_dogs_and_cats_spark.operators.range_join import (
        interval_join,
    )
    from certified_dogs_and_cats_spark.plans import plan_text

    points = spark.createDataFrame(
        [(i, ts(9 + i % 8, 7 * (i % 9))) for i in range(40)],
        "pid long, pts timestamp",
    )
    intervals = spark.createDataFrame(
        [(100, ts(10), ts(11, 30)), (200, ts(11), ts(11, 10)),
         (300, ts(20), ts(21))],
        "iid long, lo timestamp, hi timestamp",
    )
    got = sorted(
        (r.pid, r.iid)
        for r in interval_join(
            points, intervals, "pts", "lo", "hi", bin_width="45 minutes"
        ).collect()
    )
    want = sorted(
        (p.pid, i.iid)
        for p in points.collect()
        for i in intervals.collect()
        if i.lo <= p.pts <= i.hi
    )
    assert got == want and len(want) > 5
    plan = plan_text(
        interval_join(points, intervals, "pts", "lo", "hi"), "simple"
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_interval_join_rejects_column_overlap(spark):
    from certified_dogs_and_cats_spark.operators.range_join import (
        interval_join,
    )

    a = spark.createDataFrame([(1, ts(1))], "x long, ts timestamp")
    with pytest.raises(ValueError, match="overlapping"):
        interval_join(a, a, "ts", "ts", "ts")


def test_interval_join_left_and_semi_anti_semantics(spark):
    """left keeps unmatched points null-extended (the BETWEEN is part of
    the join condition, not a post-filter); semi/anti partition the point
    set; interval-preserving joins raise."""
    from certified_dogs_and_cats_spark.operators.range_join import (
        interval_join,
    )

    points = spark.createDataFrame(
        [(1, ts(10, 30)), (2, ts(12)), (3, ts(23))],
        "pid long, pts timestamp",
    )
    intervals = spark.createDataFrame(
        [(100, ts(10), ts(11))], "iid long, lo timestamp, hi timestamp"
    )
    left = interval_join(
        points, intervals, "pts", "lo", "hi", bin_width="1 hour", how="left"
    )
    got = sorted((r.pid, r.iid) for r in left.collect())
    assert got == [(1, 100), (2, None), (3, None)]
    semi = interval_join(
        points, intervals, "pts", "lo", "hi", bin_width="1 hour",
        how="left_semi",
    )
    assert [r.pid for r in semi.collect()] == [1]
    anti = interval_join(
        points, intervals, "pts", "lo", "hi", bin_width="1 hour",
        how="left_anti",
    )
    assert sorted(r.pid for r in anti.collect()) == [2, 3]
    with pytest.raises(ValueError, match="point-preserving"):
        interval_join(points, intervals, "pts", "lo", "hi", how="full")


def test_salted_join_rejects_small_side_preserving_how(spark):
    from certified_dogs_and_cats_spark.operators.joins import salted_join

    big = spark.createDataFrame([(1, "x")], "k long, a string")
    small = spark.createDataFrame([(1, "y")], "k long, b string")
    with pytest.raises(ValueError, match="big-side-preserving"):
        salted_join(big, small, "k", how="full")
    # left is exact under salt replication.
    assert salted_join(big, small, "k", how="left").count() == 1


def test_asof_join_forward_direction(spark):
    from certified_dogs_and_cats_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, ts(10)), (1, ts(12)), (2, ts(10))], "k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, ts(9), "early"), (1, ts(11), "mid"), (1, ts(12), "exact")],
        "k long, ts timestamp, v string",
    )
    fwd = {
        (r.k, r.ts): r.v_asof
        for r in asof_join(
            left, right, on=["k"], value_cols=["v"], direction="forward"
        ).collect()
    }
    # Earliest right at-or-after; inclusive on equality; unmatched -> null.
    assert fwd[(1, ts(10))] == "mid"
    assert fwd[(1, ts(12))] == "exact"
    assert fwd[(2, ts(10))] is None
    with pytest.raises(ValueError, match="backward|forward"):
        asof_join(left, right, on=["k"], direction="nearest")


def test_tune_lsh_matches_s_curve_intuition():
    import pytest as _pytest

    from certified_dogs_and_cats_spark.extensions.dedup import tune_lsh

    # High threshold -> wide bands (few, long); low threshold -> many
    # short bands. Midpoint (1/b)^(1/r) should track the threshold.
    for thr in (0.3, 0.5, 0.7, 0.9):
        b, r = tune_lsh(thr, num_hashes=32)
        assert b * r == 32
        midpoint = (1.0 / b) ** (1.0 / r)
        assert abs(midpoint - thr) < 0.2, (thr, b, r, midpoint)
    b_low, r_low = tune_lsh(0.3, 32)
    b_high, r_high = tune_lsh(0.9, 32)
    assert r_low < r_high  # lower threshold -> shorter bands
    assert b_low > b_high
    # Recall bias: weighting misses harder never shortens the bands'
    # catch range (bands get more numerous or shorter).
    b_w, r_w = tune_lsh(0.7, 32, fn_weight=5.0)
    b_n, r_n = tune_lsh(0.7, 32, fn_weight=1.0)
    assert r_w <= r_n
    with _pytest.raises(ValueError):
        tune_lsh(1.5)


def test_connected_components_string_ids(spark):
    """The default (alternating) algorithm must handle non-numeric ids —
    casting to long would NULL them all and collapse every component."""
    from certified_dogs_and_cats_spark.extensions.dedup import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [("doc-a", "doc-b"), ("doc-b", "doc-c"), ("doc-x", "doc-y")],
        "id_a string, id_b string",
    )
    got = {
        r.node: r.component for r in connected_components(edges).collect()
    }
    assert got == {
        "doc-a": "doc-a",
        "doc-b": "doc-a",
        "doc-c": "doc-a",
        "doc-x": "doc-x",
        "doc-y": "doc-x",
    }


def test_simhash_bands_validate_divisibility(spark):
    import pytest

    from certified_dogs_and_cats_spark.extensions.dedup import (
        lsh_candidate_pairs,
        simhash_near_dup_pairs,
    )

    sigs = spark.createDataFrame(
        [("a", "0" * 16)], "doc_id string, simhash string"
    )
    with pytest.raises(ValueError, match="divide"):
        simhash_near_dup_pairs(sigs, "doc_id", max_hamming=5, n_bands=17)
    with pytest.raises(ValueError, match="divide"):
        simhash_near_dup_pairs(sigs, "doc_id", max_hamming=2, n_bands=5)
    mh = spark.createDataFrame(
        [("a", 1, 2, 3)], "doc_id string, mh0 long, mh1 long, mh2 long"
    )
    with pytest.raises(ValueError, match="divide"):
        lsh_candidate_pairs(mh, "doc_id", num_hashes=3, band_size=2)


def test_exact_dedup_excludes_null_text(spark):
    from certified_dogs_and_cats_spark.extensions.dedup import (
        exact_dedup_groups,
    )

    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, None), (4, None)],
        "doc_id int, text string",
    )
    got = {
        r.text_hash: (r.keep_id, r.dup_count)
        for r in exact_dedup_groups(df, "doc_id", "text").collect()
    }
    # One real duplicate group; NULL texts form NO group at all.
    assert len(got) == 1 and list(got.values()) == [(1, 2)]


def test_incremental_lsh_batch_pairs_option(spark):
    from certified_dogs_and_cats_spark.extensions.dedup import (
        incremental_lsh_candidates,
    )

    corpus = spark.createDataFrame(
        [("c1", 0, "v1")], "id string, band_idx int, band_val string"
    )
    batch = spark.createDataFrame(
        [("b1", 0, "v1"), ("b2", 0, "v2"), ("b3", 0, "v2")],
        "id string, band_idx int, band_val string",
    )
    base = incremental_lsh_candidates(corpus, batch, "id")
    assert [(r.batch_id, r.corpus_id) for r in base.collect()] == [("b1", "c1")]
    both = incremental_lsh_candidates(
        corpus, batch, "id", include_batch_pairs=True
    )
    got = sorted((r.batch_id, r.corpus_id) for r in both.collect())
    # The two intra-batch near-dups (b2, b3) now surface as a candidate.
    assert got == [("b1", "c1"), ("b2", "b3")]


def test_asof_null_timestamp_left_rows_match_nothing(spark):
    """NULL-ts left rows must stay unmatched in BOTH directions (forward
    ordering would otherwise hand them the earliest right row)."""
    from certified_dogs_and_cats_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, None), (1, "2024-01-05")],
        "k int, ts string",
    ).selectExpr("k", "cast(ts as timestamp) as ts")
    right = spark.createDataFrame(
        [(1, "2024-01-01", 10.0), (1, "2024-01-09", 90.0)],
        "k int, ts string, v double",
    ).selectExpr("k", "cast(ts as timestamp) as ts", "v")
    for direction, want in (("backward", 10.0), ("forward", 90.0)):
        got = {
            (r.ts is None): r.v_asof
            for r in asof_join(
                left, right, ["k"], direction=direction
            ).collect()
        }
        assert got[True] is None, direction
        assert got[False] == want, direction


def test_merge_upsert_null_key_rows(spark):
    """NULL-keyed rows match null-safely and classify correctly."""
    from certified_dogs_and_cats_spark.operators.joins import merge_upsert

    t = spark.createDataFrame([(None, 1), (1, 10)], "k int, v int")
    s = spark.createDataFrame([(None, 2), (2, 20)], "k int, v int")
    got = {
        r.k: (r.v, r.merge_action)
        for r in merge_upsert(t, s, ["k"], ["v"]).collect()
    }
    assert got[None] == (2, "updated")
    assert got[1] == (10, "kept")
    assert got[2] == (20, "inserted")


def test_idempotent_new_rows_null_keys(spark):
    from certified_dogs_and_cats_spark.operators.joins import (
        idempotent_new_rows,
    )

    batch = spark.createDataFrame([(None, "a"), (1, "b")], "k int, v string")
    existing = spark.createDataFrame([(None, "x")], "k int, v string")
    got = [r.k for r in idempotent_new_rows(batch, existing, ["k"]).collect()]
    assert got == [1]  # the NULL-keyed row already exists: not re-appended


def test_simhash64_text_raises_on_monster_doc(spark):
    """The 16-bit SWAR lanes hold counts < 65536: a doc with more
    distinct tokens must raise (with the doc id) instead of silently
    overflowing into the adjacent bit-plane counter."""
    import pytest

    from certified_dogs_and_cats_spark.extensions.dedup import simhash64_text

    ok = spark.createDataFrame(
        [(1, "a b c"), (2, "x y")], "id BIGINT, text STRING"
    )
    assert simhash64_text(ok, "id", "text").count() == 2
    monster = " ".join(str(i) for i in range(65536))
    bad = spark.createDataFrame([(7, monster)], "id BIGINT, text STRING")
    with pytest.raises(Exception, match="65536 distinct tokens.*id=7"):
        simhash64_text(bad, "id", "text").collect()
