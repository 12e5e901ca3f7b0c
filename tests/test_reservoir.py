"""A-ES weighted reservoir (extensions/reservoir.py): exact replay
against a Python model (bit-identical — the key is the detln series,
not libm log), layout independence, weight-proportional inclusion,
salt-delimiter collision safety, and the exclusion rule for
non-positive weights."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from certified_dogs_and_cats_spark.extensions.reservoir import (
    GRID_BITS,
    unit_uniform,
    weighted_sample,
)
from certified_dogs_and_cats_spark.functions.detln import series_ln_py

SF = "/root/testdata/sf0.001"


def _model_key(ident: str, w: float) -> float:
    """Bit-exact replay of aes_key: CPython floats are IEEE doubles and
    series_ln_py executes the same operation DAG the engines do, so no
    tolerance is needed (math.log would differ in final ulps)."""
    h = int(hashlib.md5(ident.encode()).hexdigest()[:15], 16)
    return -series_ln_py(1 << (GRID_BITS + 1), 2 * h + 1) / w


def test_matches_python_model_exactly(spark):
    """The selected ids, their order, AND their double keys equal a full
    Python replay of the key derivation — the determinism the oracle
    registration relies on."""
    c = spark.read.parquet(f"{SF}/customer.parquet")
    got = [
        (r.c_custkey, r.sample_key)
        for r in weighted_sample(c, "c_custkey", "c_acctbal", 25).collect()
    ]
    rows = [
        (r.c_custkey, float(r.c_acctbal))
        for r in c.collect()
        if r.c_acctbal is not None and r.c_acctbal > 0
    ]
    want = sorted(
        ((k, _model_key(str(k), w)) for k, w in rows),
        key=lambda kv: (-kv[1], kv[0]),
    )[:25]
    assert got == want  # bit-exact, including the keys


def test_key_is_finite_and_close_to_libm(spark):
    """The series ln(u) tracks libm to ~1e-11 ABSOLUTE (the detln tail
    bound; relative error is unbounded as u -> 1 where ln u -> 0) —
    close enough that the A-ES distribution is unchanged, while staying
    engine-exact."""
    c = spark.read.parquet(f"{SF}/customer.parquet")
    for r in weighted_sample(c, "c_custkey", "c_acctbal", 25).collect():
        h = int(
            hashlib.md5(str(r.c_custkey).encode()).hexdigest()[:15], 16
        )
        u = (2 * h + 1) / float(1 << (GRID_BITS + 1))
        series_ln_u = r.sample_key * float(r.c_acctbal)
        assert math.isfinite(r.sample_key)
        assert abs(series_ln_u - math.log(u)) <= 1e-10


def test_layout_independent(spark):
    """Identical sample at different shuffle-partition settings."""
    c = spark.read.parquet(f"{SF}/customer.parquet")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    got = []
    try:
        for parts in ("2", "17"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            got.append(
                [
                    r.c_custkey
                    for r in weighted_sample(
                        c.repartition(int(parts)),
                        "c_custkey",
                        "c_acctbal",
                        20,
                    ).collect()
                ]
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert got[0] == got[1]


def test_inclusion_tracks_weight(spark):
    """Across many salts, an item with 9x the weight of its peers is
    drawn into a 1-of-n sample roughly 9x more often (loose band — the
    A-ES inclusion-probability property, not a tight statistical
    test)."""
    rows = [(i, 9.0 if i == 0 else 1.0) for i in range(10)]
    df = spark.createDataFrame(rows, ["id", "w"])
    wins = 0
    trials = 120
    for s in range(trials):
        top = weighted_sample(df, "id", "w", 1, salt=f"s{s}").collect()
        wins += top[0].id == 0
    # expected inclusion 9/18 = 0.5; band [0.3, 0.7] at n=120
    assert 0.3 <= wins / trials <= 0.7, wins


def test_salt_delimiter_prevents_identity_collisions(spark):
    """(id='1', salt='2x') and (id='12', salt='x') must draw INDEPENDENT
    uniforms — without the | delimiter both would hash md5('12x')."""
    df = spark.createDataFrame([("1",), ("12",)], ["id"])
    u1 = df.filter(F.col("id") == "1").select(
        unit_uniform(F.col("id"), "2x").alias("u")
    ).collect()[0].u
    u2 = df.filter(F.col("id") == "12").select(
        unit_uniform(F.col("id"), "x").alias("u")
    ).collect()[0].u
    assert u1 != u2
    # And the unsalted path hashes the bare id (no trailing delimiter).
    u3 = df.filter(F.col("id") == "1").select(
        unit_uniform(F.col("id")).alias("u")
    ).collect()[0].u
    h = int(hashlib.md5(b"1").hexdigest()[:15], 16)
    assert u3 == (2 * h + 1) / float(1 << (GRID_BITS + 1))


def test_nonpositive_weights_excluded_and_k_capped(spark):
    """Zero/negative/NULL weights can never be drawn; k larger than the
    eligible population returns exactly the eligible rows."""
    rows = [(1, 2.0), (2, 0.0), (3, -1.0), (4, None), (5, 1.0)]
    df = spark.createDataFrame(rows, ["id", "w"])
    got = {r.id for r in weighted_sample(df, "id", "w", 10).collect()}
    assert got == {1, 5}


def test_per_group_sample_matches_global_keys(spark):
    """Stratified selection uses the SAME keys as the global sampler:
    each group's sample equals the Python model restricted to that
    group, independent across groups."""
    from certified_dogs_and_cats_spark.extensions.reservoir import (
        weighted_sample_per_group,
    )

    c = spark.read.parquet(f"{SF}/customer.parquet")
    got = {}
    for r in weighted_sample_per_group(
        c, ["c_mktsegment"], "c_custkey", "c_acctbal", 3
    ).collect():
        got.setdefault(r.c_mktsegment, []).append((r.sample_rank, r.c_custkey))
    rows = [
        (r.c_mktsegment, r.c_custkey, float(r.c_acctbal))
        for r in c.collect()
        if r.c_acctbal is not None and r.c_acctbal > 0
    ]
    segs = {s for s, _, _ in rows}
    assert set(got) == segs
    for seg in segs:
        pool = [(k, _model_key(str(k), w)) for s, k, w in rows if s == seg]
        want = [
            (i + 1, k)
            for i, (k, _) in enumerate(
                sorted(pool, key=lambda kv: (-kv[1], kv[0]))[:3]
            )
        ]
        assert sorted(got[seg]) == want


def test_null_ids_excluded(spark):
    """A NULL id hashes to a NULL sample_key; desc ordering puts NULLs
    last, so they could surface once k exceeds the non-null population.
    NULL ids are ineligible outright (ADVICE r10)."""
    rows = [(None, 5.0), (1, 1.0), (2, 1.0)]
    df = spark.createDataFrame(rows, "id int, w double")
    got = {r.id for r in weighted_sample(df, "id", "w", 10).collect()}
    assert got == {1, 2}
    from certified_dogs_and_cats_spark.extensions.reservoir import (
        weighted_sample_per_group,
    )

    g = spark.createDataFrame(
        [("a", None, 5.0), ("a", 1, 1.0)], "grp string, id int, w double"
    )
    per = weighted_sample_per_group(g, ["grp"], "id", "w", 5).collect()
    assert [r.id for r in per] == [1]
