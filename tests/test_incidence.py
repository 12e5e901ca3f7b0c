"""Adaptive incidence budget (extensions/incidence.py): cap agrees with
the Python model, the filter is the identity when the budget does not
bind, the post-filter candidate incidence respects the linear budget,
the degenerate all-shared corpus collapses to cap=1 (no pairs), and the
simhash band-collision family (VERDICT r11 #1) honors the budget with a
cross-engine replay of the BINDING case (the sf0.01 driver gate only
exercises no-bind)."""

from __future__ import annotations

from pyspark.sql import functions as F

from certified_dogs_and_cats_spark.extensions.incidence import (
    BUDGET_DEN,
    BUDGET_NUM,
    adaptive_cap_py,
    adaptive_df_cap,
    budget_filter,
)


def _postings(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, shingle bigint")


def _incidence(df):
    return (
        df.groupBy("shingle")
        .agg(F.count("*").alias("d"))
        .agg(F.sum(F.expr("d * (d - 1) div 2")).alias("inc"))
        .collect()[0]
        .inc
    )


def test_cap_matches_python_model_on_skew(spark):
    # dfs: one skew bomb (20), a mid shingle (4), many singletons.
    rows = (
        [(i, 100) for i in range(20)]
        + [(i, 200) for i in range(4)]
        + [(i, 300 + i) for i in range(30)]
    )
    df = _postings(spark, rows)
    cap = adaptive_df_cap(df, "shingle").collect()[0].cap
    dfs = [20, 4] + [1] * 30
    assert cap == adaptive_cap_py(dfs)
    # postings=54, budget=40 (3/4): df<=4 cum inc = 6 <= 40, df=20 adds
    # 190 -> over. So the bomb is dropped, the mid shingle survives.
    assert cap == 4
    kept = budget_filter(df, "shingle")
    assert kept.filter(F.col("shingle") == 100).count() == 0
    assert kept.filter(F.col("shingle") == 200).count() == 4
    assert _incidence(kept) * BUDGET_DEN <= BUDGET_NUM * df.count()


def test_identity_when_budget_does_not_bind(spark):
    rows = [(i, s) for s in (1, 2, 3) for i in range(2)] + [(9, 4)]
    df = _postings(spark, rows)
    # postings=7, incidence=3, 4*3 <= 3*7 -> no bind.
    got = budget_filter(df, "shingle")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, rows))


def test_all_shared_corpus_collapses_to_no_pairs(spark):
    # One shingle in every doc: incidence d(d-1)/2 blows any linear
    # budget, so cap falls back to 1 and the universe empties.
    df = _postings(spark, [(i, 7) for i in range(10)])
    assert adaptive_df_cap(df, "shingle").collect()[0].cap == 1
    assert budget_filter(df, "shingle").count() == 0


def test_oracle_cte_replays_cap(spark):
    """The DuckDB CTE chain must pick the same cap and keep the same
    postings as the Spark filter on a binding fixture."""
    import duckdb

    from certified_dogs_and_cats_spark.extensions.incidence import (
        cap_ctes_sql,
    )

    rows = (
        [(i, 100) for i in range(20)]
        + [(i, 200) for i in range(4)]
        + [(i, 300 + i) for i in range(30)]
    )
    spark_kept = sorted(
        map(tuple, budget_filter(_postings(spark, rows), "shingle").collect())
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE sh (doc_id INT, shingle BIGINT)"
    )
    con.executemany("INSERT INTO sh VALUES (?, ?)", rows)
    sql = f"WITH {cap_ctes_sql('sh', 'shingle', 'doc_id')} SELECT doc_id, shingle FROM shc"
    duck_kept = sorted(map(tuple, con.execute(sql).fetchall()))
    assert spark_kept == duck_kept


# ---------------------------------------------------------------------------
# SimHash band-collision budget (VERDICT r11 #1)
# ---------------------------------------------------------------------------

HOT = "0000000000000000"  # 30 identical signatures: every band boilerplate-hot
NEAR_A = "ffffffffffffffff"
NEAR_B = "fffffffffffffffe"  # hamming 1 from NEAR_A; bands 0-2 shared (cold)


def _sigs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, simhash string")


def test_simhash_budget_no_bind_is_identity(spark):
    """Sparse signatures: the (10, 1) registered budget never binds, so
    the budgeted result is bit-identical to the lossless pigeonhole
    computation — the property the sf0.01 driver gate relies on."""
    from certified_dogs_and_cats_spark.extensions.dedup import (
        simhash_near_dup_pairs,
    )
    from certified_dogs_and_cats_spark.queries.dedup import (
        SIMHASH_BUDGET_DEN,
        SIMHASH_BUDGET_NUM,
    )

    rows = [(1, NEAR_A), (2, NEAR_B), (3, HOT), (4, "0123456789abcdef")]
    sig = _sigs(spark, rows)
    base = sorted(
        map(tuple, simhash_near_dup_pairs(sig, "doc_id").collect())
    )
    budgeted = sorted(
        map(
            tuple,
            simhash_near_dup_pairs(
                sig,
                "doc_id",
                budget=(SIMHASH_BUDGET_NUM, SIMHASH_BUDGET_DEN),
            ).collect(),
        )
    )
    assert budgeted == base
    assert (1, 2, 1) in base  # the near-dup pair is found at all


def test_simhash_budget_drops_hot_buckets_and_keeps_cold_pairs(spark):
    """Binding fixture: 30 identical signatures blow the linear budget
    (4 band buckets at df=30 -> 1,740 candidate pairs vs 10*128 posting
    budget... cap lands at 2), so the boilerplate block contributes NO
    pairs while the cold near-dup pair survives untouched."""
    from certified_dogs_and_cats_spark.extensions.incidence import (
        adaptive_cap_py,
    )
    from certified_dogs_and_cats_spark.extensions.dedup import (
        simhash_near_dup_pairs,
    )

    rows = [(i, HOT) for i in range(100, 130)] + [(1, NEAR_A), (2, NEAR_B)]
    sig = _sigs(spark, rows)
    got = sorted(
        map(
            tuple,
            simhash_near_dup_pairs(sig, "doc_id", budget=(10, 1)).collect(),
        )
    )
    assert got == [(1, 2, 1)]
    # and the cap the filter applied matches the Python model:
    # band dfs = 4 buckets at 30 (HOT), 3 at 2 (shared f-bands), 2 at 1.
    assert adaptive_cap_py([30] * 4 + [2] * 3 + [1] * 2, 10, 1) == 2


def test_simhash_budget_oracle_replays_binding_case(spark):
    """The registered oracles' sh_* CTE chain must make the SAME cap
    decision as budget_filter on a BINDING fixture — sf0.01 never binds,
    so without this pin a replay bug would only surface at scale."""
    import duckdb

    from certified_dogs_and_cats_spark.extensions.dedup import (
        simhash_near_dup_pairs,
    )
    from certified_dogs_and_cats_spark.queries.dedup import (
        _SIMHASH_BAND_BUDGET_CTE,
        SIMHASH_MAX_HAMMING,
    )

    rows = [(i, HOT) for i in range(100, 130)] + [(1, NEAR_A), (2, NEAR_B)]
    spark_pairs = sorted(
        map(
            tuple,
            simhash_near_dup_pairs(
                _sigs(spark, rows), "doc_id", budget=(10, 1)
            ).collect(),
        )
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE st (doc_id BIGINT, simhash VARCHAR)")
    con.executemany("INSERT INTO st VALUES (?, ?)", rows)
    sql = f"""
    WITH sig AS (SELECT doc_id, simhash FROM st),
    {_SIMHASH_BAND_BUDGET_CTE}
    SELECT a_id, b_id, hamming FROM dist
    WHERE hamming <= {SIMHASH_MAX_HAMMING}
    """
    duck_pairs = sorted(map(tuple, con.execute(sql).fetchall()))
    assert spark_pairs == duck_pairs == [(1, 2, 1)]
