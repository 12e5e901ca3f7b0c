"""Adaptive incidence budget (extensions/incidence.py): cap agrees with
the Python model, the filter is the identity when the budget does not
bind, the post-filter candidate incidence respects the linear budget,
and the degenerate all-shared corpus collapses to cap=1 (no pairs)."""

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
