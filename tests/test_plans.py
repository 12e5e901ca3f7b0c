"""Plan-shape regression tests: enforce the physical plans we want at 100 TB
(broadcast dim joins, pushed-down scans, no cartesian blowups)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from certified_dogs_and_cats_spark.operators.joins import dim_lookup
from certified_dogs_and_cats_spark.plans import (
    PlanAssertionError,
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pruned_schema,
    assert_pushed_filter,
    plan_text,
    wholestage_codegen_count,
)


@pytest.fixture
def parquet_table(spark, tmp_path):
    path = str(tmp_path / "facts")
    spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 10).alias("k"),
        (F.col("id") * 2).alias("v"),
    ).write.parquet(path)
    return spark.read.parquet(path)


def test_dim_lookup_is_broadcast_hash_join(spark, parquet_table):
    dim = spark.createDataFrame(
        [(i, f"name{i}") for i in range(10)], "k LONG, name STRING"
    )
    out = dim_lookup(parquet_table, dim, key="k", value_cols=["name"])
    assert_broadcast_join(out)
    assert_no_cartesian(out)


def test_filter_pushdown_reaches_parquet_scan(parquet_table):
    q = parquet_table.filter(F.col("k") == 3).select("id")
    assert_pushed_filter(q, "k")
    # Column pruning: only (id, k) should be read, not v.
    assert_pruned_schema(q, max_columns=2)


def test_pushdown_assertion_fails_when_not_pushed(spark):
    # An in-memory relation has no parquet scan, so nothing is pushed.
    df = spark.range(10).filter(F.col("id") > 3)
    with pytest.raises(PlanAssertionError):
        assert_pushed_filter(df, "id")


def test_no_cartesian_detects_cross_join(spark):
    a = spark.range(5)
    b = spark.range(5).withColumnRenamed("id", "id2")
    with pytest.raises(PlanAssertionError):
        assert_no_cartesian(a.crossJoin(b))


def test_lsh_ann_join_not_forced_broadcast(spark):
    """The bucketed ANN path must leave the join strategy to the planner:
    with a large query side (auto-broadcast disabled to simulate it), the
    plan must fall back to a shuffled join on `bucket` rather than a
    hard-coded broadcast of the query set (the 100 TB OOM scenario)."""
    from certified_dogs_and_cats_spark.extensions.similarity import (
        lsh_bucketed_topk,
    )

    vecs = spark.range(200).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 7 - 3).cast("double"),
            (F.col("id") % 5 - 2).cast("double"),
            (F.col("id") % 3 - 1).cast("double"),
        ).alias("e"),
    )
    q = vecs.filter(F.col("vec_id") % 10 == 0)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = lsh_bucketed_topk(vecs, q, k=3, bits=3)
        plan = plan_text(out, "simple")
        assert "BroadcastHashJoin" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_aggregation_stays_in_codegen(parquet_table):
    agg = parquet_table.groupBy("k").agg(F.sum("v").alias("s"))
    agg.collect()  # finalize the adaptive plan so codegen ids are visible
    assert wholestage_codegen_count(agg) >= 1
    assert "isFinalPlan=true" in plan_text(agg)


def test_embedding_near_dup_join_is_bucket_keyed(spark):
    """The near-dup self-join must key on `bucket` (equi-join), never a
    cartesian product — with broadcast disabled it shuffles on bucket."""
    from certified_dogs_and_cats_spark.extensions.dedup import (
        embedding_near_dup_pairs,
    )

    vecs = spark.range(200).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 7 - 3).cast("double"),
            (F.col("id") % 5 - 2).cast("double"),
            (F.col("id") % 3 - 1).cast("double"),
        ).alias("e"),
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = embedding_near_dup_pairs(vecs, 0.5, bits=2)
        assert_no_cartesian(out)
        plan = plan_text(out, "simple")
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_catalog_partition_pruning(spark, catalog):
    """Filters on the catalog's partition columns must prune directories
    (PartitionFilters), not scan-and-filter — the property that makes
    Year/ANIMAL_TYPE partitioning worth anything at 100 TB."""
    from pyspark.sql import types as T

    from certified_dogs_and_cats_spark.plans import assert_partition_pruned

    schema = T.StructType(
        [
            T.StructField("_id", T.IntegerType()),
            T.StructField("Year", T.IntegerType()),
            T.StructField("ANIMAL_TYPE", T.StringType()),
        ]
    )
    catalog.register("core.p", schema, partition_by=("Year", "ANIMAL_TYPE"))
    catalog.append(
        "core.p",
        spark.createDataFrame(
            [(1, 2024, "DOG"), (2, 2024, "CAT"), (3, 2025, "DOG")], schema
        ),
    )
    q = catalog.table("core.p").filter(
        (F.col("Year") == 2024) & (F.col("ANIMAL_TYPE") == "DOG")
    )
    assert_partition_pruned(q, "Year", "ANIMAL_TYPE")


def test_salted_join_equals_plain_join(spark):
    from certified_dogs_and_cats_spark.operators.joins import salted_join

    big = spark.range(1000).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("v")
    )
    small = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c")], "k LONG, name STRING"
    )
    got = sorted(
        (r.k, r.v, r.name)
        for r in salted_join(big, small, "k", n_salts=8).collect()
    )
    want = sorted(
        (r.k, r.v, r.name) for r in big.join(small, "k").collect()
    )
    assert got == want
    # The join must key on (k, salt) so hot keys spread across reducers.
    plan = plan_text(salted_join(big, small, "k", n_salts=8), "simple")
    assert "__salt" in plan


def test_bucketed_join_has_no_exchange(spark):
    """Two tables bucketed identically on the join key must sort-merge join
    with ZERO Exchange operators — the shuffle was paid at write time."""
    from certified_dogs_and_cats_spark.sources.bucketed import (
        read_table,
        write_bucketed,
    )

    a = spark.range(1000).select(
        (F.col("id") % 50).alias("k"), F.col("id").alias("va")
    )
    b = spark.range(500).select(
        (F.col("id") % 50).alias("k"), (F.col("id") * 3).alias("vb")
    )
    write_bucketed(a, "bkt_a", ["k"], 4, sort_cols=["k"])
    write_bucketed(b, "bkt_b", ["k"], 4, sort_cols=["k"])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = read_table(spark, "bkt_a").join(read_table(spark, "bkt_b"), "k")
        assert j.count() == 10000  # 20 * 10 per key * 50 keys
        plan = plan_text(j, "simple")
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_rollup_and_pivot_single_shuffle(spark, parquet_table):
    """Grouping-set expansion and pinned-list pivot must each stay one
    Exchange — the map-side expand / conditional-agg shapes, not one
    shuffle per grouping set or pivot value."""
    def final_plan(df):
        # AQE's simple mode prints Final and Initial sections; count nodes
        # only in the final (executed) plan.
        df.collect()
        return plan_text(df, "simple").split("== Initial Plan ==")[0]

    rolled = parquet_table.rollup("k").agg(F.count("*").alias("c"))
    assert final_plan(rolled).count("Exchange") == 1
    piv = parquet_table.groupBy("k").pivot("k", list(range(3))).count()
    assert final_plan(piv).count("Exchange") == 1


def test_global_window_convention_good_and_bad_shapes(spark):
    """The global-window audit (plans.global_window_violations): an
    unpartitioned window is allowed only over provably aggregate-scale
    input (aggregate / global limit / literal relation below it). One
    known-good and one deliberately-bad shape pin the detector."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from certified_dogs_and_cats_spark.plans import (
        PlanAssertionError,
        assert_no_global_window_over_events,
        global_window_violations,
    )

    # BAD: rank over the raw event-scale input, no PARTITION BY — a
    # single-partition sort of the corpus at scale.
    raw = spark.range(1000).selectExpr("id", "id % 7 AS grp")
    bad = raw.withColumn("r", F.row_number().over(Window.orderBy("id")))
    assert len(global_window_violations(bad)) == 1
    try:
        assert_no_global_window_over_events(bad)
        raise AssertionError("expected PlanAssertionError")
    except PlanAssertionError:
        pass

    # GOOD: the same global window over a GROUP BY result — input is
    # aggregate-scale, the convention's sanctioned shape.
    agg = raw.groupBy("grp").agg(F.count("*").alias("n"))
    good = agg.withColumn(
        "r", F.row_number().over(Window.orderBy(F.col("n").desc(), "grp"))
    )
    assert global_window_violations(good) == []
    assert_no_global_window_over_events(good)

    # GOOD: partitioned windows over raw data never flag.
    part = raw.withColumn(
        "r", F.row_number().over(Window.partitionBy("grp").orderBy("id"))
    )
    assert global_window_violations(part) == []

    # GOOD: global top-k limit below the window bounds the input.
    lim = raw.orderBy("id").limit(10)
    topk = lim.withColumn("r", F.row_number().over(Window.orderBy("id")))
    assert global_window_violations(topk) == []


def test_brute_force_topk_shuffles_only_k_per_partition(spark):
    """VERDICT r11 #4: the bounded-|Q| brute-force rankers
    (similarity_cosine_topk, hard_negative_mining) rank N*|Q| scored
    pairs through Window.partitionBy(query_id). Spark's
    InferWindowGroupLimit already turns that into a map-side partial
    top-k — a Partial-mode WindowGroupLimit BELOW the exchange, so each
    input partition forwards at most k rows per query instead of its
    whole scored stream. Pin the shape: it silently vanishes if a
    refactor inserts a projection between the rank filter and its
    window, swaps row_number for a non-rank function, or raises k past
    spark.sql.optimizer.windowGroupLimitThreshold."""
    from certified_dogs_and_cats_spark.extensions.similarity import (
        as_double_vec,
        cosine_topk,
    )
    from certified_dogs_and_cats_spark.plans import (
        assert_partial_topk_below_shuffle,
    )
    from certified_dogs_and_cats_spark.queries.roundeleven import (
        hard_negative_mining,
    )
    from certified_dogs_and_cats_spark.queries.similarity import K

    sf_dir = "/root/testdata/sf0.001"
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", as_double_vec("embedding").alias("e")
    )
    assert_partial_topk_below_shuffle(
        cosine_topk(e, e.limit(8), K, max_queries=8), K
    )
    assert_partial_topk_below_shuffle(hard_negative_mining(spark, sf_dir), K)
