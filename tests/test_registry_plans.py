"""Plan-shape checks on REAL registry queries at sf0.001: scans must be
pruned/pushed (the properties that decide whether 100 TB is read or
skipped), and join-strategy hints must be honored."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from certified_dogs_and_cats_spark.plans import plan_text
from certified_dogs_and_cats_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def read_schema_cols(plan: str, table: str) -> list[str]:
    import re

    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0] for c in m.group(1).split(",") if c]
        return cols
    raise AssertionError(f"no parquet scan found in plan:\n{plan}")


def test_group_count_prunes_scan(spark):
    plan = plan_text(QUERIES["group_count"](spark, SF))
    # groupBy(returnflag, linestatus).count() must not read the other
    # 10+ lineitem columns.
    assert len(read_schema_cols(plan, "lineitem")) <= 2


def test_multimodal_metadata_prunes_scan(spark):
    plan = plan_text(QUERIES["multimodal_metadata_agg"](spark, SF))
    assert set(read_schema_cols(plan, "documents")) <= {"doc_id", "text"}


def test_semi_join_pushes_price_filter(spark):
    import re

    plan = plan_text(QUERIES["semi_join_active_customers"](spark, SF))
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert any("GreaterThan(o_totalprice,100000" in p for p in pushed), pushed


def test_join_hints_are_honored(spark):
    big = spark.range(2000).select((F.col("id") % 7).alias("k"), "id")
    small = spark.range(7).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        smj = big.join(small.hint("merge"), "k")
        assert "SortMergeJoin" in plan_text(smj, "simple")
        shj = big.join(small.hint("shuffle_hash"), "k")
        assert "ShuffledHashJoin" in plan_text(shj, "simple")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    bhj = big.join(small.hint("broadcast"), "k")
    assert "BroadcastHashJoin" in plan_text(bhj, "simple")


def test_lateral_explode_prunes_to_text_only(spark):
    # doc_id is projected then never used: column pruning must reach the
    # scan (only `text` read), or the explode drags the whole row along.
    plan = plan_text(QUERIES["lateral_explode_positions"](spark, SF))
    assert read_schema_cols(plan, "documents") == ["text"]


def test_unpivot_prunes_scan(spark):
    plan = plan_text(QUERIES["unpivot_part_metrics"](spark, SF))
    assert set(read_schema_cols(plan, "part")) <= {
        "p_partkey", "p_retailprice", "p_size",
    }


def test_cube_expands_grouping_sets(spark):
    plan = plan_text(QUERIES["cube_order_stats"](spark, SF))
    # CUBE compiles to Expand (map-side grouping-set multiplication), one
    # aggregate exchange — not 4 separate scans unioned.
    assert "Expand" in plan
    assert set(read_schema_cols(plan, "orders")) <= {
        "o_orderstatus", "o_orderdate", "o_totalprice",
    }


def test_window_rank_family_single_shuffle(spark):
    # Both windows partition by o_orderpriority: Spark must plan ONE
    # hash-partitioning exchange (two sorts over it), not one per window.
    df = QUERIES["window_rank_family"](spark, SF)
    plan = plan_text(df, "simple")
    assert plan.count("Exchange hashpartitioning") == 1


def test_winnow_prunes_scan_and_single_window_shuffle(spark):
    """Winnowing reads only (doc_id, text); the sliding-window min adds
    exactly one doc-partitioned Exchange before the distinct."""
    plan = plan_text(QUERIES["winnow_fingerprints"](spark, SF))
    assert set(read_schema_cols(plan, "documents")) <= {"doc_id", "text"}


def test_semantic_survivors_prunes_embedding_scan(spark):
    # dedup_semantic_survivors' returned plan is all ExistingRDD (connected
    # components checkpoints its input edges to truncate iteration lineage),
    # so assert pruning on the stage that actually scans parquet: the
    # near-dup pair generation the query feeds into CC.
    from certified_dogs_and_cats_spark.extensions.dedup import (
        embedding_near_dup_pairs,
    )
    from certified_dogs_and_cats_spark.extensions.similarity import (
        as_double_vec,
    )
    from certified_dogs_and_cats_spark.queries.common import t as load

    e = load(spark, SF, "embeddings").select(
        "vec_id", as_double_vec("embedding").alias("e")
    )
    plan = plan_text(embedding_near_dup_pairs(e, 0.9, bits=4, n_probes=2))
    assert set(read_schema_cols(plan, "embeddings")) <= {
        "vec_id",
        "embedding",
    }


def test_grouping_sets_single_expand_single_exchange(spark):
    """GROUPING SETS must compile to one Expand + one shuffle, not a union
    of three scans."""
    import re

    plan = plan_text(QUERIES["grouping_sets_order_stats"](spark, SF))
    # formatted plans list each node twice (tree + detail header); count
    # the numbered detail headers only.
    assert len(re.findall(r"^\(\d+\) Expand", plan, re.M)) == 1
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1


def test_window_value_family_single_sort(spark):
    """Six window columns over the same (partition, order) must share one
    Window node chain after a single Exchange+Sort — stacking must not
    multiply shuffles."""
    plan = plan_text(QUERIES["window_value_family"](spark, SF), "simple")
    assert plan.count("Exchange") == 1
    assert plan.count("Sort") == 1


def test_token_zipf_is_topk_not_full_sort(spark):
    """Vocabulary heavy-hitters must compile to TakeOrderedAndProject
    (per-task top-k) over a pruned 2-column scan, never a global sort of
    the whole vocabulary."""
    plan = plan_text(QUERIES["token_zipf_topk"](spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert set(read_schema_cols(plan, "documents")) <= {"doc_id", "text"}


def test_vocab_encode_broadcasts_vocab(spark):
    """The encode join against the top-V vocabulary must broadcast the
    vocabulary — token payloads must not shuffle for the join."""
    plan = plan_text(QUERIES["vocab_encode_docs"](spark, SF), "simple")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_boilerplate_prune_broadcasts_hot_list(spark):
    """The df-threshold hot list is constant-size by pigeonhole and must
    broadcast; pruning must stay a map-side join on the token frame."""
    plan = plan_text(QUERIES["boilerplate_token_prune"](spark, SF), "simple")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_segment_dedup_prunes_documents_scan(spark):
    plan = plan_text(QUERIES["segment_exact_dedup"](spark, SF))
    assert set(read_schema_cols(plan, "documents")) <= {"doc_id", "text"}


def test_pii_redaction_is_narrow_map(spark):
    """PII scrub is a pure projection: pruned scan, no Exchange at all."""
    plan = plan_text(QUERIES["pii_redaction_counts"](spark, SF), "simple")
    assert "Exchange" not in plan
    plan_f = plan_text(QUERIES["pii_redaction_counts"](spark, SF))
    assert set(read_schema_cols(plan_f, "documents")) <= {
        "doc_id",
        "text",
        "source",
    }


def test_url_host_stats_prunes_scan(spark):
    plan = plan_text(QUERIES["url_host_stats"](spark, SF))
    assert set(read_schema_cols(plan, "documents")) <= {
        "doc_id",
        "source",
        "lang",
    }


def test_mixture_sample_filter_is_pre_shuffle(spark):
    """The keep/drop decision must run map-side (Filter below the first
    Exchange), so dropped rows never shuffle."""
    plan = plan_text(QUERIES["sample_mixture_weights"](spark, SF), "simple")
    first_exchange = plan.index("Exchange")
    assert "Filter" in plan[first_exchange:] or "Filter" in plan
    plan_f = plan_text(QUERIES["sample_mixture_weights"](spark, SF))
    assert set(read_schema_cols(plan_f, "documents")) <= {
        "doc_id",
        "source",
        "n_chars",
    }


def test_tfidf_broadcasts_corpus_count(spark):
    """The single-row corpus count must broadcast (nested-loop broadcast),
    and the documents scan must prune to (doc_id, text)."""
    plan = plan_text(QUERIES["tfidf_top_terms"](spark, SF), "simple")
    assert "BroadcastNestedLoopJoin" in plan
    plan_f = plan_text(QUERIES["tfidf_top_terms"](spark, SF))
    assert set(read_schema_cols(plan_f, "documents")) <= {"doc_id", "text"}


def test_bigram_lift_is_topk_not_full_sort(spark):
    """The global top-k over scored bigrams must be TakeOrderedAndProject,
    never a full sort of the bigram vocabulary."""
    plan = plan_text(QUERIES["bigram_lift_topk"](spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert set(read_schema_cols(plan, "documents")) <= {"doc_id", "text"}


def test_skew_salted_join_is_not_broadcast(spark):
    """The salted-join query must exercise the non-broadcast path the
    operator exists for (merge hint honored), joining on (key, salt)."""
    plan = plan_text(QUERIES["skew_salted_join_agg"](spark, SF), "simple")
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan


def test_funnel_conversion_prunes_events_scan(spark):
    plan = plan_text(QUERIES["funnel_conversion"](spark, SF))
    assert set(read_schema_cols(plan, "events")) <= {
        "user_id",
        "event_type",
        "ts",
    }


def test_retention_cohorts_prunes_events_scan(spark):
    plan = plan_text(QUERIES["retention_cohorts"](spark, SF))
    assert set(read_schema_cols(plan, "events")) <= {"user_id", "ts"}


def test_embedding_pool_max_prunes_scan(spark):
    """Pooling touches only (vec_id, embedding) — the label column must
    not be read from the embeddings scan."""
    plan = plan_text(QUERIES["embedding_pool_max"](spark, SF))
    assert set(read_schema_cols(plan, "embeddings")) <= {
        "vec_id",
        "embedding",
    }


def test_sketch_union_rollup_prunes_events_scan(spark):
    """The two-level sketch rollup reads only (event_type, ts, user_id) —
    value/props never leave the parquet footer."""
    plan = plan_text(QUERIES["sketch_union_rollup"](spark, SF))
    assert set(read_schema_cols(plan, "events")) <= {
        "event_type",
        "ts",
        "user_id",
    }


def test_ols_trend_prunes_events_scan(spark):
    plan = plan_text(QUERIES["per_group_ols_trend"](spark, SF))
    assert set(read_schema_cols(plan, "events")) <= {
        "event_type",
        "ts",
        "value",
    }


def test_transition_matrix_single_scan(spark):
    """One lag window over one pruned scan — the chain must not re-read
    events for the normalization window (simple mode: the formatted
    AQE dump repeats nodes per stage)."""
    import re

    plan = plan_text(QUERIES["event_transition_matrix"](spark, SF), "simple")
    assert len(re.findall(r"FileScan parquet", plan)) == 1
    plan_f = plan_text(QUERIES["event_transition_matrix"](spark, SF))
    assert set(read_schema_cols(plan_f, "events")) <= {
        "user_id",
        "ts",
        "event_id",
        "event_type",
    }


def test_bm25_topk_is_take_ordered_not_global_window(spark):
    """The BM25 top-k must be TakeOrderedAndProject (each task keeps k
    rows), never an unpartitioned rank window that funnels every hit
    document through one task; the scan must read only (doc_id, text)."""
    plan = plan_text(QUERIES["bm25_topk"](spark, SF))
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    assert set(read_schema_cols(plan, "documents")) <= {"doc_id", "text"}


def test_sorted_neighborhood_single_sort_no_join(spark):
    """Sorted-neighborhood candidates come from lead() over ONE block
    sort — the plan must contain no join at all (the linear-candidate
    property the operator exists for)."""
    plan = plan_text(QUERIES["fuzzy_sorted_neighborhood"](spark, SF))
    assert "Join" not in plan, plan[:2000]
