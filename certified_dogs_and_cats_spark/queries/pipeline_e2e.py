"""Driver-checked end-to-end run of the reference ETL pipeline.

Every other registry entry exercises one operator; this one exercises the
whole bronze -> silver -> gold chain (reference notebooks/bronze.py:75-123,
silver.py:33-135, gold.py:32-73 and Workflow/Daily_Licensed_Pets.yaml) under
the DuckDB oracle: a deterministic two-day raw CSV fixture is written to a
temp dir, the daily DAG runs for both days plus an idempotency re-run, and
the resulting ``v_totals_by_year_type`` gold view is returned. The oracle
replays the same rows through the same semantics in pure SQL: upper/trim
standardization, silver validity filter, cross-day exactly-once on _id, gold's Year filter, and the
share/rank window math.

The fixture bakes in every edge the pipeline guards against: mixed
case/whitespace, an invalid FSA (value nulled, row kept), an unmapped breed
(fallback, row kept), a null Year (kept in silver, excluded from gold), and a day-2
duplicate _id (anti-joined away). The run itself asserts stage states —
day-2 re-run must skip via the bronze control table, not double-load — so a
green hash row certifies orchestration, guards, and idempotency together.
"""

from __future__ import annotations

import csv
import os
import shutil
import tempfile
from datetime import date, datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import t
from .registry import query

_HEADER = ["_id", "Year", "FSA", "ANIMAL_TYPE", "PRIMARY_BREED"]

# (_id, Year, FSA, ANIMAL_TYPE, PRIMARY_BREED); Year "" reads as NULL int.
_DAY1 = [
    (1, 2023, "M1A", " dog ", "golden retriever"),
    (2, 2023, "M2B", "DOG", "Labrador"),
    (3, 2023, "M3C", "cat", "Siamese"),
    (4, 2023, "bad", "CAT", "Persian"),
    (5, 2024, "M5E", "Dog", "POODLE"),
    (6, 2024, "M6F", "DOG", "beagle"),
    (7, 2024, "M7G", "DOG", "pug"),
    (8, 2024, "M8H", "CAT", "UNICORN CAT"),
    (9, 2025, "M9I", "cat", "tabby"),
    (10, 2025, "M1B", "CAT", "calico"),
    (12, "", "M2C", "DOG", "mixed"),
]
_DAY2 = [
    (12, "", "M2C", "DOG", "mixed"),  # duplicate _id: anti-joined away
    (13, 2025, "M3D", "DOG", "husky"),
    (14, 2025, "M4E", "dog", "corgi"),
    (15, 2025, "M5F", "CAT", "sphynx"),
    (16, 2024, "M6G", "CAT", "manx"),
]

_D1 = date(2026, 1, 1)
_D2 = date(2026, 1, 2)
_CLOCK1 = datetime(2026, 1, 1, 10, 0, 0)
_CLOCK2 = datetime(2026, 1, 2, 10, 0, 0)


def _values_sql() -> str:
    rows = []
    for _id, yr, _fsa, animal, _breed in _DAY1 + _DAY2:
        y = "NULL" if yr == "" else str(yr)
        rows.append(f"({_id}, {y}, '{animal}')")
    return ",\n      ".join(rows)


def _write_drop(raw_root: str, d: date, rows: list[tuple]) -> None:
    drop = os.path.join(raw_root, f"ingestion_date={d.isoformat()}")
    os.makedirs(drop, exist_ok=True)
    with open(os.path.join(drop, "data.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(_HEADER)
        w.writerows(rows)


@query(
    "pipeline_totals_end_to_end",
    oracle=f"""
    WITH raw(_id, yr, animal_type) AS (
      VALUES
      {_values_sql()}
    ),
    -- silver standardize + cross-day exactly-once on _id: the day-2
    -- duplicate row is identical, so DISTINCT reproduces the anti-join
    std AS (
      SELECT DISTINCT _id, yr, upper(trim(animal_type)) AS animal_type
      FROM raw
    ),
    -- silver validity filter + gold's usable-Year filter
    src AS (
      SELECT yr, animal_type FROM std
      WHERE animal_type IN ('DOG', 'CAT') AND yr IS NOT NULL
    ),
    cnts AS (
      SELECT CAST(yr AS INTEGER) AS "Year", animal_type AS "ANIMAL_TYPE",
             CAST(count(*) AS BIGINT) AS cnt
      FROM src GROUP BY 1, 2
    )
    SELECT "Year", "ANIMAL_TYPE", cnt,
           round(100.0 * cnt / sum(cnt) OVER (PARTITION BY "Year"), 2)
             AS share_pct,
           CAST(row_number() OVER (
                  PARTITION BY "Year"
                  ORDER BY cnt DESC, "ANIMAL_TYPE" ASC
                ) AS INTEGER) AS rnk
    FROM cnts
    """,
)
def pipeline_totals_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..pipeline import Catalog, build_daily_pipeline

    root = tempfile.mkdtemp(prefix="cdc_pipeline_e2e_")
    try:
        catalog = Catalog(spark, os.path.join(root, "warehouse"))
        raw_root = os.path.join(root, "raw", "licensed_pets")

        _write_drop(raw_root, _D1, _DAY1)
        runs1 = build_daily_pipeline(catalog, raw_root, clock=_CLOCK1).run(
            ingestion_date=_D1
        )
        _expect(runs1, "bronze", "loaded", rows=11)
        _expect(runs1, "silver", "loaded", rows=11)

        _write_drop(raw_root, _D2, _DAY2)
        runs2 = build_daily_pipeline(catalog, raw_root, clock=_CLOCK2).run(
            ingestion_date=_D2
        )
        _expect(runs2, "bronze", "loaded", rows=4)  # dup _id anti-joined
        _expect(runs2, "silver", "loaded", rows=4)

        # Idempotency: re-running day 2 must skip via the control table.
        runs3 = build_daily_pipeline(catalog, raw_root, clock=_CLOCK2).run(
            ingestion_date=_D2
        )
        _expect(runs3, "bronze", "skipped_already_loaded")
        if runs3["gold"].state != "succeeded":
            raise RuntimeError("gold must rebuild views on a skipped re-run")

        totals = spark.sql(
            "SELECT Year, ANIMAL_TYPE, cnt, share_pct, rnk "
            "FROM pets_gold_v_totals_by_year_type"
        )
        # The gold view reads the temp warehouse, which is deleted below —
        # pin the (6-row) result before the files disappear. This is a
        # presentation-sized collect of an aggregate, not a data move.
        return spark.createDataFrame(totals.collect(), totals.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _expect(runs, stage: str, status: str, rows: int | None = None) -> None:
    run = runs[stage]
    if run.state != "succeeded" or run.result.status != status:
        raise RuntimeError(
            f"pipeline stage {stage}: expected {status}, got "
            f"state={run.state} status={getattr(run.result, 'status', None)} "
            f"error={run.error}"
        )
    if rows is not None and run.result.rows != rows:
        raise RuntimeError(
            f"pipeline stage {stage}: expected {rows} rows, got "
            f"{run.result.rows}"
        )


@query(
    "ddl_lifecycle_end_to_end",
    oracle="""
    WITH seed(account, status, amount) AS (
      VALUES (1, 'open', 100.0), (2, 'open', 250.0),
             (3, 'closed', 75.0), (4, 'open', 10.0)
    ),
    changes(account, status, amount) AS (
      VALUES (2, 'closed', 260.0), (4, 'open', 55.0), (5, 'open', 900.0)
    ),
    merged AS (
      SELECT s.account,
             coalesce(c.status, s.status) AS status,
             coalesce(c.amount, s.amount) AS amount
      FROM seed s LEFT JOIN changes c USING (account)
      UNION ALL
      SELECT account, status, amount FROM changes
      WHERE account NOT IN (SELECT account FROM seed)
    ),
    updated AS (
      SELECT account, status,
             CASE WHEN status = 'closed' THEN amount + 1.0 ELSE amount END
               AS amount
      FROM merged
    ),
    kept AS (SELECT * FROM updated WHERE NOT (amount < 60.0))
    SELECT status,
           CAST(count(*) AS BIGINT) AS n_accounts,
           round(sum(amount), 2) AS total_amount
    FROM kept GROUP BY status
    """,
)
def ddl_lifecycle_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL front door end to end under the driver: CREATE SCHEMA /
    CREATE TABLE (S7), INSERT INTO VALUES (S6), MERGE INTO with both
    clauses (J5), copy-on-write UPDATE and DELETE FROM, OPTIMIZE + VACUUM
    RETAIN 0 HOURS (S12), a CTAS snapshot, then a SELECT over the
    snapshot — every statement the SQL surface supports, in one
    lifecycle, against a throwaway warehouse. The oracle replays the
    seed+merge+update+delete algebra in pure SQL. The maintenance
    statements must be behavior-preserving: the final aggregate is
    computed AFTER compaction and a zero-retention vacuum."""
    from ..pipeline import Catalog, DdlSession

    root = tempfile.mkdtemp(prefix="cdc_ddl_e2e_")
    try:
        catalog = Catalog(spark, os.path.join(root, "warehouse"))
        ddl = DdlSession(catalog)
        ddl.execute(
            """
            CREATE SCHEMA IF NOT EXISTS core;
            CREATE TABLE pets.core.balances (
              account INT, status STRING, amount DOUBLE
            ) USING DELTA;
            INSERT INTO pets.core.balances VALUES
              (1, 'open', 100.0), (2, 'open', 250.0),
              (3, 'closed', 75.0), (4, 'open', 10.0);
            WITH chg(account, status, amount) AS (
              VALUES (2, 'closed', 260.0), (4, 'open', 55.0),
                     (5, 'open', 900.0)
            )
            MERGE INTO pets.core.balances AS t
            USING chg AS s
            ON t.account = s.account
            WHEN MATCHED THEN
              UPDATE SET t.status = s.status, t.amount = s.amount
            WHEN NOT MATCHED THEN
              INSERT (account, status, amount)
              VALUES (s.account, s.status, s.amount);
            UPDATE pets.core.balances SET amount = amount + 1.0
              WHERE status = 'closed';
            DELETE FROM pets.core.balances WHERE amount < 60.0;
            OPTIMIZE pets.core.balances;
            VACUUM pets.core.balances RETAIN 0 HOURS;
            CREATE TABLE pets.core.balances_snap AS
              SELECT * FROM pets.core.balances;
            """
        )
        (out,) = ddl.execute(
            "SELECT status, count(*) AS n_accounts,"
            " round(sum(amount), 2) AS total_amount"
            " FROM pets.core.balances_snap GROUP BY status;"
        )
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "export_roundtrip_csv",
    oracle="""
    SELECT r_name,
           CAST(count(*) AS BIGINT) AS n_nations,
           CAST(min(n_nationkey) AS INTEGER) AS min_key
    FROM region JOIN nation ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def export_roundtrip_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10 under the driver: write a joined view through the CSV export
    sink (headered, date-partitioned layout), read the export BACK with a
    declared schema, and aggregate the round-tripped rows — a green row
    proves the export is lossless for the website-feed shapes the
    reference ships (README.md:81-82,117-123)."""
    from pyspark.sql import types as T

    from ..pipeline.export import export_view_csv

    region = t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    nation = t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    joined = nation.join(
        F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"]
    ).select("r_name", "n_nationkey")

    root = tempfile.mkdtemp(prefix="cdc_export_rt_")
    try:
        out = export_view_csv(
            joined, root, "region_nations", date(2026, 1, 1), single_file=True
        )
        back = spark.read.schema(
            T.StructType(
                [
                    T.StructField("r_name", T.StringType()),
                    T.StructField("n_nationkey", T.IntegerType()),
                ]
            )
        ).option("header", True).csv(out)
        agg = back.groupBy("r_name").agg(
            F.count("*").alias("n_nations"),
            F.min("n_nationkey").alias("min_key"),
        )
        return spark.createDataFrame(agg.collect(), agg.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "scan_skipping_end_to_end",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
             AS total_price
    FROM orders
    WHERE o_totalprice > 400000.0
    GROUP BY o_orderpriority
    """,
)
def scan_skipping_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-level data skipping under the driver: load `orders` into a
    catalog table clustered on o_totalprice (several files with disjoint
    ranges), then answer a selective range predicate through
    ``Catalog.scan`` — the footer-stats-pruned read path. The run asserts
    that pruning actually skipped files (the stats did their job) AND the
    green hash row proves the pruned read returns row-identical results
    to the full-scan SQL. The money sum is DECIMAL-exact on both sides
    (o_totalprice is a parquet DOUBLE summed as DECIMAL then cast)."""
    from ..pipeline.catalog import Catalog

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    root = tempfile.mkdtemp(prefix="cdc_scan_skip_")
    try:
        cat = Catalog(spark, os.path.join(root, "wh"))
        cat.register("core.orders_clustered", orders.schema)
        # Range-partitioned write = disjoint o_totalprice ranges per file,
        # the layout OPTIMIZE cluster_by produces at warehouse scale.
        cat.append(
            "core.orders_clustered",
            orders.repartitionByRange(8, "o_totalprice"),
        )
        kept, total = cat.pruned_files(
            "core.orders_clustered", "o_totalprice > 400000.0"
        )
        if not (0 < kept < total):
            raise AssertionError(
                f"data skipping ineffective: kept {kept} of {total} files"
            )
        agg = (
            cat.scan("core.orders_clustered", "o_totalprice > 400000.0")
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
                .cast("double")
                .alias("total_price"),
            )
        )
        return spark.createDataFrame(agg.collect(), agg.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "export_roundtrip_jsonl",
    oracle="""
    SELECT n_name,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(count(*) FILTER (WHERE c_acctbal > 0) AS BIGINT)
             AS n_positive
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def export_roundtrip_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL export round trip under the driver: write a joined view
    through the JSONL sink (the training-corpus interchange format),
    read it BACK with a declared schema, aggregate — a green row proves
    the export is lossless including nested-free typed columns."""
    from pyspark.sql import types as T

    from ..pipeline.export import export_view_jsonl

    nation = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cust = t(spark, sf_dir, "customer").select("c_nationkey", "c_acctbal")
    joined = cust.join(
        F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"]
    ).select("n_name", "c_acctbal")

    root = tempfile.mkdtemp(prefix="cdc_export_jsonl_")
    try:
        out = export_view_jsonl(
            joined, root, "nation_customers", date(2026, 1, 1)
        )
        back = spark.read.schema(
            T.StructType(
                [
                    T.StructField("n_name", T.StringType()),
                    T.StructField("c_acctbal", T.DoubleType()),
                ]
            )
        ).json(out)
        agg = back.groupBy("n_name").agg(
            F.count("*").alias("n_customers"),
            F.sum((F.col("c_acctbal") > 0).cast("bigint")).alias(
                "n_positive"
            ),
        )
        return spark.createDataFrame(agg.collect(), agg.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "clone_isolation_end_to_end",
    oracle="""
    SELECT r_name,
           CAST(count(*) AS BIGINT) AS n_nations
    FROM region JOIN nation ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def clone_isolation_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-copy CLONE under the driver: snapshot a joined view into a
    catalog table, SHALLOW CLONE it, then DELETE and INSERT against the
    ORIGINAL — the clone must still aggregate to the pristine snapshot
    (the oracle over the source tables). A green row certifies clone
    isolation, the hard-link zero-copy read path, and that later writes
    to the source never leak into the clone."""
    from ..pipeline.catalog import Catalog

    region = t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    nation = t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    joined = nation.join(
        F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"]
    ).select("r_name", "n_nationkey")

    root = tempfile.mkdtemp(prefix="cdc_clone_e2e_")
    try:
        cat = Catalog(spark, os.path.join(root, "wh"))
        cat.register("core.rn", joined.schema)
        cat.append("core.rn", joined)
        cat.clone("core.rn", "core.rn_snapshot", shallow=True)
        # Mutate the ORIGINAL both ways; the clone must not move.
        cat.delete_where("core.rn", "n_nationkey < 10")
        cat.append(
            "core.rn",
            spark.createDataFrame(
                [("PHANTOM", 999)], joined.schema
            ),
        )
        agg = (
            cat.table("core.rn_snapshot")
            .groupBy("r_name")
            .agg(F.count("*").alias("n_nations"))
        )
        return spark.createDataFrame(agg.collect(), agg.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "bloom_skipping_end_to_end",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           lang,
           CAST(n_chars AS BIGINT) AS n_chars
    FROM documents
    WHERE doc_id IN (7, 211, 499)
    ORDER BY doc_id
    """,
)
def bloom_skipping_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter file index under the driver (Delta BLOOMFILTER INDEX
    parity): documents land hash-scattered across files, so every file's
    doc_id [min, max] spans the whole domain and footer stats prune
    NOTHING for a point lookup. CREATE BLOOMFILTER INDEX builds a
    per-file bitset (one column-projected job, executor-side packing);
    the same probe then opens only the files whose bloom admits a match.
    The run asserts stats-only pruning kept everything, bloom pruning
    skipped files, and the green hash row proves the pruned read is
    row-identical to the full-scan SQL."""
    from ..pipeline.catalog import Catalog

    docs = t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    root = tempfile.mkdtemp(prefix="cdc_bloom_skip_")
    try:
        cat = Catalog(spark, os.path.join(root, "wh"))
        cat.register("core.docs_scattered", docs.schema)
        # Hash-scatter = the adversarial layout for min/max skipping: the
        # id space interleaves across every file.
        cat.append("core.docs_scattered", docs.repartition(8, "doc_id"))
        pred = "doc_id IN (7, 211, 499)"
        kept_stats, total = cat.pruned_files("core.docs_scattered", pred)
        if kept_stats != total:
            raise AssertionError(
                f"expected stats-blind layout, stats kept {kept_stats}/{total}"
            )
        cat.create_bloom_index("core.docs_scattered", "doc_id", fpp=0.001)
        kept_bloom, total = cat.pruned_files("core.docs_scattered", pred)
        if not kept_bloom < total:
            raise AssertionError(
                f"bloom pruning ineffective: kept {kept_bloom} of {total}"
            )
        got = (
            cat.scan("core.docs_scattered", pred)
            .select("doc_id", "lang", "n_chars")
            .orderBy("doc_id")
        )
        return spark.createDataFrame(got.collect(), got.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "incremental_mv_end_to_end",
    oracle="""
    WITH final_src(grp, amt) AS (
      VALUES ('a', 2.5), ('a', 4.0), ('c', 7.5), ('c', 0.5), ('d', 9.0)
    )
    SELECT grp, CAST(count(*) AS BIGINT) AS cnt,
           round(sum(amt), 2) AS total
    FROM final_src GROUP BY grp
    """,
)
def incremental_mv_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance under the driver's
    oracle: the MV (count/sum per group) is maintained purely by CDC
    delta application (pipeline/incremental.py) across two appends, an
    idle refresh, and a whole-table overwrite (delete+insert deltas) —
    never by re-aggregating the source. The oracle aggregates the FINAL
    source state directly, so any error in the +/- delta algebra (or in
    the exactly-once watermark) leaves the MV diverged and fails the
    hash. Applied-row counts are asserted per refresh; amounts are 0.5
    multiples so incremental float addition is exact."""
    from pyspark.sql import types as T

    from ..pipeline import Catalog, IncrementalAggregate

    root = tempfile.mkdtemp(prefix="cdc_incr_mv_")
    try:
        catalog = Catalog(spark, os.path.join(root, "warehouse"))
        schema = T.StructType(
            [
                T.StructField("grp", T.StringType(), False),
                T.StructField("amt", T.DoubleType(), True),
            ]
        )
        catalog.register("core.src", schema)
        view = IncrementalAggregate(
            catalog, "core.src", "core.agg", ("grp",), "amt"
        )

        def _append(rows):
            catalog.append("core.src", spark.createDataFrame(rows, schema))

        _append([("a", 1.0), ("a", 2.0), ("b", 5.0)])
        if view.refresh() != 3:
            raise RuntimeError("refresh 1 must apply the 3 seeded rows")
        if view.refresh() != 0:
            raise RuntimeError("idle refresh must apply nothing")
        _append([("b", 1.5), ("c", 7.5)])
        if view.refresh() != 2:
            raise RuntimeError("refresh 2 must apply the 2 appended rows")
        # Overwrite: b disappears, a shrinks, d appears — the feed emits
        # delete+insert deltas and the MV must subtract/drop/insert.
        catalog.overwrite(
            "core.src",
            spark.createDataFrame(
                [("a", 2.5), ("a", 4.0), ("c", 7.5), ("c", 0.5), ("d", 9.0)],
                schema,
            ),
        )
        if view.refresh() <= 0:
            raise RuntimeError("overwrite must surface as change rows")
        out = (
            catalog.table("core.agg")
            .select(
                "grp",
                F.col("cnt").cast("bigint").alias("cnt"),
                F.round("total", 2).alias("total"),
            )
        )
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "cdf_time_travel_end_to_end",
    oracle="""
    WITH expected(_change_type, _commit_version, n, val_sum) AS (
      VALUES ('insert', 1, 3, 60.0),   -- seed append
             ('insert', 2, 2, 70.0),   -- second append
             ('delete', 3, 4, 90.0),   -- DELETE WHERE val < 40
             ('v1_snapshot', 1, 3, 60.0),
             ('v2_snapshot', 2, 5, 130.0),
             ('current', 3, 1, 40.0)
    )
    SELECT _change_type, CAST(_commit_version AS INTEGER) AS _commit_version,
           CAST(n AS BIGINT) AS n, val_sum
    FROM expected
    """,
)
def cdf_time_travel_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change Data Feed + time travel under the driver's oracle: three
    commits (append, append, keyed DELETE), then (a) the full change feed
    from v0 aggregated per (_change_type, _commit_version) and (b) a
    snapshot read AT EACH VERSION — every row the oracle pins is an
    independent replay of what the commit log must contain. A wrong
    delete attribution, a feed that re-emits old files, or a version read
    that sees the wrong snapshot each lands on a different oracle row."""
    from pyspark.sql import types as T

    from ..pipeline import Catalog

    root = tempfile.mkdtemp(prefix="cdc_cdf_tt_")
    try:
        catalog = Catalog(spark, os.path.join(root, "warehouse"))
        schema = T.StructType(
            [
                T.StructField("k", T.IntegerType(), False),
                T.StructField("val", T.DoubleType(), True),
            ]
        )
        catalog.register("core.t", schema)
        catalog.append(
            "core.t",
            spark.createDataFrame([(1, 10.0), (2, 20.0), (3, 30.0)], schema),
        )
        catalog.append(
            "core.t", spark.createDataFrame([(4, 30.0), (5, 40.0)], schema)
        )
        catalog.delete_where("core.t", "val < 40")

        feed = (
            catalog.changes("core.t", from_version=0)
            .groupBy("_change_type", "_commit_version")
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum("val"), 2).alias("val_sum"),
            )
        )
        snaps = []
        for label, ver in (("v1_snapshot", 1), ("v2_snapshot", 2), ("current", None)):
            snap = catalog.table("core.t", version=ver)
            agg = snap.agg(
                F.count("*").alias("n"),
                F.round(F.sum("val"), 2).alias("val_sum"),
            ).select(
                F.lit(label).alias("_change_type"),
                F.lit(ver if ver is not None else 3).alias("_commit_version"),
                "n",
                "val_sum",
            )
            snaps.append(agg)
        out = feed.select(
            "_change_type",
            F.col("_commit_version").cast("int").alias("_commit_version"),
            F.col("n").cast("bigint").alias("n"),
            "val_sum",
        )
        for s in snaps:
            out = out.unionByName(
                s.select(
                    "_change_type",
                    F.col("_commit_version").cast("int").alias("_commit_version"),
                    F.col("n").cast("bigint").alias("n"),
                    "val_sum",
                )
            )
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "bucketed_join_zero_shuffle",
    oracle="""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def bucketed_join_zero_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join (sources/bucketed.py): both tables are
    written bucketed on the join key, so the join itself runs with NO
    exchange — the pay-the-shuffle-once-at-ingest pattern for fact
    tables repeatedly joined on a stable key. The query ASSERTS the plan
    shape it claims: exactly one Exchange may appear (the post-join
    aggregate's, which groups on a non-bucket column); a second exchange
    means bucketing metadata did not reach the planner and the query
    fails rather than silently measuring a shuffled join. Oracle is the
    plain join+aggregate."""
    import uuid

    from ..sources.bucketed import read_table, write_bucketed

    db = f"bkt_{uuid.uuid4().hex[:10]}"
    # Pin the database location: the hosting session's default warehouse
    # dir may not be writable (driver-owned sessions), and the bucketed
    # write must go through saveAsTable for bucket metadata.
    db_loc = tempfile.mkdtemp(prefix="cdc_bkt_wh_")
    spark.sql(f"CREATE DATABASE {db} LOCATION '{db_loc}'")
    # Broadcast would win at test scale and ignore buckets entirely — the
    # pattern under test is the BIG-big join where broadcast is off the
    # table, so pin that regime and restore the thresholds after.
    prev = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        o = t(spark, sf_dir, "orders").select(
            "o_custkey", "o_totalprice"
        )
        c = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
        write_bucketed(o, f"{db}.orders_b", ["o_custkey"], 8, ["o_custkey"])
        write_bucketed(
            c, f"{db}.customer_b", ["c_custkey"], 8, ["c_custkey"]
        )
        ob = read_table(spark, f"{db}.orders_b")
        cb = read_table(spark, f"{db}.customer_b")
        joined = ob.join(cb, ob["o_custkey"] == cb["c_custkey"])
        out = joined.groupBy("c_mktsegment").agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        rows = out.collect()
        plan = (
            out._jdf.queryExecution()
            .executedPlan()
            .toString()
            .split("== Initial Plan ==")[0]
        )
        n_shuffles = plan.count("Exchange hashpartitioning")
        if "SortMergeJoin" not in plan or "Bucketed: true" not in plan:
            raise RuntimeError(
                "bucketed join did not plan as a bucketed sort-merge join"
            )
        if n_shuffles > 1:
            raise RuntimeError(
                f"bucketed join shuffled: {n_shuffles} shuffle exchanges in"
                " the final plan (expected <= 1, the post-join aggregate's)"
            )
        return spark.createDataFrame(rows, out.schema)
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
        shutil.rmtree(db_loc, ignore_errors=True)


@query(
    "schema_merge_scan_end_to_end",
    oracle="""
    WITH old_files(k, v) AS (VALUES (1, 10.0), (2, 20.0), (3, 30.0)),
         new_files(k, v, quality) AS (
           VALUES (4, 40.0, 'hi'), (5, 50.0, 'lo'), (6, 60.0, 'hi')
         ),
         unioned AS (
           SELECT k, v, NULL AS quality FROM old_files
           UNION ALL SELECT k, v, quality FROM new_files
         )
    SELECT coalesce(quality, '<pre-evolution>') AS quality,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(v), 2) AS v_sum
    FROM unioned GROUP BY 1
    """,
)
def schema_merge_scan_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution ON READ: files written before a column existed
    and files written after it scan as ONE relation via mergeSchema,
    with the missing column NULL for pre-evolution files — the
    add-a-column-without-rewriting-history behavior every long-lived
    corpus needs (reference tables evolve the same way via ADD COLUMN;
    this pins the raw-parquet read path). The oracle replays the union
    algebra; a reader that drops old files, fails on the width mismatch,
    or misaligns columns by position lands on wrong rows."""
    root = tempfile.mkdtemp(prefix="cdc_schema_merge_")
    try:
        spark.createDataFrame(
            [(1, 10.0), (2, 20.0), (3, 30.0)], "k INT, v DOUBLE"
        ).coalesce(1).write.mode("append").parquet(root)
        spark.createDataFrame(
            [(4, 40.0, "hi"), (5, 50.0, "lo"), (6, 60.0, "hi")],
            "k INT, v DOUBLE, quality STRING",
        ).coalesce(1).write.mode("append").parquet(root)
        merged = spark.read.option("mergeSchema", "true").parquet(root)
        out = (
            merged.groupBy(
                F.coalesce(F.col("quality"), F.lit("<pre-evolution>")).alias(
                    "quality"
                )
            )
            .agg(
                F.count("*").cast("bigint").alias("n"),
                F.round(F.sum("v"), 2).alias("v_sum"),
            )
        )
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "replace_where_rename_end_to_end",
    oracle="""
    WITH final_rows(region_name, amt) AS (
      VALUES ('jan', 10.0), ('jan', 11.0), ('feb', 3.0), ('mar', 4.0)
    )
    SELECT region_name,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(amt), 2) AS amt_sum,
           CAST((SELECT count(*) FROM final_rows) AS BIGINT) AS n_total
    FROM final_rows GROUP BY region_name
    """,
)
def replace_where_rename_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atomic row-range replacement (Delta replaceWhere parity) plus
    metadata-only column RENAME, chained: seed three months, swap exactly
    the 'jan' range for new rows in one commit (the query asserts the
    replaced-row count), then rename the partition-ish column WITHOUT
    rewriting a single data file — the post-rename read must still
    resolve the old files' physical column. A replace that leaks rows
    outside its predicate, or a rename that breaks old-file reads, lands
    off the VALUES oracle."""
    from pyspark.sql import types as T

    from ..pipeline import Catalog

    root = tempfile.mkdtemp(prefix="cdc_rw_ren_")
    try:
        catalog = Catalog(spark, os.path.join(root, "warehouse"))
        schema = T.StructType(
            [
                T.StructField("month", T.StringType()),
                T.StructField("amt", T.DoubleType()),
            ]
        )
        catalog.register("core.m", schema)
        catalog.append(
            "core.m",
            spark.createDataFrame(
                [("jan", 1.0), ("jan", 2.0), ("feb", 3.0), ("mar", 4.0)],
                schema,
            ),
        )
        n = catalog.replace_where(
            "core.m",
            "month = 'jan'",
            spark.createDataFrame([("jan", 10.0), ("jan", 11.0)], schema),
        )
        if n != 2:
            raise RuntimeError(f"replace_where must replace 2 rows, got {n}")
        catalog.rename_column("core.m", "month", "region_name")
        out = (
            catalog.table("core.m")
            .groupBy("region_name")
            .agg(
                F.count("*").cast("bigint").alias("n"),
                F.round(F.sum("amt"), 2).alias("amt_sum"),
            )
            .withColumn(
                "n_total",
                F.lit(4).cast("bigint"),
            )
        )
        rows = out.collect()
        got_total = sum(r["n"] for r in rows)
        if got_total != 4:
            raise RuntimeError(
                f"post-rename read returned {got_total} rows, expected 4"
            )
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "check_constraint_end_to_end",
    oracle="""
    WITH kept(k, amt) AS (VALUES (1, 5.0), (2, 0.0), (3, 9.5))
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           round(sum(amt), 2) AS amt_sum,
           CAST(1 AS BIGINT) AS n_rejected_batches
    FROM kept
    """,
)
def check_constraint_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHECK-constraint write enforcement through the SQL front door:
    ADD CONSTRAINT, a conforming insert lands, a violating insert is
    REJECTED ATOMICALLY (no partial rows), and a post-rejection
    conforming insert still lands — the table never holds a row the
    constraint forbids. The oracle pins the surviving rows plus the
    rejected-batch count the query itself tallies."""
    from ..pipeline import Catalog, DdlSession

    root = tempfile.mkdtemp(prefix="cdc_check_e2e_")
    try:
        catalog = Catalog(spark, os.path.join(root, "warehouse"))
        ddl = DdlSession(catalog)
        ddl.execute("USE SCHEMA core")
        ddl.execute("CREATE TABLE cchk (k INT, amt DOUBLE)")
        ddl.execute("ALTER TABLE cchk ADD CONSTRAINT amt_pos CHECK (amt >= 0)")
        ddl.execute("INSERT INTO cchk VALUES (1, 5.0), (2, 0.0)")
        rejected = 0
        try:
            ddl.execute("INSERT INTO cchk VALUES (7, 7.0), (8, -1.0)")
        except Exception:  # noqa: BLE001 — the rejection IS the behavior
            rejected += 1
        ddl.execute("INSERT INTO cchk VALUES (3, 9.5)")
        out = ddl.execute("SELECT * FROM cchk")[-1].agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.round(F.sum("amt"), 2).alias("amt_sum"),
        ).withColumn("n_rejected_batches", F.lit(rejected).cast("bigint"))
        rows = out.collect()
        if rejected != 1:
            raise RuntimeError("violating insert must be rejected")
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "restore_copy_into_end_to_end",
    oracle="""
    WITH final_rows(k, v) AS (
      VALUES (1, 1.5), (2, 2.5), (3, 3.5), (4, 10.0), (5, 20.0)
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(k) AS BIGINT) AS k_sum,
           round(sum(v), 2) AS v_sum,
           CAST(2 AS BIGINT) AS files_loaded,
           CAST(5 AS BIGINT) AS rows_inserted,
           CAST(0 AS BIGINT) AS rerun_loaded
    FROM final_rows
    """,
)
def restore_copy_into_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COPY INTO exactly-once + RESTORE TABLE in one lifecycle: two
    file-level incremental loads (a re-run in between must load
    nothing), then a destructive UPDATE, then RESTORE back to the
    pre-update version — history stays append-only (the pre-restore
    state remains readable at its version, asserted in-query) and the
    restored table must byte-match the loaded rows. The oracle pins the
    final rows plus the exactly-once load counters."""
    from ..pipeline import Catalog, DdlSession

    root = tempfile.mkdtemp(prefix="cdc_restore_ci_")
    try:
        catalog = Catalog(spark, os.path.join(root, "warehouse"))
        ddl = DdlSession(catalog)
        ddl.execute("USE SCHEMA core")
        ddl.execute("CREATE TABLE ci (k INT, v DOUBLE)")
        drop = os.path.join(root, "drop")
        os.makedirs(drop)
        with open(os.path.join(drop, "a.csv"), "w") as f:
            f.write("k,v\n1,1.5\n2,2.5\n3,3.5\n")
        out1 = ddl.execute(
            f"COPY INTO ci FROM '{drop}' FILEFORMAT = CSV"
            " FORMAT_OPTIONS ('header' = 'true')"
        )[0].collect()[0]
        rerun = ddl.execute(f"COPY INTO ci FROM '{drop}'")[0].collect()[0]
        with open(os.path.join(drop, "b.csv"), "w") as f:
            f.write("k,v\n4,10.0\n5,20.0\n")
        out2 = ddl.execute(f"COPY INTO ci FROM '{drop}'")[0].collect()[0]
        files_loaded = out1.num_files_loaded + out2.num_files_loaded
        rows_inserted = out1.num_rows_inserted + out2.num_rows_inserted
        v_good = catalog.current_version("core.ci")
        ddl.execute("UPDATE ci SET k = k * 100")
        v_bad = catalog.current_version("core.ci")
        ddl.execute(f"RESTORE TABLE ci TO VERSION AS OF {v_good}")
        # Append-only history: the clobbered state is still readable.
        bad_sum = (
            catalog.table("core.ci", version=v_bad)
            .agg(F.sum("k"))
            .first()[0]
        )
        if bad_sum != (1 + 2 + 3 + 4 + 5) * 100:
            raise RuntimeError("pre-restore version must remain readable")
        out = catalog.table("core.ci").agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum("k").cast("bigint").alias("k_sum"),
            F.round(F.sum("v"), 2).alias("v_sum"),
        ).select(
            "n_rows",
            "k_sum",
            "v_sum",
            F.lit(int(files_loaded)).cast("bigint").alias("files_loaded"),
            F.lit(int(rows_inserted)).cast("bigint").alias("rows_inserted"),
            F.lit(int(rerun.num_files_loaded)).cast("bigint").alias(
                "rerun_loaded"
            ),
        )
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "mv_rewrite_end_to_end",
    oracle="""
    WITH src(grp, amt) AS (
      VALUES ('a', 1.0), ('a', 2.0), ('b', 5.0), ('c', 7.0)
    )
    SELECT grp, CAST(count(*) AS BIGINT) AS cnt, round(sum(amt), 2) AS total,
           'rewrite:fresh,fallthrough:stale,rewrite:refreshed' AS phases
    FROM src GROUP BY grp
    """,
)
def mv_rewrite_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view QUERY REWRITE with its freshness gate, phase by
    phase: a matching SELECT is served from the MV's backing table only
    while the MV reflects every committed source version (plan asserted
    aggregation-free); after a source insert the SAME query falls
    through to the real aggregation (plan asserted to aggregate, new row
    visible); REFRESH restores the rewrite. The returned relation is the
    query's answer in the final state plus the phase transcript the run
    actually observed — a rewrite that serves stale data returns the
    wrong counts, a gate that never fires returns the wrong transcript."""
    from ..pipeline import Catalog, DdlSession

    root = tempfile.mkdtemp(prefix="cdc_mv_rw_")
    try:
        catalog = Catalog(spark, os.path.join(root, "warehouse"))
        ddl = DdlSession(catalog)
        ddl.execute("USE SCHEMA core")
        ddl.execute(
            "CREATE TABLE rw_src (grp STRING, amt DOUBLE);"
            "INSERT INTO rw_src VALUES ('a', 1.0), ('a', 2.0), ('b', 5.0);"
            "CREATE MATERIALIZED VIEW rw_mv AS "
            "SELECT grp, COUNT(*) AS cnt, SUM(amt) AS total "
            "FROM rw_src GROUP BY grp"
        )
        q = (
            "SELECT grp, COUNT(*) AS cnt, SUM(amt) AS total "
            "FROM rw_src GROUP BY grp"
        )

        def served_from_mv() -> bool:
            plan = (
                ddl.execute(q)[-1]
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            return "HashAggregate" not in plan

        phases = []
        phases.append("rewrite" if served_from_mv() else "aggregated")
        phases.append("fresh")
        ddl.execute("INSERT INTO rw_src VALUES ('c', 7.0)")
        phases.append(
            "fallthrough" if not served_from_mv() else "stale-served"
        )
        phases.append("stale")
        ddl.execute("REFRESH MATERIALIZED VIEW rw_mv")
        phases.append("rewrite" if served_from_mv() else "aggregated")
        phases.append("refreshed")
        transcript = (
            f"{phases[0]}:{phases[1]},{phases[2]}:{phases[3]},"
            f"{phases[4]}:{phases[5]}"
        )
        out = ddl.execute(q)[-1].select(
            "grp",
            F.col("cnt").cast("bigint").alias("cnt"),
            F.round("total", 2).alias("total"),
            F.lit(transcript).alias("phases"),
        )
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)
