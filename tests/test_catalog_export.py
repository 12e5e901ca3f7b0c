"""Catalog maintenance (OPTIMIZE/VACUUM, S12) and CSV export sink (S10)."""

from __future__ import annotations

import os
from datetime import date

from pyspark.sql import functions as F
from pyspark.sql import types as T

from certified_dogs_and_cats_spark.pipeline.export import (
    export_all,
    export_view_csv,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), False),
        T.StructField("v", T.IntegerType(), True),
    ]
)


def test_catalog_append_partitioned_roundtrip(catalog):
    catalog.register("t.part", SCHEMA, partition_by=("k",))
    df = catalog.spark.createDataFrame([("a", 1), ("b", 2)], SCHEMA)
    catalog.append("t.part", df)
    # Partition directories exist on disk (Hive layout).
    spec = catalog.tables["t.part"]
    assert any(d.startswith("k=") for d in os.listdir(spec.path))
    got = {r["k"]: r["v"] for r in catalog.table("t.part").collect()}
    assert got == {"a": 1, "b": 2}


def test_compact_preserves_data(catalog):
    catalog.register("t.c", SCHEMA)
    for i in range(3):
        catalog.append(
            "t.c", catalog.spark.createDataFrame([(f"k{i}", i)], SCHEMA)
        )
    catalog.compact("t.c")
    got = {r["k"]: r["v"] for r in catalog.table("t.c").collect()}
    assert got == {"k0": 0, "k1": 1, "k2": 2}


def test_vacuum_retention(catalog):
    catalog.register("t.v", SCHEMA)
    df1 = catalog.spark.createDataFrame([("a", 1)], SCHEMA)
    df2 = catalog.spark.createDataFrame([("b", 2)], SCHEMA)
    catalog.overwrite("t.v", df1)
    catalog.overwrite("t.v", df2)  # retires version 1 into _trash
    trash = catalog._trash_dir("t.v")
    assert len(os.listdir(trash)) == 1
    # Inside the retention window: nothing purged.
    assert catalog.vacuum("t.v", retain_hours=168) == 0
    assert len(os.listdir(trash)) == 1
    # RETAIN 0 HOURS purges the retired version; live data untouched.
    assert catalog.vacuum("t.v", retain_hours=0) == 1
    assert os.listdir(trash) == []
    assert [r["k"] for r in catalog.table("t.v").collect()] == ["b"]


def test_csv_export_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", 1), ("b", None)], SCHEMA
    )
    out = export_view_csv(df, str(tmp_path / "exports"), "v_demo", date(2026, 1, 2))
    assert out.endswith("v_demo/export_date=2026-01-02")
    back = (
        spark.read.schema(SCHEMA).option("header", True).csv(out)
    )
    got = {r["k"]: r["v"] for r in back.collect()}
    assert got == {"a": 1, "b": None}
    # Header really present in the part file.
    part = [f for f in os.listdir(out) if f.startswith("part-")][0]
    with open(os.path.join(out, part)) as f:
        assert f.readline().strip() == "k,v"


def test_export_all_idempotent_rerun(spark, tmp_path):
    df = spark.createDataFrame([("a", 1)], SCHEMA)
    root = str(tmp_path / "exports")
    d = date(2026, 1, 2)
    export_all({"v1": df, "v2": df}, root, d)
    paths = export_all({"v1": df, "v2": df}, root, d)  # re-run replaces
    assert set(paths) == {"v1", "v2"}
    back = spark.read.schema(SCHEMA).option("header", True).csv(paths["v1"])
    assert back.count() == 1


def test_overwrite_partitions_replaces_only_touched(catalog):
    catalog.register("t.dyn", SCHEMA, partition_by=("k",))
    catalog.append(
        "t.dyn",
        catalog.spark.createDataFrame([("a", 1), ("a", 2), ("b", 3)], SCHEMA),
    )
    # Refresh ONLY partition a with new content.
    n = catalog.overwrite_partitions(
        "t.dyn", catalog.spark.createDataFrame([("a", 99)], SCHEMA)
    )
    assert n == 1
    rows = sorted(tuple(r) for r in catalog.table("t.dyn").collect())
    assert rows == [("a", 99), ("b", 3)]  # b untouched, a fully replaced
    # The retired version of partition a is recoverable until vacuum.
    assert catalog.vacuum("t.dyn", retain_hours=0) == 1
    import pytest

    with pytest.raises(ValueError, match="unpartitioned"):
        catalog.register("t.flat", SCHEMA)
        catalog.overwrite_partitions(
            "t.flat", catalog.spark.createDataFrame([("a", 1)], SCHEMA)
        )


def test_overwrite_partitions_hive_encoded_values(catalog, spark):
    """Partition values whose directory encoding differs from Python's
    str() — NULL (__HIVE_DEFAULT_PARTITION__), escaped special characters
    (':'), booleans (true/false) — must still replace, not duplicate:
    the retired-dir set comes from Spark's own staged write."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("flag", T.BooleanType()),
            T.StructField("v", T.IntegerType()),
        ]
    )
    catalog.register("t.enc", schema, partition_by=("k", "flag"))
    rows1 = [(None, True, 1), ("a:b", False, 2), ("plain", True, 3)]
    catalog.append("t.enc", spark.createDataFrame(rows1, schema))
    # Overwrite the NULL and escaped partitions with fresh values.
    n = catalog.overwrite_partitions(
        "t.enc",
        spark.createDataFrame([(None, True, 10), ("a:b", False, 20)], schema),
    )
    assert n == 2
    got = sorted(
        ((r.k, r.flag, r.v) for r in catalog.table("t.enc").collect()),
        key=lambda t: (t[0] is not None, t),
    )
    # No duplicates: the old (None, True, 1) and ('a:b', False, 2) rows are
    # gone, 'plain' untouched.
    assert got == [(None, True, 10), ("a:b", False, 20), ("plain", True, 3)]


def test_overwrite_partitions_nondeterministic_df_single_eval(catalog, spark):
    """df is evaluated exactly once (staged write); the replaced set always
    matches what landed on disk even for a nondeterministic frame."""
    from pyspark.sql import functions as F

    schema = catalog.spark.createDataFrame([("a", 1)], "k string, v int").schema
    catalog.register("t.rand", schema, partition_by=("k",))
    catalog.append(
        "t.rand", spark.createDataFrame([("a", 1), ("b", 2)], schema)
    )
    # Partition key derived from rand(): two evaluations would disagree.
    nondet = (
        spark.range(4)
        .select(
            F.when(F.rand(seed=None) < 0.5, "a").otherwise("b").alias("k"),
            F.lit(100).alias("v"),
        )
    )
    catalog.overwrite_partitions("t.rand", nondet)
    rows = catalog.table("t.rand").collect()
    # Every k=100-partition that exists was fully replaced; no stale rows
    # (v in {1,2}) survive inside any partition that also has v=100 rows.
    by_k = {}
    for r in rows:
        by_k.setdefault(r.k, set()).add(r.v)
    for k, vs in by_k.items():
        assert vs == {100} or vs in ({1}, {2}), (k, vs)


def test_compact_cluster_by_sorts_rows_for_rowgroup_skipping(catalog, spark):
    """OPTIMIZE ZORDER analog: after compact(cluster_by=('_id',)) each
    partition's file holds _id in sorted order with non-overlapping
    row-group min/max ranges — the property parquet row-group skipping
    needs for pushed filters on _id."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("_id", T.IntegerType()),
            T.StructField("pad", T.StringType()),
        ]
    )
    catalog.register("t.opt", schema, partition_by=("k",))
    # Shuffled ids with padding so multiple row groups form under a tiny
    # block size.
    df = (
        spark.range(2000)
        .select(
            F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("k"),
            F.col("id").cast("int").alias("_id"),
            F.repeat(F.lit("x"), 64).alias("pad"),
        )
        .orderBy(F.md5(F.col("id").cast("string")))  # scramble order
        .repartition(4)
    )
    catalog.append("t.opt", df)
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    prev = hconf.get("parquet.block.size")
    hconf.set("parquet.block.size", "8192")
    try:
        catalog.compact("t.opt", cluster_by=("_id",))
    finally:
        if prev is None:
            hconf.unset("parquet.block.size")
        else:
            hconf.set("parquet.block.size", prev)
    spec = catalog.tables["t.opt"]
    import os as _os

    checked_files = 0
    multi_rg = False
    for part in sorted(_os.listdir(spec.path)):
        if not part.startswith("k="):
            continue
        files = [
            f
            for f in _os.listdir(_os.path.join(spec.path, part))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1  # compacted
        pf = pq.ParquetFile(_os.path.join(spec.path, part, files[0]))
        ids = pf.read(columns=["_id"])["_id"].to_pylist()
        assert ids == sorted(ids)
        if pf.metadata.num_row_groups > 1:
            multi_rg = True
            stats = [
                pf.metadata.row_group(i).column(0).statistics
                for i in range(pf.metadata.num_row_groups)
            ]
            for a, b in zip(stats, stats[1:]):
                assert a.max <= b.min  # disjoint ranges => skipping works
        checked_files += 1
    assert checked_files == 2
    assert multi_rg, "block size too large to form multiple row groups"


def test_fsa_choropleth_export_data_and_layout(catalog, raw_root):
    """S11 parity: per-type latest-year FSA files exist with the correct
    names and embed exactly the silver-derived counts (rendering falls back
    to the data-embedded HTML when Folium/geometry are absent)."""
    import json
    import re

    from conftest import CLOCK1, D1, DROP1, write_drop
    from certified_dogs_and_cats_spark.pipeline import build_daily_pipeline
    from certified_dogs_and_cats_spark.pipeline.export import (
        export_fsa_choropleths,
    )

    write_drop(raw_root, D1, DROP1)
    build_daily_pipeline(catalog, raw_root, clock=CLOCK1).run(
        ingestion_date=D1
    )
    out_dir = os.path.join(os.path.dirname(raw_root), "site_data")
    paths = export_fsa_choropleths(catalog, out_dir)
    assert [os.path.basename(p) for p in paths] == [
        "fsa_pets_latest_CAT.html",
        "fsa_pets_latest_DOG.html",
    ]
    # DROP1 latest year = 2025: CAT rows with valid FSA = M5E; DOG = M6F.
    cat_html = open(paths[0]).read()
    m = re.search(r"const FSA_DATA = (\[.*?\]);", cat_html)
    assert m and json.loads(m.group(1)) == [{"FSA": "M5E", "cnt": 1}]
    dog_html = open(paths[1]).read()
    m = re.search(r"const FSA_DATA = (\[.*?\]);", dog_html)
    assert m and json.loads(m.group(1)) == [{"FSA": "M6F", "cnt": 1}]


def test_orc_format_table_roundtrip(catalog, spark):
    """The catalog's fmt knob covers ORC (Spark built-in columnar
    alternative): append/read/time-travel identical to parquet."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("k", T.IntegerType()),
            T.StructField("v", T.StringType()),
        ]
    )
    catalog.register("t.orc", schema, fmt="orc")
    catalog.append("t.orc", spark.createDataFrame([(1, "a"), (2, "b")], schema))
    catalog.append("t.orc", spark.createDataFrame([(3, "c")], schema))
    assert sorted((r.k, r.v) for r in catalog.table("t.orc").collect()) == [
        (1, "a"),
        (2, "b"),
        (3, "c"),
    ]
    assert sorted(r.k for r in catalog.table("t.orc", version=1).collect()) == [
        1,
        2,
    ]


def test_jsonl_export_layout(catalog, spark, tmp_path):
    from datetime import date

    from certified_dogs_and_cats_spark.pipeline.export import (
        export_view_jsonl,
    )

    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    out = export_view_jsonl(
        df, str(tmp_path / "exports"), "tiny", date(2026, 1, 2),
        single_file=True,
    )
    assert "export_date=2026-01-02" in out
    import glob as _glob
    import json as _json

    [part] = _glob.glob(out + "/part-*")
    lines = [
        _json.loads(line)
        for line in open(part)
        if line.strip()
    ]
    assert sorted((d["k"], d["v"]) for d in lines) == [(1, "a"), (2, "b")]
