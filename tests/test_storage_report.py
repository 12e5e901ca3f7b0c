"""Column-level storage attribution (pipeline/skipping.py:
column_storage_stats + Catalog.column_storage_report): exact byte parity
with DuckDB's parquet_metadata over the same footers."""

from __future__ import annotations

import os

import duckdb
import pytest

SF_FILE = "/root/testdata/sf0.01/documents.parquet"


@pytest.mark.skipif(
    not os.path.isfile(SF_FILE), reason="driver testdata not present"
)
def test_exact_parity_with_duckdb_parquet_metadata():
    from certified_dogs_and_cats_spark.pipeline.skipping import (
        column_storage_stats,
    )

    path = SF_FILE
    ours = column_storage_stats(path)
    theirs = {
        r[0]: (int(r[1]), int(r[2]), int(r[3]))
        for r in duckdb.sql(
            f"""SELECT path_in_schema,
                       sum(total_compressed_size),
                       sum(total_uncompressed_size),
                       sum(num_values)
                FROM parquet_metadata('{path}') GROUP BY 1"""
        ).fetchall()
    }
    assert set(ours) == set(theirs)
    for col, v in ours.items():
        assert (
            v["compressed_bytes"],
            v["uncompressed_bytes"],
            v["n_values"],
        ) == theirs[col], col


def test_catalog_report_sums_live_files_with_share(spark, tmp_path):
    from certified_dogs_and_cats_spark.pipeline import Catalog

    cat = Catalog(spark, str(tmp_path / "wh"))
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("k", T.LongType(), True),
            T.StructField("txt", T.StringType(), True),
        ]
    )
    cat.register("core.t", schema)
    # varied text (constant strings dictionary-encode to ~nothing)
    cat.append(
        "core.t",
        spark.createDataFrame(
            [(i, f"first batch row {i} " * 10) for i in range(500)], schema
        ),
    )
    cat.append(
        "core.t",
        spark.createDataFrame(
            [(i, f"second batch row {i} " * 10) for i in range(500)], schema
        ),
    )
    rows = {r.column: r for r in cat.column_storage_report("core.t").collect()}
    assert set(rows) == {"k", "txt"}
    assert rows["k"].n_values == 1000 and rows["txt"].n_values == 1000
    assert abs(sum(r.share for r in rows.values()) - 1.0) < 1e-6
    # the 200-char text column must dominate the bytes
    assert rows["txt"].share > rows["k"].share
