"""Corrupt-record quarantine ingest (sources/quarantine.py)."""

from __future__ import annotations

from pyspark.sql import types as T

from certified_dogs_and_cats_spark.sources import read_csv_quarantine

SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("name", T.StringType()),
        T.StructField("amt", T.DoubleType()),
    ]
)


def _write(tmp_path, name, lines):
    p = tmp_path / name
    p.write_text("\n".join(lines) + "\n")
    return str(tmp_path)


def test_split_good_and_bad(spark, tmp_path):
    _write(
        tmp_path,
        "drop.csv",
        [
            "id,name,amt",
            "1,alpha,1.5",
            "2,beta,not_a_number",   # uncastable amt
            "3,gamma,3.25",
            "oops_only_one_field",   # wrong arity
        ],
    )
    good, bad = read_csv_quarantine(spark, str(tmp_path), SCHEMA)
    assert sorted((r.id, r.name, r.amt) for r in good.collect()) == [
        (1, "alpha", 1.5),
        (3, "gamma", 3.25),
    ]
    raws = {r.raw for r in bad.collect()}
    assert raws == {"2,beta,not_a_number", "oops_only_one_field"}
    assert all(r.src_file.endswith("drop.csv") for r in bad.collect())
    assert all("malformed" in r.reason for r in bad.collect())


def test_clean_drop_quarantines_nothing(spark, tmp_path):
    _write(tmp_path, "ok.csv", ["id,name,amt", "1,a,1.0", "2,b,2.0"])
    good, bad = read_csv_quarantine(spark, str(tmp_path), SCHEMA)
    assert good.count() == 2
    assert bad.count() == 0


def test_good_frame_drops_bookkeeping_columns(spark, tmp_path):
    _write(tmp_path, "ok.csv", ["id,name,amt", "1,a,1.0"])
    good, _ = read_csv_quarantine(spark, str(tmp_path), SCHEMA)
    assert good.columns == ["id", "name", "amt"]
