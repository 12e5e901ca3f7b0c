"""Explicit schemas for every pipeline table (schema-on-write, never infer).

Mirrors the reference's declared StructTypes and DDL (notebooks/bronze.py:11-19,
131-146; notebooks/silver.py:141-161; sql/breed_mapping.py:6-11;
notebooks/bronze.py:41-47)."""

from __future__ import annotations

from pyspark.sql import types as T

# Raw CSV drop: raw/licensed_pets/ingestion_date=YYYY-MM-DD/*.csv
RAW_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.IntegerType(), False),
        T.StructField("Year", T.IntegerType(), True),
        T.StructField("FSA", T.StringType(), True),
        T.StructField("ANIMAL_TYPE", T.StringType(), True),
        T.StructField("PRIMARY_BREED", T.StringType(), True),
    ]
)

BRONZE_SCHEMA = T.StructType(
    list(RAW_SCHEMA.fields)
    + [
        T.StructField("FSA_VALID", T.BooleanType(), True),
        T.StructField("ingestion_ts", T.TimestampType(), True),
        T.StructField("ingestion_date", T.DateType(), True),
    ]
)

SILVER_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.IntegerType(), False),
        T.StructField("Year", T.IntegerType(), True),
        T.StructField("FSA", T.StringType(), True),
        T.StructField("FSA_VALID", T.BooleanType(), True),
        T.StructField("ANIMAL_TYPE", T.StringType(), True),
        T.StructField("breed_raw", T.StringType(), True),
        T.StructField("breed_variant_key", T.StringType(), True),
        T.StructField("breed_standard", T.StringType(), True),
        T.StructField("breed_mapped", T.BooleanType(), True),
        T.StructField("ingestion_ts", T.TimestampType(), True),
        T.StructField("ingestion_date", T.DateType(), True),
        T.StructField("processed_ts", T.TimestampType(), True),
    ]
)

LOAD_CONTROL_SCHEMA = T.StructType(
    [
        T.StructField("dataset", T.StringType(), False),
        T.StructField("ingestion_date", T.DateType(), False),
        T.StructField("loaded_ts", T.TimestampType(), False),
    ]
)

BREED_MAPPING_SCHEMA = T.StructType(
    [
        T.StructField("breed_variant_key", T.StringType(), False),
        T.StructField("breed_standard", T.StringType(), False),
    ]
)

FSA_PATTERN = "^[A-Z][0-9][A-Z]$"
ANIMAL_TYPES = ("DOG", "CAT")
