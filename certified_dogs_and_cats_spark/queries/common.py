"""Shared helpers for query modules."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..session import configure_for_queries
from ..sources import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a testdata table with deterministic session confs applied."""
    configure_for_queries(spark)
    return load_table(spark, sf_dir, name)
