"""Shared helpers for query modules."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..session import configure_for_queries
from ..sources import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a testdata table with deterministic session confs applied."""
    configure_for_queries(spark)
    return load_table(spark, sf_dir, name)


# Canonical embeddings-normalization CTE shared by every oracle that
# scores cosine similarity (similarity.py, terms.py): ONE definition so
# the vector/norm derivation can never drift between oracles.
VEC_CTE = """
    v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings
    )
"""
