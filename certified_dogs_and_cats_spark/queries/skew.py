"""Driver evidence for the skew-spreading salted join.

``salted_join`` is result-identical to a plain equi-join by construction
(the salt only spreads a hot key's rows across ``n_salts`` reducers), so
the oracle is simply the unsalted SQL join — a green hash row proves the
salting machinery changes the shuffle layout and nothing else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import dsum
from ..operators.joins import salted_join
from .common import t
from .registry import query


@query(
    "skew_salted_join_agg",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def skew_salted_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders joined to the customer dim through ``salted_join`` (the
    escape hatch for keys hotter than AQE's skew-split can handle), then
    rolled up by market segment. The salt spreads each customer key over
    16 reducers; the aggregate proves values are byte-identical to the
    plain join. The small side is deliberately NOT broadcast here — the
    operator exists precisely for dims too big to broadcast."""
    orders = t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = (
        t(spark, sf_dir, "customer")
        .select(
            F.col("c_custkey").alias("o_custkey"),
            "c_mktsegment",
        )
        .hint("merge")  # force the non-broadcast path the operator targets
    )
    j = salted_join(orders, cust, "o_custkey", n_salts=16)
    return j.groupBy("c_mktsegment").agg(
        F.count("*").cast("long").alias("n_orders"),
        dsum("o_totalprice").alias("total_price"),
    )
