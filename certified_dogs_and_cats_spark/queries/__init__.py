"""Driver-facing query registry.

Every operator from SURVEY.md §2 (plus the training-data-pipeline
extensions) is registered here as a pair:

- a Spark callable ``(spark, sf_dir) -> DataFrame``
- an equivalent ANSI-SQL string DuckDB runs on the same parquet tables

The driver compares both at sf=0.01 (row count + schema + order-insensitive
value hash), so columns are aliased identically on both sides and all
engine-variant types are pinned with explicit CASTs (BIGINT counts, INTEGER
years, DOUBLE ratios). Money sums use the exact DECIMAL-sum-then-DOUBLE
pattern (see functions.scalar.dsum) so values are bit-identical regardless
of aggregation order.
"""

from __future__ import annotations

from .registry import ORACLE, QUERIES, query

# Import for registration side effects.
#
# ORDER MATTERS for driver evidence: the driver's correctness run checks the
# first 50 registry entries in insertion order. Modules whose queries have
# not yet received a driver CORRECTNESS row (and modules holding this
# round's new queries) register FIRST; the displaced tail (parts of core,
# gold, similarity, text, multimodal) is already proven by r03 driver rows
# and stays pinned by scripts/check_correctness.py + pytest, which always
# cover all entries. Round-4 composition: 41 must-have entries + 9
# r03-proven core fill the 50-slot window.
from . import olap  # noqa: E402,F401
from . import sampling  # noqa: E402,F401
from . import streaming  # noqa: E402,F401
from . import pipeline_e2e  # noqa: E402,F401
from . import winnow  # noqa: E402,F401
from . import quality  # noqa: E402,F401
from . import chunking  # noqa: E402,F401
from . import dedup  # noqa: E402,F401
from . import core  # noqa: E402,F401
from . import gold  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import text  # noqa: E402,F401
from . import multimodal  # noqa: E402,F401
from . import vocab  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLE", "query"]
