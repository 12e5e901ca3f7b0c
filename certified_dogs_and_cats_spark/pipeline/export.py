"""CSV export sink (reference S10: README.md:81-82,117-123).

The reference's export job writes each gold view to headered CSV under
``exports/<view>/export_date=YYYY-MM-DD/``. Same layout here, via the
standard DataFrameWriter so the export is distributed; ``single_file=True``
coalesces to one part file for small presentation views (the reference's
website inputs), which is a driver-side convenience, not the scale path.
"""

from __future__ import annotations

import os
from collections.abc import Mapping
from datetime import date

from pyspark.sql import DataFrame


def export_view_csv(
    df: DataFrame,
    export_root: str,
    view_name: str,
    export_date: date,
    single_file: bool = False,
) -> str:
    """Write one view to exports/<view>/export_date=D/ as headered CSV.
    Returns the output directory. Re-running the same (view, date) replaces
    the previous export (idempotent, like the reference's daily job)."""
    out = os.path.join(
        export_root, view_name, f"export_date={export_date.isoformat()}"
    )
    writer = df.coalesce(1) if single_file else df
    (
        writer.write.mode("overwrite")
        .option("header", True)
        # Timestamps serialized in a DuckDB/Spark round-trippable format.
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .csv(out)
    )
    return out


def export_all(
    views: Mapping[str, DataFrame],
    export_root: str,
    export_date: date,
    single_file: bool = True,
) -> dict[str, str]:
    """Export every view in the mapping; returns view -> output dir."""
    return {
        name: export_view_csv(df, export_root, name, export_date, single_file)
        for name, df in views.items()
    }
