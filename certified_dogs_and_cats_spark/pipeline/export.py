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


def latest_year_fsa_counts(src: DataFrame, animal_type: str) -> DataFrame:
    """The choropleth dataset (reference README.md:84-86): per-FSA license
    counts for ONE animal type in the LATEST year present. One scan: counts
    are aggregated per (Year, FSA) FIRST, then the latest-year filter runs
    as a global window over the AGGREGATED frame — years x FSAs rows, so
    the single-partition window touches a dimension-sized frame, never the
    raw rows (the raw-row version would funnel the whole filtered fact
    table through one task at scale)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy(F.lit(1))
    return (
        src.filter(
            (F.col("ANIMAL_TYPE") == animal_type) & F.col("FSA").isNotNull()
        )
        .groupBy("Year", "FSA")
        .agg(F.count("*").alias("cnt"))
        .withColumn("max_year", F.max("Year").over(w))
        .filter(F.col("Year") == F.col("max_year"))
        .select("FSA", "cnt")
        .orderBy("FSA")
    )


def export_fsa_choropleths(
    catalog, out_dir: str, geojson_path: str | None = None
) -> list[str]:
    """S11: ``fsa_pets_latest_{CAT,DOG}.html`` map exports (reference
    README.md:84-86,124-126).

    The engine-grade part — the latest-year per-FSA dataset and the
    per-type file layout — is always real. Rendering is tiered like the
    Pillow-gated image decode: if Folium is importable AND an FSA-boundary
    GeoJSON is provided, a real choropleth is rendered; otherwise a
    self-contained HTML document embedding the same data as a JSON payload
    + table is written (the site can hydrate it client-side). Returns the
    written paths."""
    import json as _json

    from .analytics import gold_src
    from .refine import register_tables as register_silver_tables

    register_silver_tables(catalog)
    src = gold_src(catalog.table("core.licensed_pets_silver"))
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for animal_type in ("CAT", "DOG"):
        rows = latest_year_fsa_counts(src, animal_type).collect()
        data = [{"FSA": r["FSA"], "cnt": r["cnt"]} for r in rows]
        out = os.path.join(out_dir, f"fsa_pets_latest_{animal_type}.html")
        html = None
        if geojson_path is not None:
            try:
                import folium  # noqa: F401

                m = folium.Map(location=[43.7, -79.4], zoom_start=10)
                folium.Choropleth(
                    geo_data=geojson_path,
                    data={d["FSA"]: d["cnt"] for d in data},
                    key_on="feature.properties.CFSAUID",
                    fill_color="YlGn",
                ).add_to(m)
                html = m.get_root().render()
            except ImportError:
                html = None
        if html is None:
            payload = _json.dumps(data)
            table_rows = "".join(
                f"<tr><td>{d['FSA']}</td><td>{d['cnt']}</td></tr>"
                for d in data
            )
            html = (
                "<!DOCTYPE html><html><head><meta charset='utf-8'>"
                f"<title>FSA {animal_type} licenses (latest year)</title>"
                "</head><body>"
                f"<h1>{animal_type} licenses by FSA (latest year)</h1>"
                f"<script>const FSA_DATA = {payload};</script>"
                "<table><tr><th>FSA</th><th>count</th></tr>"
                f"{table_rows}</table></body></html>"
            )
        with open(out, "w") as f:
            f.write(html)
        written.append(out)
    return written


def export_view_jsonl(
    df: DataFrame,
    export_root: str,
    view_name: str,
    export_date: date,
    single_file: bool = False,
) -> str:
    """JSONL export sink — the interchange format training-data pipelines
    emit (one JSON object per line, consumed by loaders/tokenizers
    downstream). Same layout contract as :func:`export_view_csv`
    (``exports/<view>/export_date=D/``, overwrite-idempotent); the write
    is a distributed ``DataFrameWriter.json`` — each task streams its
    partition, nothing driver-side. Timestamps serialize in the same
    round-trippable format as the CSV sink."""
    out = os.path.join(
        export_root, view_name, f"export_date={export_date.isoformat()}"
    )
    writer = df.coalesce(1) if single_file else df
    (
        writer.write.mode("overwrite")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .json(out)
    )
    return out


def export_view_orc(
    df: DataFrame,
    export_root: str,
    view_name: str,
    export_date: date,
    single_file: bool = False,
    compression: str = "zstd",
) -> str:
    """ORC export sink — the columnar interchange format for warehouse
    consumers that aren't parquet-native (Hive/Trino/Presto estates).
    Same layout contract as :func:`export_view_csv`
    (``exports/<view>/export_date=D/``, overwrite-idempotent); ORC is a
    first-class Spark source, so the write is distributed columnar
    encoding with predicate-pushdown-capable footers — a reader gets
    min/max stripe skipping for free. Default codec zstd (best
    size/speed on modern hardware; 'snappy'/'zlib'/'lz4' accepted)."""
    out = os.path.join(
        export_root, view_name, f"export_date={export_date.isoformat()}"
    )
    writer = df.coalesce(1) if single_file else df
    writer.write.mode("overwrite").option("compression", compression).orc(
        out
    )
    return out
