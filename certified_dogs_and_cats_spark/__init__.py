"""certified_dogs_and_cats_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference lakehouse project ``xprsayeem/Certified-Dogs-and-Cats``
(surveyed in /root/repo/SURVEY.md), plus large-scale training-data-pipeline
extensions (dedup, similarity search, text analysis, multimodal columns).

Layout
------
- ``session``      SparkSession builder (local testing; cluster-safe confs)
- ``sources``      readers/writers: CSV with declared schema, parquet tables,
                   partitioned sinks, the driver testdata catalog
- ``functions``    scalar-function library (key normalization, validation,
                   deterministic hashing) — pure built-in `F.*`, no UDFs
- ``operators``    relational operators the reference exercises: idempotent
                   anti-join append, broadcast dim lookup with fallback,
                   window dedup, top-k rank, pivot top-k, merge upsert
- ``plans``        plan-inspection helpers (assert broadcast, assert pushdown)
- ``pipeline``     bronze -> silver -> gold staged ETL with guards, control
                   table, retries (reference Workflow semantics), SQL DDL
                   front door, CSV export, OPTIMIZE/VACUUM maintenance;
                   explicit StructTypes live in ``pipeline.schemas``
- ``streaming``    Structured Streaming equivalents (Trigger.AvailableNow
                   incremental ingest, stateful dedup, watermarked windows)
- ``extensions``   dedup (exact/minhash/simhash/jaccard/embedding-cosine),
                   similarity search (cosine top-k, sign-LSH, learned IVF),
                   text analysis, multimodal binary columns
- ``queries``      the driver-facing query registry: every operator from
                   SURVEY.md §2 as a (Spark callable, DuckDB oracle SQL) pair
"""

__version__ = "0.1.0"
