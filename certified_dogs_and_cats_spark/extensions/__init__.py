"""Training-data-pipeline extensions (north star, BASELINE.json).

Operators a 100 TB LLM-data pipeline needs beyond the reference's surface:

- ``dedup``       exact + near-duplicate detection (shingle Jaccard,
                  MinHash+LSH, SimHash)
- ``similarity``  embedding similarity search (brute-force cosine top-k,
                  sign-LSH bucketed ANN)
- ``text``        language ID, quality scoring, token stats, fingerprinting
- ``multimodal``  opaque binary columns + typed metadata, Pandas-UDF
                  decode/feature plumbing (decode itself stubbed — no image
                  libs in this container)

Everything is built from JVM-side ``pyspark.sql.functions`` (no Python UDFs
on hot paths); determinism comes from md5-based hashing so results are
reproducible across engines and cluster runs.
"""
