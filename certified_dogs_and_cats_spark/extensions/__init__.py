"""Training-data-pipeline extensions (north star, BASELINE.json).

Operators a 100 TB LLM-data pipeline needs beyond the reference's surface:

- ``dedup``       exact + near-duplicate detection (df-capped shingle
                  Jaccard, MinHash+LSH, SimHash + banded hamming search,
                  embedding-cosine)
- ``similarity``  embedding similarity search (brute-force cosine top-k,
                  sign-LSH bucketed ANN, learned IVF inverted lists)
- ``text``        language ID, quality scoring, token stats, fingerprinting
- ``bpe``         distributed BPE tokenizer training (word-histogram
                  collapse + per-round broadcast merge rules)
- ``multimodal``  opaque binary columns + typed metadata, Arrow-batched
                  mapInPandas decode/feature plumbing (codec-requiring
                  decode stubbed — no image libs in this container)
- ``sampling``    deterministic hash train/val/test split and n-per-group
                  subsampling (pure functions of the id — stable under
                  corpus growth and repartitioning)

Everything is built from JVM-side ``pyspark.sql.functions`` (no Python UDFs
on hot paths); determinism comes from md5-based hashing so results are
reproducible across engines and cluster runs.
"""
