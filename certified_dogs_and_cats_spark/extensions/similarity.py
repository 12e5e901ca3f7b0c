"""Embedding similarity search over ``array<float>`` columns.

Three strategies:

- brute-force cosine top-k: the exactness baseline. Query set is broadcast;
  the corpus streams once; per-pair cost is one fused zip_with/aggregate
  fold (JVM codegen — no Python). O(|Q| * N * d): right answer whenever
  |Q| is small or recall must be 1.0.
- sign-LSH bucketed ANN: bucket every vector by the sign pattern of its
  leading components (a fixed, data-independent set of separating
  hyperplanes — deterministic, no fitted state); search only inside the
  query's bucket. At 100 TB: buckets become the shuffle/partition key, each
  bucket is searched independently, and recall/cost is tuned by the number
  of sign bits.
- learned IVF: KMeans centroids as inverted-list ids
  (:func:`build_ivf_index`), nprobe-nearest lists searched per query
  (:func:`ivf_topk`) — the data-adaptive upgrade of the sign buckets;
  cost per query is ~nprobe * N / n_centroids.

All arithmetic is double-precision with a fixed fold order, so scores are
bit-reproducible across runs, partitionings, and engines (validated against
DuckDB's list_dot_product).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..operators.partitioning import spread


def as_double_vec(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def pool_embeddings(
    df: DataFrame,
    group_col: str,
    vec_col: str = "e",
    weight_col: str | None = None,
    mode: str = "mean",
) -> DataFrame:
    """(group, pooled) — pool many vectors per group into one: the
    chunk-embeddings -> document-embedding step that closes the
    chunk/embed loop (chunk_tokens splits docs, an embedder vectorizes
    chunks, this folds them back).

    ``mode``: 'mean' (optionally ``weight_col``-weighted — e.g. chunk
    token counts, so long chunks count proportionally) or 'max'
    (element-wise max pooling).

    Plan shape: one posexplode to (group, dim, value) rows, one hash
    aggregate on (group, dim), one collect back to an ordered array —
    rows scale as |vectors| x dim with map-side partial aggregation,
    which beats collecting whole vector lists per group (unbounded group
    size would balloon a single aggregation buffer; per-dimension rows
    never do). CONTRACT: vectors within a group must share one dimension
    — a shorter vector simply contributes to fewer positions (its tail
    positions average over the remaining vectors only), with no error
    signal; validate dims upstream when mixing embedder versions.
    """
    if mode not in ("mean", "max"):
        raise ValueError(f"mode must be 'mean' or 'max': {mode}")
    cols = [F.col(group_col), F.posexplode(as_double_vec(vec_col))]
    if weight_col is not None:
        cols.insert(1, F.col(weight_col).cast("double").alias("__w"))
    exploded = df.select(*cols).withColumnRenamed("col", "v")
    if mode == "max":
        per_dim = exploded.groupBy(group_col, "pos").agg(
            F.max("v").alias("pv")
        )
    elif weight_col is not None:
        per_dim = exploded.groupBy(group_col, "pos").agg(
            (F.sum(F.col("v") * F.col("__w")) / F.sum("__w")).alias("pv")
        )
    else:
        per_dim = exploded.groupBy(group_col, "pos").agg(
            F.avg("v").alias("pv")
        )
    return per_dim.groupBy(group_col).agg(
        F.array_sort(F.collect_list(F.struct("pos", "pv")))
        .getField("pv")
        .alias("pooled")
    )


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic order).

    Measured alternative, rejected: unrolling the fold into a flat
    129-node sum for the known dim (a[0]*b[0] + ...) benched 2x FASTER
    in an isolated projection but 3-5x SLOWER inside the real join
    pipelines — the giant expression tree blows past the codegen method
    limits there and falls back to per-node interpreted eval, which
    loses to the specialized array fold. Keep the fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def with_norm(df: DataFrame, vec_col: str = "e", norm_col: str = "nrm") -> DataFrame:
    v = F.col(vec_col)
    return df.withColumn(norm_col, F.sqrt(dot(v, v)))


def sign_bucket(vec_col: str | Column, bits: int = 8, offset: int = 0) -> Column:
    """Deterministic LSH bucket: '1'/'0' per sign of `bits` dims starting
    at `offset` — distinct offsets give independent re-bucketings of the
    same vectors (multi-probe OR candidates, see dedup)."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    parts = [
        F.when(c[offset + i] >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(bits)
    ]
    return F.concat(*parts)


#: Value-hash bucket count for deterministic sampling. Must be coarse
#: enough that ``fraction * _SAMPLE_BUCKETS`` keeps resolution when the
#: fraction is ``train_limit / n`` at the 100 TB target: a 1e6 modulus
#: floors the threshold to 0 (an EMPTY training sample) once the corpus
#: passes ~train_limit * 1e6 rows, and distorts small samples up to 2x
#: from flooring. 1e12 buckets push the floor past 1e15 rows — but a
#: 64-bit hash is then mandatory: Spark's ``F.hash`` is 32-bit Murmur3,
#: so ``pmod(hash, 1e12)`` would be the identity on [0, 2^31) and every
#: fraction above ~0.002 would select the whole corpus.
_SAMPLE_BUCKETS = 1_000_000_000_000


def _value_hash_sample(df: DataFrame, col: str, fraction: float, seed: int) -> DataFrame:
    """Deterministic training sample: keep rows whose VALUE-hash bucket
    falls under ``fraction``. ``DataFrame.sample()`` draws from
    partition-local RNG streams, so the selected subset — and therefore
    trained centroids and measured recall — would shift with the input's
    partition layout or Spark version even at a fixed seed (the same
    latent trap the sorted-collect fix closed for row ORDER). A pure
    function of the row value replays identically on any layout.

    The keep-threshold is clamped to >= 1 bucket so a positive fraction
    can never resolve to an empty sample regardless of corpus size (the
    degenerate-KMeans failure mode this exists to prevent)."""
    bucket = F.pmod(
        F.xxhash64(F.col(col), F.lit(seed)), F.lit(_SAMPLE_BUCKETS)
    )
    return df.filter(bucket < F.lit(_sample_threshold(fraction)))


def _sample_threshold(fraction: float) -> int:
    """Keep-threshold in buckets, clamped to >= 1: ``train_limit / n``
    at extreme n must floor to a 1-bucket sample, never an empty one."""
    return max(1, int(fraction * _SAMPLE_BUCKETS))


def _absolute_train_fraction(
    corpus: DataFrame, train_fraction: float, train_limit: int | None
) -> float:
    """The FAISS training contract: KMeans centroid/codebook quality
    SATURATES with sample size, so index (re)builds should pay a
    BOUNDED absolute sample — never a constant fraction, which at the
    100 TB target turns every rebuild into max_iter passes over tens of
    TB. ``train_limit`` converts to the fraction that yields ~that many
    rows using the corpus row count (a zero-column parquet scan:
    footer-metadata-sized, not a data read), then composes with any
    explicit ``train_fraction`` by taking the smaller. The selection
    stays a value-hash filter — a pure function of row values, so the
    trained model is identical on any partition layout."""
    if train_limit is None:
        return train_fraction
    if train_limit <= 0:
        raise ValueError(f"train_limit must be positive, got {train_limit}")
    n = corpus.count()
    if n <= train_limit:
        return min(train_fraction, 1.0)
    return min(train_fraction, train_limit / n)


def _rank_topk(pairs: DataFrame, k: int, round_digits: int) -> DataFrame:
    """Shared scoring + ranking tail of every search strategy: rounded
    cosine from the (qe, ne, qnrm, nnrm) pair columns, deterministic
    (score desc, id asc) tie-break, top-k filter. ONE implementation so
    rounding/tie-break semantics can never drift between the brute-force,
    LSH, and IVF paths."""
    cos = F.round(
        dot(F.col("qe"), F.col("ne")) / (F.col("qnrm") * F.col("nnrm")),
        round_digits,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.select("query_id", "neighbor_id", cos.alias("cos_sim"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "e",
    round_digits: int = 6,
    max_queries: int | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, neighbor_id, cos_sim, rnk). Scores are rounded before
    ranking and ties broken by neighbor id, so the result set is unique.
    `queries` is broadcast: the big corpus never shuffles for the join.

    Scale contract: this is the |Q|-small exactness baseline — compute is
    O(|Q| * N * d) and the query set is broadcast, so |Q| must stay bounded
    (hundreds, not a fraction of the corpus). Pass ``max_queries`` to enforce
    the bound (deterministic lowest-id subset); route bulk ANN through
    :func:`lsh_bucketed_topk`, whose cost per query is N/2^bits.
    """
    if max_queries is not None:
        queries = queries.orderBy(F.col(id_col).asc()).limit(max_queries)
    q = with_norm(queries, vec_col, "qnrm").select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qe"),
        "qnrm",
    )
    # The per-pair dot-product fold runs in the corpus scan stage; spread
    # so a single-row-group local corpus doesn't serialize |Q|*N folds.
    c = with_norm(spread(corpus), vec_col, "nnrm").select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("ne"),
        "nnrm",
    )
    pairs = c.crossJoin(F.broadcast(q)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    return _rank_topk(pairs, k, round_digits)


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "e",
    bits: int = 8,
    round_digits: int = 6,
) -> DataFrame:
    """Approximate top-k: search only the query's sign-LSH bucket.

    Same output shape as cosine_topk; the join key is (bucket) and the join
    is deliberately NOT broadcast-hinted: both sides shuffle on `bucket`, so
    the query side may grow with the corpus without blowing up driver or
    executor memory, and AQE may still choose broadcast when the query side
    happens to be small. Recall/cost is tuned by `bits`: per-query work is
    ~N/2^bits, so scale bits with log2(N) (8 bits ~ 256 buckets fits the
    sf0.1 testdata; a 1e9-vector corpus wants 16-20 bits or IVF centroids
    via a custom `bucket` expression).
    """
    q = with_norm(queries, vec_col, "qnrm").select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qe"),
        "qnrm",
        sign_bucket(vec_col, bits).alias("bucket"),
    )
    # Same single-row-group mitigation as cosine_topk: the per-pair dot
    # fold runs in the corpus scan stage.
    c = with_norm(spread(corpus), vec_col, "nnrm").select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("ne"),
        "nnrm",
        sign_bucket(vec_col, bits).alias("bucket"),
    )
    pairs = c.join(q, "bucket").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    return _rank_topk(pairs, k, round_digits)


def _lloyd_fit_local(rows, k: int, seed: int, max_iter: int):
    """Driver-side kmeans++ seeding + Lloyd iterations over a BOUNDED
    training sample (plain float lists). Deterministic given (rows, k,
    seed). This is the FAISS-style trainer shape: centroid quality
    saturates on a small sample, so when the sample fits the driver the
    whole fit is a few ms of numpy instead of several distributed MLlib
    jobs — the distributed fit only earns its overhead when the training
    sample itself must stay distributed (see the callers' caps).
    Assignment is chunked so memory stays at chunk*k, never n*k."""
    import numpy as np

    x = np.asarray(rows, dtype=np.float64)
    rng = np.random.default_rng(seed)
    n = x.shape[0]
    k = min(k, n)
    centers = np.empty((k, x.shape[1]))
    centers[0] = x[int(rng.integers(n))]
    d2 = ((x - centers[0]) ** 2).sum(1)
    for i in range(1, k):
        tot = float(d2.sum())
        if tot <= 0.0:
            centers[i] = x[int(rng.integers(n))]
        else:
            centers[i] = x[int(rng.choice(n, p=d2 / tot))]
        d2 = np.minimum(d2, ((x - centers[i]) ** 2).sum(1))
    assign = np.empty(n, dtype=np.int64)
    for _ in range(max_iter):
        for s in range(0, n, 8192):
            blk = x[s : s + 8192]
            d = ((blk[:, None, :] - centers[None, :, :]) ** 2).sum(2)
            assign[s : s + 8192] = d.argmin(1)
        new = centers.copy()
        for i in range(k):
            members = assign == i
            if members.any():
                new[i] = x[members].mean(0)
            else:  # deterministic reseed of an emptied cluster
                new[i] = x[int(rng.integers(n))]
        if np.array_equal(new, centers):
            break
        centers = new
    return [[float(v) for v in c] for c in centers]


def _assign_nearest(vec_col: str, centers: list[list[float]]):
    """centroid_id column: argmin of squared L2 against the centroid
    literal — a pure map-side projection (the model IS the literal, no
    join, no shuffle), first-min tie-break for determinism."""
    cb = _pq_literal(centers)
    dists = F.transform(
        cb,
        lambda c: F.aggregate(
            F.zip_with(F.col(vec_col), c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def build_ivf_index(
    corpus: DataFrame,
    n_centroids: int,
    id_col: str = "vec_id",
    vec_col: str = "e",
    seed: int = 42,
    max_iter: int = 20,
    train_fraction: float = 1.0,
    init_mode: str = "k-means||",
    local_train_cap: int = 100_000,
    train_limit: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Learned IVF index: KMeans centroids + per-vector inverted-list id.

    Returns ``(indexed_corpus, centroids)`` where indexed_corpus carries a
    ``centroid_id`` partition key and centroids is a tiny
    (centroid_id, centroid: array<double>) table.

    Scale contract: training runs on a sample (KMeans over 100 TB is
    unnecessary — centroid quality saturates quickly), assignment is one
    broadcast-centroid pass over the corpus, and the resulting
    ``centroid_id`` becomes the shuffle/partition/bucketing key for all
    subsequent searches — the learned-quantizer upgrade of sign_bucket's
    data-independent hyperplanes.

    Trainer routing: when the (sampled) training set has at most
    ``local_train_cap`` rows it is collected and fit with the
    driver-side seeded Lloyd (:func:`_lloyd_fit_local` — a 100k x 64
    sample is ~50 MB and fits in ms, where the distributed fit pays
    several whole-cluster jobs), and corpus assignment becomes a pure
    map-side argmin projection against the centroid literal. Larger
    samples keep the distributed MLlib fit.
    """
    spark = corpus.sparkSession
    sample = corpus.select(F.col(vec_col).cast("array<double>").alias("v"))
    train_fraction = _absolute_train_fraction(
        corpus, train_fraction, train_limit
    )
    if train_fraction < 1.0:
        sample = _value_hash_sample(sample, "v", train_fraction, seed)
    probe = sample.limit(local_train_cap + 1).collect()
    if len(probe) <= local_train_cap:
        # Not truncated -> `probe` IS the full sample SET, but Spark does
        # not guarantee a stable row ORDER for limit/collect across
        # partition layouts, and _lloyd_fit_local's kmeans++ seeding
        # indexes rows by position — sort by vector value so the trained
        # centroids are a pure function of the data, not the scheduler.
        rows = sorted(r["v"] for r in probe)
        if not rows:
            raise ValueError("empty corpus: nothing to train on")
        centers = _lloyd_fit_local(rows, n_centroids, seed, max_iter)
        centroids = spark.createDataFrame(
            list(enumerate(centers)), "centroid_id INT, centroid ARRAY<DOUBLE>"
        )
        indexed = corpus.select(
            F.col(id_col),
            F.col(vec_col),
            _assign_nearest(vec_col, centers).alias("centroid_id"),
        )
        return indexed, centroids
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    train = sample.select(array_to_vector(F.col("v")).alias("features"))
    # init_mode="random" halves the fit cost (k-means|| pays several
    # extra passes for seeding); with enough iterations the centroid
    # quality difference is marginal for list assignment.
    model = KMeans(
        k=n_centroids, seed=seed, maxIter=max_iter, initMode=init_mode
    ).fit(train)
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "centroid_id INT, centroid ARRAY<DOUBLE>",
    )
    assigned = model.transform(
        corpus.withColumn("features", array_to_vector(F.col(vec_col)))
    )
    indexed = assigned.select(
        F.col(id_col),
        vector_to_array(F.col("features")).alias(vec_col),
        F.col("prediction").alias("centroid_id"),
    )
    return indexed, centroids


#: Below this corpus size the probed-list prune's extra job (the probes
#: subtree runs twice: once to collect the probed-list set, once for the
#: search join) costs more than the scan it avoids — measured ~0.2 s
#: fixed vs ~0 saved at 2k vectors / 8 lists (round-10 profile). Above
#: it, sqrt(N) lists make the prune remove ~(1 - nprobe/sqrt(N)) of the
#: corpus from the shuffle — decisive at any warehouse scale.
IVF_PRUNE_MIN_ROWS = 100_000


def ivf_topk(
    indexed_corpus: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "e",
    round_digits: int = 6,
    corpus_rows: int | None = None,
) -> DataFrame:
    """Approximate top-k via IVF: probe the ``nprobe`` nearest inverted
    lists per query, exact cosine only within probed lists.

    The centroid table is genuinely tiny (n_centroids rows) so the
    query-to-centroid assignment broadcast is safe at any corpus size.
    The corpus is pruned to the UNION of probed lists first (a broadcast
    semi-join on the distinct probed ``centroid_id`` set — directory-read
    shaped, the in-memory analogue of the materialized index's partition
    pruning), per-vector work (the norm projection) runs once per probed
    vector, and only then does the tiny probes relation broadcast-fan the
    vectors out to their queries — the same decode-once ordering as
    :func:`ivfpq_topk`. The naive order (corpus shuffle-joined to probes,
    norms below the join) moved every fat array row of every UNPROBED
    list through the shuffle as well; per-list work stays
    ~nprobe * N/C either way, but nothing outside probed lists moves.
    Recall is tuned by (n_centroids, nprobe) independent of corpus size.

    ``corpus_rows`` (optional, metadata the caller usually already has)
    gates the prune: below ``IVF_PRUNE_MIN_ROWS`` the whole corpus flows
    either way, so the prune's fixed extra job is skipped. None (size
    unknown) keeps the prune — the safe default at scale.
    """
    q = with_norm(queries, vec_col, "qnrm").select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qe"), "qnrm"
    )
    # Rank centroids per query by (exact) distance; keep the nprobe nearest.
    dist = F.aggregate(
        F.zip_with(
            F.col("qe"), F.col("centroid"), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w_probe = Window.partitionBy("query_id").orderBy(
        F.col("centroid_dist").asc(), F.col("centroid_id").asc()
    )
    probes = (
        q.crossJoin(F.broadcast(centroids))
        .select("query_id", "qe", "qnrm", "centroid_id", dist.alias("centroid_dist"))
        .withColumn("probe_rnk", F.row_number().over(w_probe))
        .filter(F.col("probe_rnk") <= nprobe)
        .select("query_id", "qe", "qnrm", "centroid_id")
    )
    pruned = indexed_corpus
    if corpus_rows is None or corpus_rows >= IVF_PRUNE_MIN_ROWS:
        probed = probes.select("centroid_id").distinct()
        pruned = indexed_corpus.join(F.broadcast(probed), "centroid_id")
    c = with_norm(
        pruned,
        vec_col,
        "nnrm",
    ).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("ne"),
        "nnrm",
        "centroid_id",
    )
    pairs = c.join(F.broadcast(probes), "centroid_id").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    return _rank_topk(pairs, k, round_digits)


def quantize_int8(
    df: DataFrame, vec_col: str = "e", out_col: str = "q", scale_col: str = "scale"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|x| / 127,
    q_i = round(x_i / scale). 4x smaller than float32 (16x vs float64) —
    at 100 TB of embeddings this is the difference between caching the
    corpus in executor memory and re-reading it per query. Pure JVM array
    exprs; zero vectors keep scale 0 and quantize to all-zero.
    """
    v = F.col(vec_col)
    scale = F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0)
    q = F.when(
        F.col(scale_col) > 0,
        F.transform(v, lambda x: F.round(x / F.col(scale_col)).cast("int")),
    ).otherwise(F.transform(v, lambda x: F.lit(0)))
    return df.withColumn(scale_col, scale).withColumn(out_col, q)


def dequantize_int8(
    df: DataFrame, q_col: str = "q", scale_col: str = "scale", out_col: str = "e_hat"
) -> DataFrame:
    """Inverse of :func:`quantize_int8` (lossy: max abs error scale/2)."""
    return df.withColumn(
        out_col,
        F.transform(F.col(q_col), lambda x: x.cast("double") * F.col(scale_col)),
    )


def train_pq_codebooks(
    corpus: DataFrame,
    m: int = 4,
    ksub: int = 16,
    vec_col: str = "e",
    seed: int = 42,
    max_iter: int = 10,
    train_fraction: float = 1.0,
    shared: bool = False,
    local_train_cap: int = 100_000,
    train_limit: int | None = None,
) -> list[list[list[float]]]:
    """Product-quantization codebooks (Jégou et al., TPAMI'11): split the
    vector into ``m`` contiguous subspaces and train an independent
    ``ksub``-centroid KMeans codebook per subspace on (a sample of) the
    corpus. Returns the model as plain nested lists
    ``codebooks[j][c] = centroid`` — m*ksub*(dim/m) floats, genuinely tiny
    (the model IS the broadcast payload; at m=4, ksub=16, dim=64 it is
    4 KiB), so downstream encode/decode embed it as literal arrays and
    stay pure JVM expressions.

    Storage story at 100 TB: a 64-dim float64 vector is 512 bytes; its PQ
    code is m small ints (m bytes at ksub<=256) — a 128x reduction that
    turns a re-read-per-query corpus into one that fits in executor
    memory, at the price of approximate distances (recall is tuned by m
    and ksub; verify with :func:`cosine_topk` on the survivors).

    Scale contract: like :func:`build_ivf_index`, training runs on a
    sample (``train_fraction``) — codebook quality saturates quickly —
    and each fit sees only the dim/m-wide slice of the sampled rows.

    ``shared=True`` trains ONE codebook on the union of all subvector
    slices and replicates it across subspaces: for isotropically
    distributed embeddings (subspaces identically distributed) it loses
    little accuracy while paying a single KMeans fit instead of m — the
    right trade when m is large (fine subspaces are what buys recall on
    unstructured embeddings). Per-subspace (default) is the textbook PQ
    that adapts to anisotropic dimensions.

    Trainer routing mirrors :func:`build_ivf_index`: a sample within
    ``local_train_cap`` rows is collected ONCE and all m subspace fits
    run driver-side (:func:`_lloyd_fit_local` over numpy slices — m
    distributed fits collapse into ms of local work); larger samples
    keep the distributed MLlib fits.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    first = corpus.select(F.size(F.col(vec_col)).alias("d")).first()
    if first is None:
        raise ValueError("empty corpus: nothing to train on")
    dim = first["d"]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    dsub = dim // m
    sample = corpus.select(F.col(vec_col))
    train_fraction = _absolute_train_fraction(
        corpus, train_fraction, train_limit
    )
    if train_fraction < 1.0:
        sample = _value_hash_sample(sample, vec_col, train_fraction, seed)
    probe = (
        sample.select(F.col(vec_col).cast("array<double>").alias("v"))
        .limit(local_train_cap + 1)
        .collect()
    )
    if len(probe) <= local_train_cap:
        import numpy as np

        if not probe:
            raise ValueError("empty training sample: nothing to train on")
        # Sort for the same collect-order-independence reason as
        # build_ivf_index's local path (kmeans++ seeds by row position).
        x = np.asarray(sorted(r["v"] for r in probe), dtype=np.float64)
        if shared:
            stacked = x.reshape(-1, dsub)
            book = _lloyd_fit_local(stacked, ksub, seed, max_iter)
            return [book for _ in range(m)]
        return [
            _lloyd_fit_local(
                x[:, j * dsub : (j + 1) * dsub], ksub, seed + j, max_iter
            )
            for j in range(m)
        ]
    if shared:
        subs = sample.select(
            F.explode(
                F.expr(
                    f"transform(sequence(0, {m - 1}), "
                    f"j -> slice({vec_col}, j * {dsub} + 1, {dsub}))"
                )
            ).alias("sub")
        )
        model = KMeans(k=ksub, seed=seed, maxIter=max_iter).fit(
            subs.select(array_to_vector(F.col("sub")).alias("features"))
        )
        book = [[float(x) for x in c] for c in model.clusterCenters()]
        return [book for _ in range(m)]
    books: list[list[list[float]]] = []
    for j in range(m):
        train = sample.select(
            array_to_vector(
                F.slice(F.col(vec_col), j * dsub + 1, dsub)
            ).alias("features")
        )
        model = KMeans(k=ksub, seed=seed + j, maxIter=max_iter).fit(train)
        books.append(
            [[float(x) for x in c] for c in model.clusterCenters()]
        )
    return books


def _pq_literal(codebooks: list[list[list[float]]]) -> Column:
    """The codebooks as one nested literal array column, built from a
    single SQL string: composing it from F.array/F.lit would cost one
    py4j round trip per centroid component (m*ksub*dsub of them —
    measured ~3s of pure driver overhead at m=32), while one expr parse
    is milliseconds. repr() emits the shortest round-tripping decimal,
    which Spark's correctly-rounded parse maps back to the identical
    double."""
    def arr(xs: list) -> str:
        inner = ", ".join(
            arr(x) if isinstance(x, list) else f"CAST('{x!r}' AS DOUBLE)"
            for x in xs
        )
        return f"array({inner})"

    return F.expr(arr(codebooks))


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "e",
    code_col: str = "codes",
) -> DataFrame:
    """Assign each vector its PQ code: per subspace, the index of the
    nearest codebook centroid (squared L2, first-min tie-break via
    ``array_position`` so codes are deterministic). Pure map-side array
    expressions over the literal codebooks — the corpus never shuffles
    and no model object leaves the plan."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    cb = _pq_literal(codebooks)
    # The m*ksub distance folds per vector are CPU-dense interpreted
    # expressions: spread single-row-group inputs so they parallelize.
    df = spread(df)

    # ONE transform with a runtime subspace index so the m*ksub*dsub
    # codebook literal appears exactly once in the plan: unrolling m
    # separate argmin trees embeds m copies of it and blows up analysis
    # time (measured 23s at m=32); this shape plans in constant time and
    # the per-element interpreted evaluation is the same either way.
    def code_at(j):
        sub = F.slice(F.col(vec_col), j * dsub + 1, dsub)
        dists = F.transform(
            F.element_at(cb, j + 1),
            lambda c: F.aggregate(
                F.zip_with(sub, c, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")

    return df.withColumn(
        code_col, F.transform(F.sequence(F.lit(0), F.lit(m - 1)), code_at)
    )


def pq_decode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    code_col: str = "codes",
    out_col: str = "e_hat",
) -> DataFrame:
    """Reconstruct vectors from PQ codes: concatenate each subspace's
    selected centroid. Lossy (quantization error is the distance to the
    nearest centroid); searching over reconstructions approximates the
    asymmetric-distance computation with plain :func:`cosine_topk`."""
    cb = _pq_literal(codebooks)
    rec = F.flatten(
        F.transform(
            F.col(code_col),
            lambda c, j: F.element_at(F.element_at(cb, j + 1), c + 1),
        )
    )
    return df.withColumn(out_col, rec)


def pq_topk(
    corpus_codes: DataFrame,
    codebooks: list[list[list[float]]],
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    code_col: str = "codes",
    vec_col: str = "e",
    round_digits: int = 6,
) -> DataFrame:
    """Approximate top-k over a PQ-compressed corpus: decode codes to
    centroid reconstructions, exact cosine of full-precision queries
    against reconstructions (asymmetric search — queries are never
    quantized). Same output contract as :func:`cosine_topk`."""
    rec = pq_decode(corpus_codes, codebooks, code_col, "__rec__")
    corpus = rec.select(F.col(id_col), F.col("__rec__").alias(vec_col))
    return cosine_topk(
        corpus, queries, k, id_col=id_col, vec_col=vec_col,
        round_digits=round_digits,
    )


def materialize_ivf_index(
    indexed_corpus: DataFrame,
    centroids: DataFrame,
    path: str,
) -> None:
    """Persist an IVF index for build-once / query-many reuse.

    The indexed corpus lands as parquet PARTITIONED BY centroid_id —
    the physical layout that turns an nprobe search into a directory-
    pruned scan (only the probed lists' files are ever opened; see
    :func:`load_ivf_index`). The centroid table is a single tiny file.

    At 100 TB this is the index lifecycle: KMeans trains on a sample
    once, assignment streams the corpus once, and every subsequent query
    batch reads ~nprobe/n_centroids of the data — rebuilding per query
    (what the self-contained oracle query does for verifiability) would
    re-pay the training and assignment cost every time.
    """
    import os

    indexed_corpus.write.partitionBy("centroid_id").mode(
        "overwrite"
    ).parquet(os.path.join(path, "lists"))
    centroids.write.mode("overwrite").parquet(
        os.path.join(path, "centroids")
    )


def load_ivf_index(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """Load a materialized IVF index: (indexed_corpus, centroids).

    The returned corpus frame is partition-discovered on centroid_id, so
    an ``ivf_topk`` over it with a literal / joined centroid_id filter
    prunes to the probed directories (PartitionFilters in the scan —
    asserted in tests), never a full-corpus read.
    """
    import os

    lists = spark.read.parquet(os.path.join(path, "lists"))
    centroids = spark.read.parquet(os.path.join(path, "centroids"))
    return lists, centroids


def build_ivfpq_index(
    corpus: DataFrame,
    n_centroids: int,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "e",
    seed: int = 42,
    max_iter: int = 10,
    train_fraction: float = 1.0,
    shared_codebook: bool = True,
    train_limit: int | None = None,
) -> tuple[DataFrame, DataFrame, list[list[list[float]]]]:
    """IVF-PQ composite index (Jégou et al., TPAMI'11 §IV — the FAISS
    ``IVFx,PQy`` standard): coarse KMeans lists for pruning + product
    quantization of the RESIDUAL (vector minus its list centroid) for
    in-list compression. Residual encoding is what makes the composition
    better than either part alone: residual magnitudes are a fraction of
    vector magnitudes, so the same codebook budget buys finer cells.

    Returns ``(codes, centroids, codebooks)`` where codes carries
    (id, centroid_id, codes) — m small ints + a list id per vector, the
    complete searchable state. At 100 TB: centroids and codebooks are
    broadcast payloads, the codes table is 32-128x smaller than the
    corpus, and a search reads ~nprobe/n_centroids of it.
    """
    # Resolve the absolute bound ONCE against the corpus (a zero-column
    # metadata-sized count); the residual frame below is a join whose
    # row count is identical, but counting it would execute the join.
    train_fraction = _absolute_train_fraction(
        corpus, train_fraction, train_limit
    )
    indexed, centroids = build_ivf_index(
        corpus,
        n_centroids,
        id_col=id_col,
        vec_col=vec_col,
        seed=seed,
        max_iter=max_iter,
        train_fraction=train_fraction,
    )
    residual = indexed.join(F.broadcast(centroids), "centroid_id").select(
        F.col(id_col),
        "centroid_id",
        F.zip_with(
            F.col(vec_col), F.col("centroid"), lambda a, b: a - b
        ).alias("__res__"),
    )
    books = train_pq_codebooks(
        residual,
        m=m,
        ksub=ksub,
        vec_col="__res__",
        seed=seed,
        max_iter=max_iter,
        train_fraction=train_fraction,
        shared=shared_codebook,
    )
    codes = pq_encode(residual, books, vec_col="__res__").select(
        F.col(id_col), "centroid_id", "codes"
    )
    return codes, centroids, books


def ivfpq_topk(
    codes: DataFrame,
    centroids: DataFrame,
    codebooks: list[list[list[float]]],
    queries: DataFrame,
    k: int,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "e",
    round_digits: int = 6,
) -> DataFrame:
    """Approximate top-k over an IVF-PQ index: probe the ``nprobe``
    nearest lists per query (exact query-to-centroid distances against
    the broadcast centroid table), reconstruct ONLY the probed lists'
    vectors as centroid + decoded residual, and rank by exact cosine of
    the full-precision query against the reconstruction (asymmetric
    search — queries are never quantized). Same output contract and
    shared ranking tail (:func:`_rank_topk`) as every other search
    strategy. Cost per query ~ nprobe * N/C code decodes; nothing except
    the codes of probed lists ever moves."""
    q = with_norm(queries, vec_col, "qnrm").select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qe"), "qnrm"
    )
    dist = F.aggregate(
        F.zip_with(
            F.col("qe"), F.col("centroid"), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w_probe = Window.partitionBy("query_id").orderBy(
        F.col("centroid_dist").asc(), F.col("centroid_id").asc()
    )
    probes = (
        q.crossJoin(F.broadcast(centroids))
        .select(
            "query_id", "qe", "qnrm", "centroid_id",
            dist.alias("centroid_dist"),
        )
        .withColumn("probe_rnk", F.row_number().over(w_probe))
        .filter(F.col("probe_rnk") <= nprobe)
        .select("query_id", "qe", "qnrm", "centroid_id")
    )
    # Decode + norm each probed vector ONCE, not once per (query, vector)
    # pair: the union of probed lists is pruned first, reconstruction
    # (centroid + decoded residual) and its norm are per-vector
    # projections, and only then does the tiny probes relation fan the
    # vectors out to their queries — with |Q| queries probing a list,
    # the naive order pays |Q|x the decode/norm work for identical
    # results (measured 23s -> ~6s steady-state at the sf1 probe).
    probed = probes.select("centroid_id").distinct()
    rec = pq_decode(
        codes.join(F.broadcast(probed), "centroid_id"),
        codebooks,
        "codes",
        "__res__",
    )
    rec = rec.join(F.broadcast(centroids), "centroid_id").select(
        F.col(id_col).alias("neighbor_id"),
        "centroid_id",
        F.zip_with(
            F.col("centroid"), F.col("__res__"), lambda a, b: a + b
        ).alias("ne"),
    )
    # A reconstructed vector (centroid + decoded residual) CAN be all-zero
    # even when the original was not — cosine against it divides by zero
    # (NULL in Spark), and NULL rows must not occupy top-k slots. Exact
    # paths never manufacture vectors so they inherit degeneracy from the
    # input; here the index itself can create it, so filter both norms.
    rec = with_norm(rec, "ne", "nnrm").filter(F.col("nnrm") > 0)
    pairs = (
        rec.join(F.broadcast(probes), "centroid_id")
        .filter(
            (F.col("neighbor_id") != F.col("query_id"))
            & (F.col("qnrm") > 0)
        )
    )
    return _rank_topk(pairs, k, round_digits)
