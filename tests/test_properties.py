"""Property-based invariants (hypothesis) for engine primitives.

Each property is checked against a Python-side model on randomized inputs —
the complement to the fixed-fixture tests: fixtures pin known edge cases,
properties sweep the input space for the invariants the operators promise.
Example counts are kept small (Spark jobs per example are not free), and
the deadline is disabled for the same reason.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from certified_dogs_and_cats_spark.extensions.dedup import (
    connected_components,
)
from certified_dogs_and_cats_spark.extensions.sampling import (
    hash_split,
    stratified_split,
)
from certified_dogs_and_cats_spark.extensions.text import (
    pack_token_stream,
    winnow_fingerprints,
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

edges_strategy = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)),
    min_size=1,
    max_size=40,
)


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@SETTINGS
@given(edges=edges_strategy)
def test_connected_components_matches_union_find(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.node: r.component for r in connected_components(df).collect()}
    assert got == _union_find(edges)


@SETTINGS
@given(
    ids=st.lists(st.integers(0, 10_000), min_size=1, max_size=60, unique=True)
)
def test_hash_split_is_stable_under_corpus_growth(spark, ids):
    """A row's split assignment never changes when more rows arrive — the
    contract that keeps train/holdout membership frozen across backfills."""
    full = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    half = spark.createDataFrame(
        [(i,) for i in ids[: max(1, len(ids) // 2)]], "doc_id long"
    )
    f = {r.doc_id: r.split for r in hash_split(full, "doc_id").collect()}
    h = {r.doc_id: r.split for r in hash_split(half, "doc_id").collect()}
    assert all(f[k] == v for k, v in h.items())


@SETTINGS
@given(
    groups=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 10_000)),
        min_size=4,
        max_size=60,
        unique_by=lambda t: t[1],
    )
)
def test_stratified_split_cumulative_quota(spark, groups):
    """Per stratum: cumulative split sizes equal ceil of the cumulative
    weight targets — every stratum within one row of 80/10/10."""
    import math
    from collections import Counter

    df = spark.createDataFrame(groups, "g string, doc_id long")
    out = stratified_split(df, ["g"], "doc_id").collect()
    per_g = Counter((r.g, r.split) for r in out)
    totals = Counter(g for g, _ in groups)
    for g, n in totals.items():
        train = per_g[(g, "train")]
        val = per_g[(g, "val")]
        test = per_g[(g, "test")]
        assert train == math.ceil(0.8 * n)
        assert train + val == math.ceil(0.9 * n)
        assert train + val + test == n


@SETTINGS
@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=60),
        min_size=1,
        max_size=8,
    ),
    budget=st.integers(2, 16),
)
def test_packing_conservation_property(spark, texts, budget):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_token_stream(df, "doc_id", "text", budget=budget).collect()
    contributed = {}
    for r in out:
        assert r.tokens_in_bin > 0
        contributed[r.doc_id] = contributed.get(r.doc_id, 0) + r.tokens_in_bin
    # split(' ') gives len+1 tokens for texts with n spaces (empty tokens
    # count) — mirror Spark's split semantics exactly.
    expected = {i: len(t.split(" ")) for i, t in rows}
    assert contributed == expected


@SETTINGS
@given(
    prefix=st.text(alphabet="xyz w", min_size=0, max_size=30),
    shared=st.text(alphabet="abc d", min_size=14, max_size=30),
    suffix=st.text(alphabet="pqr s", min_size=0, max_size=30),
)
def test_winnowing_guarantee_property(spark, prefix, shared, suffix):
    """Any two docs sharing a substring of length >= w + k - 1 (= 11 for
    k=8, w=4) must share at least one fingerprint, for ARBITRARY
    surrounding context."""
    rows = [(1, prefix + shared), (2, shared + suffix)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fp = winnow_fingerprints(df, "doc_id", "text", k=8, w=4).collect()
    a = {r.fingerprint for r in fp if r.doc_id == 1}
    b = {r.fingerprint for r in fp if r.doc_id == 2}
    assert a & b


# --- PPJoin prefix filtering is lossless -------------------------------------

docs_strategy = st.lists(
    st.lists(st.integers(0, 8), min_size=3, max_size=12),
    min_size=2,
    max_size=8,
)


@given(docs=docs_strategy, threshold=st.sampled_from([0.3, 0.5, 0.7]))
@SETTINGS
def test_prefix_filter_matches_exact_jaccard_model(spark, docs, threshold):
    """prefix_filter_jaccard_pairs must equal the Python-model all-pairs
    Jaccard over DISTINCT shingle sets, at any threshold — the prefix
    bound and the size bound are lossless, never heuristics."""
    from certified_dogs_and_cats_spark.extensions.dedup import (
        prefix_filter_jaccard_pairs,
    )

    rows = [
        (i, tok) for i, toks in enumerate(docs) for tok in set(toks)
    ]
    sh = spark.createDataFrame(rows, "doc_id long, shingle long")
    got = {
        (r.a_id, r.b_id): (r.inter, r.union)
        for r in prefix_filter_jaccard_pairs(sh, "doc_id", threshold).collect()
    }
    sets = {i: set(toks) for i, toks in enumerate(docs)}
    want = {}
    for a in sets:
        for b in sets:
            if a >= b:
                continue
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and inter / union >= threshold:
                want[(a, b)] = (inter, union)
    assert got == want
