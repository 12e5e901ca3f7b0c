"""Round-11 queries: hard-negative label exclusion + rank order, Neyman
allocation against a pure-Python statistics replay, and the Q21-shaped
sole-late-supplier blame rule on a handcrafted order."""

from __future__ import annotations

import math
import statistics

from pyspark.sql import functions as F

from certified_dogs_and_cats_spark.queries.registry import QUERIES
from certified_dogs_and_cats_spark.queries.roundeleven import (
    NEYMAN_BUDGET,
)
from certified_dogs_and_cats_spark.queries.similarity import K

SF = "/root/testdata/sf0.001"


def test_hard_negatives_exclude_anchor_label(spark):
    rows = QUERIES["hard_negative_mining"](spark, SF).collect()
    assert rows, "query set must be non-empty at sf0.001"
    labels = {
        r.vec_id: r.label
        for r in spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", "label")
        .collect()
    }
    per_q: dict[int, list] = {}
    for r in rows:
        assert r.negative_label == labels[r.negative_id]
        assert r.negative_label != labels[r.query_id]  # hard NEGATIVE
        per_q.setdefault(r.query_id, []).append((r.rnk, r.cos_sim))
    for q, got in per_q.items():
        got.sort()
        assert [rk for rk, _ in got] == list(range(1, len(got) + 1))
        assert len(got) <= K
        sims = [s for _, s in got]
        assert sims == sorted(sims, reverse=True)  # rank follows score


def test_neyman_allocation_matches_statistics_replay(spark):
    out = {r.source: r for r in QUERIES["neyman_allocation"](spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "source", F.size(F.split("text", " ")).alias("n_tok")
    )
    by_src: dict[str, list[int]] = {}
    for r in docs.collect():
        by_src.setdefault(r.source, []).append(r.n_tok)
    weights = {
        s: len(v) * statistics.stdev(v) for s, v in by_src.items() if len(v) > 1
    }
    total = sum(weights.values())
    assert set(out) == set(weights)
    for s, r in out.items():
        assert math.isclose(r.sd_tokens, statistics.stdev(by_src[s]), abs_tol=1e-5)
        share = weights[s] / total
        assert math.isclose(r.neyman_share, share, abs_tol=1e-5)
        assert r.alloc_docs == math.floor(NEYMAN_BUDGET * round(share, 6))
    assert abs(sum(r.neyman_share for r in out.values()) - 1.0) < 1e-4
    assert sum(r.alloc_docs for r in out.values()) <= NEYMAN_BUDGET


def test_sole_late_supplier_rule(spark, tmp_path):
    """Handcrafted orders: blame lands ONLY on the sole late supplier of
    a multi-supplier order — not on solo-supplier orders, not when two
    suppliers are both late."""
    import datetime as dt

    d0 = dt.date(2024, 1, 1)
    late = dt.date(2024, 6, 1)  # > 60 days after d0
    ok = dt.date(2024, 1, 15)
    orders = spark.createDataFrame(
        [(1, d0), (2, d0), (3, d0)], "o_orderkey long, o_orderdate date"
    )
    li = spark.createDataFrame(
        [
            # order 1: suppliers 10 (late), 11 (on time) -> blame 10
            (1, 10, late),
            (1, 11, ok),
            # order 2: suppliers 10 and 11 BOTH late -> no blame
            (2, 10, late),
            (2, 11, late),
            # order 3: single supplier 12 late -> no blame (no one waited
            # on a co-supplier)
            (3, 12, late),
        ],
        "l_orderkey long, l_suppkey long, l_shipdate date",
    )
    sup = spark.createDataFrame(
        [(10, "S10"), (11, "S11"), (12, "S12")],
        "s_suppkey long, s_name string",
    )
    sf = str(tmp_path / "mini")
    orders.write.parquet(f"{sf}/orders.parquet")
    li.write.parquet(f"{sf}/lineitem.parquet")
    sup.write.parquet(f"{sf}/supplier.parquet")
    got = QUERIES["sole_late_supplier_blame"](spark, sf).collect()
    assert [(r.s_suppkey, r.numwait) for r in got] == [(10, 1)]


def test_frequent_sequences_match_python_replay(spark):
    """Trigram counts + user support equal a pure-Python replay of the
    per-user (ts, event_id)-ordered streams."""
    rows = QUERIES["frequent_event_sequences"](spark, SF).collect()
    assert rows and len(rows) <= 15
    from certified_dogs_and_cats_spark.queries.common import t as load

    ev = (
        load(spark, SF, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append((r.ts, r.event_id, r.event_type))
    from collections import Counter

    occ, users = Counter(), {}
    for u, seq in by_user.items():
        seq.sort()
        types = [t3 for _, _, t3 in seq]
        for i in range(len(types) - 2):
            g = (types[i], types[i + 1], types[i + 2])
            occ[g] += 1
            users.setdefault(g, set()).add(u)
    want = sorted(
        ((-n, *g) for g, n in occ.items())
    )[:15]
    got = sorted((-r.n_occurrences, r.step1, r.step2, r.step3) for r in rows)
    assert got == want
    for r in rows:
        assert r.n_users == len(users[(r.step1, r.step2, r.step3)])


def test_ivf_nprobe_sweep_invariants(spark):
    """The sweep's self-checks hold at sf0.001 and the scaffold is
    exact: 4 rows, pairs = K * n_queries, and full-probe (nprobe >=
    n_lists = 8) recall is bit-exactly 1.0 (probing every list IS the
    exact search)."""
    rows = QUERIES["ivf_nprobe_sweep"](spark, SF).collect()
    assert [r.nprobe for r in rows] == [1, 2, 4, 8]
    for r in rows:
        assert r.n_exact_pairs == K * r.n_queries
        assert r.recall_ok and r.full_probe_exact_ok
