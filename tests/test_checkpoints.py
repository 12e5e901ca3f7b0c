"""Commit-log checkpointing (Delta checkpointInterval parity): every
``checkpoint_interval`` commits the catalog writes a full-state snapshot
(file list, DV sidecars, per-stream txn high-water) and truncates the
merged manifest to post-checkpoint entries. Hot reads (head state,
commit claiming, txn checks) are then bounded by the interval, not by
table history; per-version commit files retain the full history for
time travel until vacuum ages them out — after which reads below the
retained window fail LOUDLY, never return wrong rows."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import types as T

from certified_dogs_and_cats_spark.pipeline.catalog import Catalog

SCHEMA = T.StructType(
    [
        T.StructField("k", T.IntegerType(), False),
        T.StructField("v", T.StringType(), True),
    ]
)


def _mk(spark, tmp_path, interval=5):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.checkpoint_interval = interval
    cat.register("core.t", SCHEMA)
    return cat


def _append_n(spark, cat, n, start=0, txn_stream=None):
    for i in range(start, start + n):
        txn = (
            {"stream_id": txn_stream, "batch_id": i}
            if txn_stream is not None
            else None
        )
        cat.append(
            "core.t", spark.createDataFrame([(i, f"r{i}")], SCHEMA), txn=txn
        )


def _rows(cat, version=None):
    return sorted(
        r.k for r in cat.table("core.t", version=version).collect()
    )


def test_checkpoint_written_and_manifest_truncated(spark, tmp_path):
    cat = _mk(spark, tmp_path, interval=5)
    _append_n(spark, cat, 12)
    ckdir = cat._ckpt_dir("core.t")
    assert sorted(os.listdir(ckdir)) == [
        "000000000005.json",
        "000000000010.json",
    ]
    with open(cat._manifest_path("core.t")) as f:
        manifest = json.load(f)
    # Only post-checkpoint entries remain in the merged manifest.
    assert [e["version"] for e in manifest] == [11, 12]
    # The hot log view is checkpoint + tail, bounded by the interval.
    hot = cat._load_log("core.t")
    assert [e["version"] for e in hot] == [10, 11, 12]
    assert hot[0]["action"] == "checkpoint"
    # Head reads are exactly the full corpus.
    assert _rows(cat) == list(range(12))
    assert cat.current_version("core.t") == 12


def test_full_history_stays_readable_until_vacuum(spark, tmp_path):
    cat = _mk(spark, tmp_path, interval=5)
    _append_n(spark, cat, 12)
    # Per-version commit files keep pre-checkpoint history replayable.
    assert _rows(cat, version=3) == [0, 1, 2]
    assert _rows(cat, version=10) == list(range(10))
    assert [e["version"] for e in cat.history("core.t")] == list(
        range(1, 13)
    )
    # ... and the original actions survive (the checkpoint is a replay
    # shortcut, not a rewrite of history).
    assert {e["action"] for e in cat.history("core.t")} == {"append"}
    # CDF over the whole history still attributes per-commit.
    feed = cat.changes("core.t", from_version=0)
    got = sorted((r.k, r._commit_version) for r in feed.collect())
    assert got == [(i, i + 1) for i in range(12)]


def test_vacuum_truncates_and_reads_fail_loudly(spark, tmp_path):
    cat = _mk(spark, tmp_path, interval=5)
    _append_n(spark, cat, 12)
    cat.vacuum("core.t", 0)
    # With zero retention every commit file is subsumed (below the
    # checkpoint, or merged into the manifest) and pruned.
    cdir = cat._commits_dir("core.t")
    left = sorted(
        int(fn[:-5]) for fn in os.listdir(cdir) if fn.endswith(".json")
    )
    assert left == []
    # Head and post-checkpoint history still work — the manifest keeps
    # the post-checkpoint tail until the NEXT checkpoint covers it, and
    # appends never retire data files, so every row is still live.
    assert _rows(cat) == list(range(12))
    assert _rows(cat, version=11) == list(range(11))
    assert _rows(cat, version=10) == list(range(10))  # the checkpoint
    # Below the retained window: loud failure, never wrong rows.
    with pytest.raises(ValueError, match="no longer replayable"):
        cat.table("core.t", version=7)
    with pytest.raises(ValueError, match="no longer replayable"):
        cat.changes("core.t", from_version=3).collect()
    # CDF from the checkpoint forward is fine.
    feed = cat.changes("core.t", from_version=10)
    assert sorted(r.k for r in feed.collect()) == [10, 11]


def test_txn_high_water_survives_truncation(spark, tmp_path):
    cat = _mk(spark, tmp_path, interval=5)
    _append_n(spark, cat, 12, txn_stream="ingest")
    cat.vacuum("core.t", 0)
    # Markers below the checkpoint are subsumed by its high-water;
    # markers in the tail are still explicit; unseen batches are new.
    for b in range(12):
        assert cat.txn_committed("core.t", "ingest", b)
    assert not cat.txn_committed("core.t", "ingest", 12)
    assert not cat.txn_committed("core.t", "other", 0)


def test_tagged_version_pinned_across_truncation(spark, tmp_path):
    cat = _mk(spark, tmp_path, interval=5)
    _append_n(spark, cat, 12)
    cat.set_tag("core.t", "baseline", version=3)
    cat.vacuum("core.t", 0)
    # The tag's commit file was rewritten in snapshot form, so the
    # replay re-grounds at it even though versions 1-2 and 4-10 are gone.
    assert _rows(cat, version="baseline") == [0, 1, 2]
    assert _rows(cat, version=3) == [0, 1, 2]
    with pytest.raises(ValueError, match="no longer replayable"):
        cat.table("core.t", version=4)


def test_hot_log_bounded_as_history_grows(spark, tmp_path):
    cat = _mk(spark, tmp_path, interval=5)
    sizes = []
    for step in range(4):
        _append_n(spark, cat, 5, start=step * 5)
        sizes.append(len(cat._load_log("core.t")))
    # Bounded by the interval (+1 for the checkpoint entry), however
    # long the history gets.
    assert max(sizes) <= 6
    assert cat.current_version("core.t") == 20
    assert _rows(cat) == list(range(20))


def test_checkpoint_after_overwrite_resets_state(spark, tmp_path):
    cat = _mk(spark, tmp_path, interval=4)
    _append_n(spark, cat, 3)
    cat.overwrite(
        "core.t", spark.createDataFrame([(99, "z")], SCHEMA)
    )  # v4 -> checkpoint at 4
    _append_n(spark, cat, 2, start=100)
    assert _rows(cat) == [99, 100, 101]
    assert _rows(cat, version=4) == [99]
    cat.vacuum("core.t", 0)
    assert _rows(cat) == [99, 100, 101]
    with pytest.raises(ValueError, match="no longer replayable"):
        cat.table("core.t", version=2)


def test_targeted_range_load_is_bounded(spark, tmp_path):
    """Time travel and CDF replay load O(checkpoint_interval) entries
    grounded at the nearest checkpoint at or below the range — never
    the whole history (the full-view draft measured ~10x time-travel
    growth per 4x commits from opening every commit file ever
    written)."""
    cat = _mk(spark, tmp_path, interval=5)
    _append_n(spark, cat, 23)
    # mid-history target 12 grounds at the v10 checkpoint (the newest
    # one at or below it), loading only (10, 12].
    rng = cat._load_log_range("core.t", 12, 12)
    assert [e["version"] for e in rng] == [10, 11, 12]
    assert rng[0]["action"] == "checkpoint"
    assert _rows(cat, version=12) == list(range(12))
    # early target with no checkpoint below: grounds at v1.
    rng = cat._load_log_range("core.t", 3, 3)
    assert [e["version"] for e in rng] == [1, 2, 3]
    # CDF over a mid-history window replays only that window.
    feed = cat.changes("core.t", from_version=11, to_version=14)
    got = sorted((r.k, r._commit_version) for r in feed.collect())
    assert got == [(i, i + 1) for i in range(11, 14)]


def test_set_tag_pins_immediately(spark, tmp_path):
    """A tag set AFTER its version's delta commit file was pruned (but
    while the manifest tail still holds the entry) must survive the
    next checkpoint truncation: set_tag snapshot-pins the commit file
    at tag time, not only at vacuum time."""
    cat = _mk(spark, tmp_path, interval=10)
    _append_n(spark, cat, 4)
    # Prune v1-4 commit files while they are only manifest-merged
    # (no checkpoint yet): the old-era rule.
    cat.vacuum("core.t", 0)
    assert sorted(
        fn
        for fn in os.listdir(cat._commits_dir("core.t"))
        if fn.endswith(".json")
    ) == []
    cat.set_tag("core.t", "snap3", version=3)
    # Cross the checkpoint boundary: manifest truncates to (10, ...].
    _append_n(spark, cat, 7, start=4)
    assert _rows(cat, version="snap3") == [0, 1, 2]
    # Survives a later vacuum too.
    cat.vacuum("core.t", 0)
    assert _rows(cat, version="snap3") == [0, 1, 2]


# --- randomized differential property: checkpointing must be invisible ----

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_op = st.one_of(
    st.tuples(st.just("append"), st.integers(0, 9)),
    st.tuples(st.just("delete"), st.integers(0, 9)),
    st.tuples(st.just("update"), st.integers(0, 9)),
    st.tuples(st.just("overwrite"), st.integers(0, 9)),
    st.tuples(st.just("compact"), st.just(0)),
)


def _apply(spark, cat, ops):
    """Run the op sequence; ops that would commit nothing are skipped
    identically on both catalogs (pure function of prior ops). Txn batch
    ids are consecutive per stream — the structured-streaming contract
    txn_committed's high-water subsumption is documented against (gapped
    ids would legitimately diverge: a checkpoint keeps only the
    high-water, exactly like Delta's per-appId latest txn version)."""
    batch = 0
    for i, (kind, k) in enumerate(ops):
        if kind == "append":
            cat.append(
                "core.t",
                spark.createDataFrame([(k, f"r{i}")], SCHEMA),
                txn={"stream_id": "s", "batch_id": batch},
            )
            batch += 1
        elif kind == "delete":
            cat.delete_where("core.t", f"k = {k}")
        elif kind == "update":
            cat.update_where("core.t", {"v": "concat(v, '+')"}, f"k = {k}")
        elif kind == "overwrite":
            cat.overwrite(
                "core.t", spark.createDataFrame([(k, f"o{i}")], SCHEMA)
            )
        elif kind == "compact":
            cat.compact("core.t")


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_op, min_size=3, max_size=8))
def test_checkpointed_log_is_equivalent_to_plain_replay(
    spark, tmp_path_factory, ops
):
    """Differential property: an aggressive checkpoint interval (2) must
    be observationally IDENTICAL to an effectively checkpoint-free log
    (interval 10**6) across random append / DV-delete / DV-update /
    overwrite / compact sequences — same head rows, same rows at every
    retained version, same change feed, same txn high-water. Any
    checkpoint-grounding bug (dropped DV sidecar, wrong replay base,
    missed txn marker) breaks one side of the comparison."""
    base = tmp_path_factory.mktemp("ckeq")
    cats = []
    for label, interval in (("ck", 2), ("plain", 10**6)):
        cat = Catalog(spark, str(base / label))
        cat.checkpoint_interval = interval
        cat.register("core.t", SCHEMA)
        _apply(spark, cat, ops)
        cats.append(cat)
    ck, plain = cats
    assert ck.current_version("core.t") == plain.current_version("core.t")
    head = plain.current_version("core.t")
    for v in range(1, head + 1):
        got = sorted(
            (r.k, r.v) for r in ck.table("core.t", version=v).collect()
        )
        want = sorted(
            (r.k, r.v) for r in plain.table("core.t", version=v).collect()
        )
        assert got == want, f"version {v} diverged"
    feed = lambda c: sorted(  # noqa: E731
        (r.k, r.v, r["_change_type"], r["_commit_version"])
        for r in c.changes("core.t", 0).collect()
    )
    assert feed(ck) == feed(plain)
    n_appends = sum(1 for kind, _ in ops if kind == "append")
    for b in range(n_appends + 2):
        assert ck.txn_committed("core.t", "s", b) == plain.txn_committed(
            "core.t", "s", b
        ) == (b < n_appends)
