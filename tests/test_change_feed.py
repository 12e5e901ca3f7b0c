"""Change Data Feed (Catalog.changes): file-level append CDC, snapshot-diff
rewrites, version bounds, and interplay with time travel / vacuum."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from certified_dogs_and_cats_spark.pipeline.catalog import Catalog

SCHEMA = T.StructType(
    [
        T.StructField("k", T.IntegerType(), False),
        T.StructField("v", T.StringType(), True),
    ]
)


def _mk(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.register("core.t", SCHEMA)
    return cat


def _rows(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _feed(df):
    return sorted(
        (r.k, r.v, r._change_type, r._commit_version) for r in df.collect()
    )


def test_append_changes_are_file_level_inserts(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    cat.append("core.t", _rows(spark, [(1, "a")]))
    cat.append("core.t", _rows(spark, [(2, "b"), (3, "c")]))
    # Tail from v1: only the second append's rows, tagged with its version.
    assert _feed(cat.changes("core.t", from_version=1)) == [
        (2, "b", "insert", 2),
        (3, "c", "insert", 2),
    ]
    # Full feed from v0 carries both commits' attributions.
    assert _feed(cat.changes("core.t", from_version=0)) == [
        (1, "a", "insert", 1),
        (2, "b", "insert", 2),
        (3, "c", "insert", 2),
    ]


def test_append_change_reads_only_added_files(spark, tmp_path):
    """The append path must resolve to the commit's added files, never a
    table-wide diff: the plan scans exactly one version's file set."""
    cat = _mk(spark, tmp_path)
    cat.append("core.t", _rows(spark, [(1, "a")]))
    cat.append("core.t", _rows(spark, [(2, "b")]))
    m = cat._load_manifest("core.t")
    n_added_v2 = len(set(m[1]["files"]) - set(m[0]["files"]))
    df = cat.changes("core.t", from_version=1)
    # The scan reads n_added_v2 files, not len(m[1]['files']).
    scanned = df.inputFiles()
    assert len(scanned) == n_added_v2
    assert all("part-" in f for f in scanned)


def test_overwrite_changes_are_delete_insert_pairs(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    cat.append("core.t", _rows(spark, [(1, "a"), (2, "b")]))
    cat.overwrite("core.t", _rows(spark, [(2, "b"), (9, "z")]))
    assert _feed(cat.changes("core.t", from_version=1)) == [
        (1, "a", "delete", 2),
        (9, "z", "insert", 2),
    ]


def test_multiset_semantics_surface_duplicate_count_changes(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    cat.append("core.t", _rows(spark, [(1, "a"), (1, "a")]))
    cat.overwrite("core.t", _rows(spark, [(1, "a")]))
    # One of the two duplicate rows disappeared: exceptAll sees it.
    assert _feed(cat.changes("core.t", from_version=1)) == [
        (1, "a", "delete", 2)
    ]


def test_mixed_history_and_bounds(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    cat.append("core.t", _rows(spark, [(1, "a")]))  # v1
    cat.append("core.t", _rows(spark, [(2, "b")]))  # v2
    cat.overwrite("core.t", _rows(spark, [(2, "b")]))  # v3: deletes (1,a)
    cat.append("core.t", _rows(spark, [(4, "d")]))  # v4
    assert _feed(cat.changes("core.t", from_version=2, to_version=4)) == [
        (1, "a", "delete", 3),
        (4, "d", "insert", 4),
    ]
    # Empty range is an empty typed frame.
    empty = cat.changes("core.t", from_version=4)
    assert empty.count() == 0
    assert "_change_type" in empty.columns
    with pytest.raises(ValueError):
        cat.changes("core.t", from_version=5)
    with pytest.raises(ValueError):
        cat.changes("core.t", from_version=3, to_version=2)


def test_changes_unreadable_after_vacuum(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    cat.append("core.t", _rows(spark, [(1, "a")]))
    cat.overwrite("core.t", _rows(spark, [(2, "b")]))  # retires v1's file
    cat.vacuum("core.t", retain_hours=0)
    with pytest.raises(ValueError, match="vacuumed"):
        cat.changes("core.t", from_version=1).collect()


def test_change_cursor_tails_incrementally(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    cur = cat.change_cursor("core.t", "indexer")
    cat.append("core.t", _rows(spark, [(1, "a")]))
    df, end = cur.poll()
    assert _feed(df) == [(1, "a", "insert", 1)] and end == 1
    # Not acked: a crashed consumer replays the same batch.
    df2, end2 = cur.poll()
    assert _feed(df2) == [(1, "a", "insert", 1)] and end2 == 1
    cur.ack(end)
    # Acked + nothing new: empty typed frame, offset unchanged.
    df3, end3 = cur.poll()
    assert df3.count() == 0 and end3 == 1
    cat.append("core.t", _rows(spark, [(2, "b")]))
    cat.overwrite("core.t", _rows(spark, [(2, "b")]))  # v3 deletes (1,a)
    df4, end4 = cur.poll()
    assert _feed(df4) == [
        (1, "a", "delete", 3),
        (2, "b", "insert", 2),
    ] and end4 == 3
    cur.ack(end4)
    cur.ack(1)  # backwards ack is a no-op
    assert cur.position() == 3
    # Independent consumers keep independent offsets.
    other = cat.change_cursor("core.t", "auditor")
    assert other.position() == 0
    # A fresh cursor object resumes from the durable offset.
    resumed = cat.change_cursor("core.t", "indexer")
    assert resumed.position() == 3


def test_long_append_run_batches_into_one_attributed_read(spark, tmp_path):
    """Round-8 batched replay: a run of consecutive append commits is
    served by ONE read whose rows are attributed back to their commits
    by source file — per-version rows must match exactly what the
    per-version loop produced, including across an interleaved rewrite
    that splits the run in two."""
    cat = _mk(spark, tmp_path)
    for i in range(1, 7):  # versions 1..6: one append run
        cat.append("core.t", _rows(spark, [(i, f"a{i}")]))
    cat.overwrite("core.t", _rows(spark, [(100, "ow")]))  # v7: rewrite
    cat.append("core.t", _rows(spark, [(8, "tail")]))     # v8: new run
    feed = _feed(cat.changes("core.t", from_version=0))
    # appends 1..6 attributed one row per version
    for i in range(1, 7):
        assert (i, f"a{i}", "insert", i) in feed
    # rewrite v7: snapshot diff deletes rows 1..6, inserts the overwrite
    assert (100, "ow", "insert", 7) in feed
    assert sum(1 for k, v, t, ver in feed if t == "delete" and ver == 7) == 6
    # v8 rides the second batched run
    assert (8, "tail", "insert", 8) in feed
    # tailing from inside the first run attributes only the tail of it
    mid = _feed(cat.changes("core.t", from_version=4, to_version=6))
    assert mid == [(5, "a5", "insert", 5), (6, "a6", "insert", 6)]


def test_replay_handles_legacy_full_files_entries(spark, tmp_path):
    """A legacy commit entry carrying a full `files` list (pre-delta-log
    format, or an externally crafted commit) acts as a snapshot reset in
    the replay; later delta commits build on it and every consumer sees
    consistent per-version file lists."""
    import json
    import os

    cat = _mk(spark, tmp_path)
    cat.append("core.t", _rows(spark, [(1, "a")]))
    # Craft a LEGACY full-form commit as version 2 (same live files).
    m1 = cat._load_manifest("core.t")
    with open(
        os.path.join(cat._commits_dir("core.t"), f"{2:012d}.json"), "w"
    ) as f:
        json.dump(
            {
                "version": 2,
                "action": "append",
                "ts_ns": 1,
                "files": m1[-1]["files"],
            },
            f,
        )
    cat.append("core.t", _rows(spark, [(3, "c")]))  # delta entry on top
    m = cat._load_manifest("core.t")
    assert [e["version"] for e in m] == [1, 2, 3]
    assert set(m[1]["files"]) == set(m1[-1]["files"])
    assert set(m[2]["files"]) > set(m[1]["files"])
    # raw log keeps the delta form for v3 (storage stays O(delta))
    raw = {e["version"]: e for e in cat._load_log("core.t")}
    assert "files" in raw[2] and "add" in raw[3] and "files" not in raw[3]
    assert sorted(r.k for r in cat.table("core.t").collect()) == [1, 3]
