"""Optimistic-concurrency commits: version claims, append rebase+retry,
rewrite conflicts, and crash-window recovery (catalog.py OCC protocol)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import types as T

from certified_dogs_and_cats_spark.pipeline.catalog import (
    Catalog,
    ConcurrentWriteConflict,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.IntegerType(), False),
        T.StructField("v", T.StringType(), True),
    ]
)


def _mk(spark, tmp_path, name="core.t"):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.register(name, SCHEMA)
    return cat


def _rows(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_two_catalog_instances_share_one_log(spark, tmp_path):
    """Two writer handles over the same root interleave appends; both land,
    versions are consecutive, and the final table is the union."""
    a = _mk(spark, tmp_path)
    b = Catalog(spark, str(tmp_path / "wh"))
    b.register("core.t", SCHEMA)
    a.append("core.t", _rows(spark, [(1, "a")]))
    b.append("core.t", _rows(spark, [(2, "b")]))
    a.append("core.t", _rows(spark, [(3, "c")]))
    assert a.current_version("core.t") == 3
    assert b.current_version("core.t") == 3
    assert sorted(r.k for r in a.table("core.t").collect()) == [1, 2, 3]
    # Each append's version contains its predecessor's files plus its own.
    h = a.history("core.t")
    assert [e["version"] for e in h] == [1, 2, 3]
    m = a._load_manifest("core.t")
    assert len(m[0]["files"]) < len(m[1]["files"]) < len(m[2]["files"])


def test_append_rebases_over_stolen_version(spark, tmp_path):
    """If another writer claims the next version mid-commit, a blind append
    rebases on the new log and lands at the version after — no lost
    update, and the stolen version's files are carried forward."""
    cat = _mk(spark, tmp_path)
    cat.append("core.t", _rows(spark, [(1, "a")]))
    # Simulate a concurrent writer that claimed version 2 directly in the
    # commit log (as a real racing process would between our read and link).
    cdir = cat._commits_dir("core.t")
    entry = {
        "version": 2,
        "action": "append",
        "ts_ns": 0,
        "files": cat._load_manifest("core.t")[-1]["files"] + ["intruder.parquet"],
    }
    with open(os.path.join(cdir, f"{2:012d}.json"), "w") as f:
        json.dump(entry, f)
    cat.append("core.t", _rows(spark, [(3, "c")]))
    m = cat._load_manifest("core.t")
    assert [e["version"] for e in m] == [1, 2, 3]
    # Version 3 = version 2's files (incl. the racer's) + our new files.
    assert "intruder.parquet" in m[2]["files"]
    assert len(m[2]["files"]) > len(m[1]["files"])


def test_overwrite_conflict_raises(spark, tmp_path):
    """A whole-table rewrite cannot rebase: when the log advanced under
    it, it must raise instead of silently clobbering the racer's commit."""
    cat = _mk(spark, tmp_path)
    cat.append("core.t", _rows(spark, [(1, "a")]))
    real_load = cat._load_log  # the raw reader _commit races through

    def racing_load(name):
        m = real_load(name)
        # After this writer reads the log, a racer claims the next version.
        v = (m[-1]["version"] + 1) if m else 1
        marker = os.path.join(cat._commits_dir(name), f"{v:012d}.json")
        if not os.path.exists(marker):
            with open(marker, "w") as f:
                json.dump(
                    {"version": v, "action": "append", "ts_ns": 0, "files": []},
                    f,
                )
            m = m  # this writer still believes version v is free
        return m

    cat._load_log = racing_load
    with pytest.raises(ConcurrentWriteConflict):
        cat.overwrite("core.t", _rows(spark, [(9, "z")]))
    cat._load_log = real_load


def test_crash_window_commit_survives_without_checkpoint(spark, tmp_path):
    """A commit file whose writer died before merging the checkpoint is
    still part of the log: reads see it, and the next commit builds on it."""
    cat = _mk(spark, tmp_path)
    cat.append("core.t", _rows(spark, [(1, "a")]))
    # Orphan commit: claimed + fully written, checkpoint never merged.
    prev = cat._load_manifest("core.t")[-1]
    with open(
        os.path.join(cat._commits_dir("core.t"), f"{2:012d}.json"), "w"
    ) as f:
        json.dump(
            {
                "version": 2,
                "action": "append",
                "ts_ns": 1,
                "files": prev["files"],
            },
            f,
        )
    # manifest.json still only has version 1; the log reader must merge.
    with open(cat._manifest_path("core.t")) as f:
        assert [e["version"] for e in json.load(f)] == [1]
    assert cat.current_version("core.t") == 2
    cat.append("core.t", _rows(spark, [(3, "c")]))
    assert cat.current_version("core.t") == 3
    # The checkpoint now includes the orphan.
    with open(cat._manifest_path("core.t")) as f:
        assert [e["version"] for e in json.load(f)] == [1, 2, 3]


def test_append_attribution_is_exact_under_foreign_files(spark, tmp_path):
    """Files another in-flight writer placed in the table directory (not
    yet committed) must NOT leak into this append's version file list."""
    cat = _mk(spark, tmp_path)
    cat.append("core.t", _rows(spark, [(1, "a")]))
    # A racer's uncommitted data file sits in the directory.
    foreign = os.path.join(cat.tables["core.t"].path, "part-foreign.parquet")
    _rows(spark, [(99, "x")]).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "f")
    )
    src = next(
        p
        for p in os.listdir(tmp_path / "f")
        if p.endswith(".parquet") and not p.startswith((".", "_"))
    )
    os.replace(str(tmp_path / "f" / src), foreign)
    cat.append("core.t", _rows(spark, [(2, "b")]))
    latest = cat._load_manifest("core.t")[-1]
    assert "part-foreign.parquet" not in latest["files"]
    # Snapshot reads honor the log, not the directory: row 99 is invisible
    # at the committed version.
    ver = cat.current_version("core.t")
    assert sorted(r.k for r in cat.table("core.t", version=ver).collect()) == [
        1,
        2,
    ]


def test_copy_into_claim_blocks_stale_racer(spark, tmp_path):
    """A COPY INTO run departing from an already-claimed log state must
    ingest nothing — the racer that claimed that state owns those files."""
    import csv

    cat = _mk(spark, tmp_path)
    src = tmp_path / "src"
    src.mkdir()
    with open(src / "a.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["k", "v"])
        w.writerow([1, "a"])
    n_files, n_rows = cat.copy_into("core.t", str(src))
    assert (n_files, n_rows) == (1, 1)
    # Simulate a stale racer: restore the pre-claim log state view by
    # resetting the log, leaving the claim marker in place.
    log = cat._copy_into_log_path("core.t")
    os.replace(log, log + ".bak")
    stale = cat.copy_into("core.t", str(src))
    assert stale == (0, 0)  # claim-0 already taken; no double ingest
    os.replace(log + ".bak", log)
    # A genuinely new file from the advanced state still loads.
    with open(src / "b.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["k", "v"])
        w.writerow([2, "b"])
    assert cat.copy_into("core.t", str(src)) == (1, 1)
    assert sorted(r.k for r in cat.table("core.t").collect()) == [1, 2]


def test_time_travel_still_works_across_occ_appends(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    cat.append("core.t", _rows(spark, [(1, "a")]))
    cat.append("core.t", _rows(spark, [(2, "b")]))
    cat.overwrite("core.t", _rows(spark, [(7, "z")]))
    assert sorted(r.k for r in cat.table("core.t", version=1).collect()) == [1]
    assert sorted(r.k for r in cat.table("core.t", version=2).collect()) == [
        1,
        2,
    ]
    assert sorted(r.k for r in cat.table("core.t", version=3).collect()) == [7]


def test_vacuum_prunes_checkpointed_commit_files(spark, tmp_path):
    """Metadata retention: commit files merged into the checkpoint AND
    older than the retention window are pruned; unmerged or recent ones
    survive, and the log still reads identically."""
    cat = _mk(spark, tmp_path)
    cat.append("core.t", _rows(spark, [(1, "a")]))
    cat.append("core.t", _rows(spark, [(2, "b")]))
    cdir = cat._commits_dir("core.t")
    assert len([f for f in os.listdir(cdir) if f.endswith(".json")]) == 2
    # Unexpired: nothing pruned.
    cat.vacuum("core.t", retain_hours=1)
    assert len([f for f in os.listdir(cdir) if f.endswith(".json")]) == 2
    # Expired + checkpointed: pruned, log unchanged.
    cat.vacuum("core.t", retain_hours=0)
    assert [f for f in os.listdir(cdir) if f.endswith(".json")] == []
    assert [e["version"] for e in cat._load_manifest("core.t")] == [1, 2]
    # An orphan commit (not in the checkpoint) survives any retention.
    with open(os.path.join(cdir, f"{3:012d}.json"), "w") as f:
        json.dump({"version": 3, "action": "append", "ts_ns": 0, "files": []}, f)
    cat.vacuum("core.t", retain_hours=0)
    assert [f for f in os.listdir(cdir) if f.endswith(".json")] == [
        f"{3:012d}.json"
    ]
    assert cat.current_version("core.t") == 3


def test_threaded_appends_all_land(spark, tmp_path):
    """Real races: two threads interleave appends through separate Catalog
    handles over one root. Every append must land exactly once — version
    chain contiguous, all rows present, every commit's file list a strict
    superset of its predecessor's."""
    import threading

    a = _mk(spark, tmp_path)
    b = Catalog(spark, str(tmp_path / "wh"))
    b.register("core.t", SCHEMA)
    errs: list[Exception] = []

    def writer(cat, base):
        try:
            for i in range(4):
                cat.append("core.t", _rows(spark, [(base + i, f"w{base+i}")]))
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    t1 = threading.Thread(target=writer, args=(a, 100))
    t2 = threading.Thread(target=writer, args=(b, 200))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    m = a._load_manifest("core.t")
    assert [e["version"] for e in m] == list(range(1, 9))
    for prev, cur in zip(m, m[1:]):
        assert set(prev["files"]) < set(cur["files"])
    got = sorted(r.k for r in a.table("core.t").collect())
    assert got == [100, 101, 102, 103, 200, 201, 202, 203]


def test_threaded_appends_race_through_checkpoints(spark, tmp_path):
    """The round-9 checkpoint path under a REAL race: two handles with
    checkpoint_interval=2 interleave appends (with per-stream txn
    markers), so checkpoint writes themselves race. Every append must
    land exactly once, every version stay time-travel readable, every
    txn batch be visible, and the newest checkpoint must reproduce the
    head state it claims."""
    import threading

    a = _mk(spark, tmp_path)
    a.checkpoint_interval = 2
    b = Catalog(spark, str(tmp_path / "wh"))
    b.checkpoint_interval = 2
    b.register("core.t", SCHEMA)
    errs: list[Exception] = []

    def writer(cat, base, stream):
        try:
            for i in range(4):
                cat.append(
                    "core.t",
                    _rows(spark, [(base + i, f"w{base + i}")]),
                    txn={"stream_id": stream, "batch_id": i},
                )
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    t1 = threading.Thread(target=writer, args=(a, 100, "sa"))
    t2 = threading.Thread(target=writer, args=(b, 200, "sb"))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    fresh = Catalog(spark, str(tmp_path / "wh"))
    fresh.register("core.t", SCHEMA)
    assert fresh.current_version("core.t") == 8
    got = sorted(r.k for r in fresh.table("core.t").collect())
    assert got == [100, 101, 102, 103, 200, 201, 202, 203]
    # every version readable, row count monotonic by construction
    for v in range(1, 9):
        assert len(fresh.table("core.t", version=v).collect()) == v
    for stream in ("sa", "sb"):
        for bid in range(4):
            assert fresh.txn_committed("core.t", stream, bid)
        assert not fresh.txn_committed("core.t", stream, 4)
    ckdir = fresh._ckpt_dir("core.t")
    cks = sorted(os.listdir(ckdir))
    assert cks, "interval=2 over 8 commits must have checkpointed"
    newest = json.load(open(os.path.join(ckdir, cks[-1])))
    v = newest["version"]
    # the truncated manifest is checkpoint-grounded: its entry for v must
    # carry exactly the checkpoint's file list
    entry = next(
        e for e in fresh._load_manifest("core.t") if e["version"] == v
    )
    want = {os.path.basename(p) for p in entry["files"]}
    assert {os.path.basename(p) for p in newest["files"]} == want


def test_dml_scans_manifest_not_directory(spark, tmp_path):
    """Row-level DML must match against the manifest's LIVE files, never
    the directory listing: the table dir also holds other writers'
    not-yet-committed staged files. LAKEHOUSE_STRESS caught the
    directory scan turning OCC retries exponential (a conflicted
    update's orphaned copies re-matched on every retry: 5 rows became
    5 * 2^17)."""
    import shutil

    cat = _mk(spark, tmp_path)
    cat.append("core.t", _rows(spark, [(1, "a"), (2, "b")]))
    # Simulate another writer's in-flight staging: a valid data file in
    # the table directory that NO committed version references.
    spec = cat.tables["core.t"]
    staged = str(tmp_path / "orphan")
    _rows(spark, [(1, "orphan"), (2, "orphan")]).coalesce(1).write.parquet(
        staged
    )
    for fn in os.listdir(staged):
        if fn.endswith(".parquet"):
            shutil.copy(
                os.path.join(staged, fn),
                os.path.join(spec.path, f"orphan-{fn}"),
            )
    # update must see exactly ONE k=1 row (the committed one) — the
    # orphan is invisible to a manifest-scoped scan.
    n = cat.update_where("core.t", {"v": "'upd'"}, "k = 1")
    assert n == 1
    assert cat.delete_where("core.t", "k = 2") == 1
    got = sorted((r.k, r.v) for r in cat.table("core.t").collect())
    assert got == [(1, "upd")]


def test_delete_commit_keeps_predecessor_file_list(spark, tmp_path):
    """A DV delete changes no data files, so its commit must carry the
    PREDECESSOR's file list — snapshotting the directory instead would
    promote concurrent writers' staged (uncommitted) files into the
    live set."""
    cat = _mk(spark, tmp_path)
    cat.append("core.t", _rows(spark, [(1, "a"), (2, "b")]))
    spec = cat.tables["core.t"]
    # Drop an unreferenced file into the directory before the delete.
    with open(os.path.join(spec.path, "not-data.parquet"), "wb") as f:
        f.write(b"PAR1junk")
    cat.delete_where("core.t", "k = 2")
    m = cat._load_manifest("core.t")
    assert set(m[-1]["files"]) == set(m[-2]["files"])
    assert "not-data.parquet" not in m[-1]["files"]


def test_conflicted_update_unstages_its_files(spark, tmp_path):
    """An update that loses the version race must remove BOTH its staged
    copies and its DV sidecar — they were never referenced by any
    committed version and would otherwise accumulate as garbage."""
    cat = _mk(spark, tmp_path)
    cat.append("core.t", _rows(spark, [(1, "a"), (2, "b")]))
    spec = cat.tables["core.t"]
    files_before = set(cat._data_files(spec.path))
    dv_dir = cat._dv_dir("core.t")
    dvs_before = set(os.listdir(dv_dir)) if os.path.isdir(dv_dir) else set()

    real_load = cat._load_log

    import inspect as _inspect

    injected = []

    def racing_load(name, full=False):
        m = real_load(name, full=full)
        in_commit = any(
            fr.function == "_commit" for fr in _inspect.stack()[1:4]
        )
        if injected or not in_commit:
            return m
        # One racing DELTA-form append (no files touched) lands in the
        # window between this writer's snapshot read (base_version) and
        # its version claim — the conflict expected_base must catch.
        v = (m[-1]["version"] + 1) if m else 1
        marker = os.path.join(cat._commits_dir(name), f"{v:012d}.json")
        with open(marker, "w") as f:
            json.dump(
                {"version": v, "action": "append", "ts_ns": 0,
                 "add": [], "remove": []},
                f,
            )
        injected.append(v)
        return m

    cat._load_log = racing_load
    with pytest.raises(ConcurrentWriteConflict):
        cat.update_where("core.t", {"v": "'x'"}, "k = 1")
    cat._load_log = real_load
    assert set(cat._data_files(spec.path)) == files_before
    dvs_after = set(os.listdir(dv_dir)) if os.path.isdir(dv_dir) else set()
    assert dvs_after == dvs_before
    # And the clean retry applies exactly once.
    assert cat.update_where("core.t", {"v": "'x'"}, "k = 1") == 1
    got = sorted((r.k, r.v) for r in cat.table("core.t").collect())
    assert got == [(1, "x"), (2, "b")]


def test_vacuum_protects_tagged_versions_dv_sidecars(spark, tmp_path):
    """A tagged version must keep its deletion-vector sidecars through
    VACUUM RETAIN 0 — its data files were already protected, but the
    sidecar expiry ignored tags and broke the named ref's time travel
    (LAKEHOUSE_STRESS finding)."""
    cat = _mk(spark, tmp_path)
    cat.append("core.t", _rows(spark, [(1, "a"), (2, "b"), (3, "c")]))
    cat.delete_where("core.t", "k = 2")
    tag_v = cat.current_version("core.t")
    cat.set_tag("core.t", "audit", tag_v)
    # Advance the head past the tag and reset the DV set via overwrite.
    cat.overwrite("core.t", _rows(spark, [(9, "z")]))
    cat.vacuum("core.t", 0.0)
    got = sorted(
        (r.k, r.v) for r in cat.table("core.t", version=tag_v).collect()
    )
    assert got == [(1, "a"), (3, "c")]
