"""Driver-evidence budget guard: every query without a prior driver
CORRECTNESS row — and every proven query whose IMPLEMENTATION changed
since it was proven (stale fingerprint) — must sit inside the driver's
50-row check window, or it can never (re-)earn evidence. Fails when
additions overflow the budget — the fix is to retire a query or wait
for the next round's proven-set update."""

from __future__ import annotations

import json
import os

from certified_dogs_and_cats_spark.queries import (
    _DRIVER_PROVEN,
    _STALE,
    ORACLE,
    QUERIES,
)

DRIVER_WINDOW = 50


def _needs_evidence(name: str) -> bool:
    return name not in _DRIVER_PROVEN or name in _STALE


def test_unproven_queries_fill_driver_window():
    """The window must never WASTE a slot: while any query needs
    (re-)proving, every one of the 50 checked positions holds such a
    query. More than 50 is allowed — the overflow is the
    LAST-registered ones, which queue for the next round — but a
    settled query sitting inside the window while a needy one waits
    outside is a bug."""
    names = list(QUERIES)
    needy = [n for n in names if _needs_evidence(n)]
    window = names[: min(DRIVER_WINDOW, len(needy))]
    wasted = [n for n in window if not _needs_evidence(n)]
    assert not wasted, f"settled queries occupying window slots: {wasted}"
    overflow = needy[DRIVER_WINDOW:]
    assert overflow == [
        n for n in names[DRIVER_WINDOW:] if _needs_evidence(n)
    ], "overflowed queries must be the last-registered ones"


def test_never_proven_queries_lead_the_window():
    """VERDICT r12 #1: a query with ZERO driver rows anywhere must sit
    ahead of every stale re-proof — registration order used to leave
    last-registered never-proven queries behind ~66 re-proofs, outside
    the 50-row window."""
    from certified_dogs_and_cats_spark.queries import _PROOF_ROUNDS

    if not _PROOF_ROUNDS:
        return  # fresh checkout: no artifacts, ordering is registration
    names = list(QUERIES)
    never_pos = [i for i, n in enumerate(names) if n not in _PROOF_ROUNDS]
    stale_pos = [i for i, n in enumerate(names) if n in _STALE]
    if never_pos and stale_pos:
        assert max(never_pos) < min(stale_pos), (
            "never-driver-proven queries must precede stale re-proofs"
        )
    # and every never-proven query is inside the driver window
    assert all(i < DRIVER_WINDOW for i in never_pos[:DRIVER_WINDOW]), (
        "never-proven queries pushed out of the 50-row window"
    )


def test_every_query_has_oracle_and_unique_name():
    assert set(ORACLE) <= set(QUERIES)
    # Every registered query carries a DuckDB oracle — the round-8
    # series-ln rewrite (functions/detln.py) closed the last rows-only
    # entry (bm25_textbook_topk), so the allowlist is now EMPTY; any new
    # exception must re-argue its case here.
    assert set(QUERIES) == set(ORACLE)


# ---------------------------------------------------------------------------
# Fingerprint re-entry rule (VERDICT r7 ask #2): driver evidence tracks
# the CODE, not the name.
# ---------------------------------------------------------------------------


def test_fingerprint_covers_function_source_and_oracle():
    """Editing either the Spark callable or its oracle SQL must change
    the fingerprint (both sides of the contract need re-proving)."""
    from certified_dogs_and_cats_spark.queries.fingerprints import (
        query_fingerprint,
    )

    def q_v1(spark, sf_dir):
        return 1

    def q_v2(spark, sf_dir):
        return 2

    base = query_fingerprint(q_v1, "SELECT 1")
    assert query_fingerprint(q_v2, "SELECT 1") != base
    assert query_fingerprint(q_v1, "SELECT 2") != base
    assert query_fingerprint(q_v1, "SELECT 1") == base  # deterministic


def test_fingerprint_covers_extension_module_dependency():
    """A query whose body imports a package extension must embed that
    module's file hash — the round-7 gap: `fuzzy_name_pairs` was
    rewritten in extensions/dedup.py without its queries/ wrapper
    changing, and kept its stale green row."""
    from certified_dogs_and_cats_spark.queries import formats
    from certified_dogs_and_cats_spark.queries.fingerprints import (
        _file_sha,
        _gather,
    )

    _, _, deps = _gather(formats.fuzzy_name_pairs)
    assert "certified_dogs_and_cats_spark.extensions.dedup" in deps
    # and the dep participates via its FILE hash, so any edit flips it
    import certified_dogs_and_cats_spark.extensions.dedup as dmod

    assert len(_file_sha(dmod.__file__)) == 64


def test_fingerprint_covers_same_module_helpers():
    """bm25_textbook_topk delegates to _bm25_scored; editing the helper
    must invalidate the query even though the query's own 2-line body
    is unchanged."""
    from certified_dogs_and_cats_spark.queries import terms
    from certified_dogs_and_cats_spark.queries.fingerprints import _gather

    sources, consts, deps = _gather(terms.bm25_textbook_topk)
    assert any("_bm25_scored" in s for s in sources)
    # constants the scorer reads are value-pinned
    assert any("BM25_K1=1.2" in c for c in consts)
    # and the series-ln module is a captured dependency
    assert "certified_dogs_and_cats_spark.functions.detln" in deps


def test_stale_fingerprint_reenters_window():
    """The rotation front = unproven + stale-proven: a proven query
    recorded with a mismatching fingerprint must be ordered before
    settled proven queries."""
    from certified_dogs_and_cats_spark.queries.fingerprints import (
        changed_since_recorded,
    )

    current = {"a": "fp_a", "b": "fp_b", "c": "fp_c"}
    recorded = {"a": "fp_a", "b": "OLD", "c": ""}
    assert changed_since_recorded(
        ["a", "b", "c"], recorded=recorded, current=current
    ) == {"b", "c"}
    # unrecorded = changed (never proven at this code)
    assert changed_since_recorded(
        ["d"], recorded=recorded, current={"d": "x"}
    ) == {"d"}


def test_fingerprint_artifact_covers_registry_and_latest_greens():
    """The gap that survived rounds 10 AND 11: queries proven by the
    latest driver run were left unstamped because stamping was a manual
    round-start step. Mechanical guard, two invariants:

    1. QUERY_FINGERPRINTS.json has a key for EVERY registered query
       (scripts/record_fingerprints.py writes "" for new/needy entries,
       so "present but empty" is the only legal not-yet-proven state);
    2. every query green in the NEWEST committed CORRECTNESS_r*.json
       carries a NON-EMPTY stamp — driver evidence exists, so an empty
       stamp means `record_fingerprints.py --sync` was skipped.
    """
    import glob
    import json
    import os

    from certified_dogs_and_cats_spark.queries.fingerprints import (
        recorded_fingerprints,
    )

    recorded = recorded_fingerprints()
    missing_keys = sorted(set(QUERIES) - set(recorded))
    assert not missing_keys, (
        f"{len(missing_keys)} registered queries absent from "
        f"QUERY_FINGERPRINTS.json — run scripts/record_fingerprints.py: "
        f"{missing_keys[:10]}"
    )

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    if not files:
        return
    with open(files[-1]) as fh:
        latest = json.load(fh)
    greens = [
        n
        for n, row in latest.items()
        if n in QUERIES
        and isinstance(row, dict)
        and row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match", True)
        and row.get("err") in (None, "")
    ]
    unstamped = sorted(n for n in greens if not recorded.get(n))
    assert not unstamped, (
        f"driver-green queries with no recorded fingerprint — run "
        f"scripts/record_fingerprints.py --sync: {unstamped}"
    )


def test_recorded_artifact_is_current_for_settled_queries():
    """QUERY_FINGERPRINTS.json must stay in sync with the tree: every
    driver-proven query not deliberately re-entered this round matches
    its recorded fingerprint (i.e. _STALE is an intentional, small set
    — a huge stale set means someone forgot to run
    scripts/record_fingerprints.py after changing implementations)."""
    assert _STALE <= _DRIVER_PROVEN
    # Mid-round, heavy extension edits legitimately invalidate many
    # consumers at once; the binding constraint is the WINDOW — needy
    # (unproven + stale) entries beyond it queue for the next round and
    # scripts/record_fingerprints.py keeps them unstamped. A stale set
    # larger than the whole window therefore still works, but signals
    # the re-record step was skipped for multiple rounds.
    needy = [
        n for n in QUERIES if n not in _DRIVER_PROVEN or n in _STALE
    ]
    if len(needy) <= DRIVER_WINDOW + 10:
        return
    # Optimization rounds legitimately re-enter several extension
    # families at once (r12: graph/dedup/text/olap edits -> ~70 needy),
    # and their driver pass re-proves the FULL registry, not a 50-row
    # window. That churn is not a forgotten re-record IF the full local
    # gate (scripts/check_correctness.py over all registered queries ->
    # CORRECTNESS_local.json) has re-proven every needy entry on the
    # current code: the alarm below then fires only for needy queries
    # with no current local proof — the genuinely unaccounted ones.
    # "Current code" is enforced, not trusted (ADVICE r12 #3): the gate
    # stamps each run with per-query fingerprints, and a local green
    # counts only when that stamp matches the query's fingerprint NOW.
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    local: dict = {}
    try:
        with open(os.path.join(root, "CORRECTNESS_local.json")) as fh:
            local = json.load(fh)
    except (OSError, ValueError):
        pass
    gate_fps = local.pop("_fingerprints", {})
    from certified_dogs_and_cats_spark.queries.fingerprints import (
        current_fingerprints,
    )

    now_fps = current_fingerprints()

    def _green(row: object) -> bool:
        return (
            isinstance(row, dict)
            and bool(row.get("rows_match"))
            and bool(row.get("schema_match"))
            and bool(row.get("hash_match", True))
            and row.get("err") in (None, "")
        )

    full_local_gate = set(QUERIES) <= set(local)
    unaccounted = [
        n
        for n in needy
        if not (
            full_local_gate
            and _green(local.get(n))
            and gate_fps.get(n) == now_fps.get(n)
        )
    ]
    assert not unaccounted, (
        f"{len(needy)} queries need (re-)proving — more than a round's "
        f"window can absorb, and {len(unaccounted)} of them have no "
        f"full-registry local proof either; re-record, stage the edits, "
        f"or run the full local gate: {sorted(unaccounted)[:10]}"
    )
