"""Mechanical per-query bench envelope (VERDICT r10 #7).

The 2x envelope check used to cover only the 21 r01-comparable queries;
per-query drift elsewhere in the roster (the r10 `rest_subtotal` jump)
had no artifact to catch it. This script maintains BENCH_ENVELOPE.json —
each query's HONEST FLOOR, the fastest recording across every committed
bench artifact — and diffs any bench run against it.

Modes:

- ``--rebuild``: scan the committed bench history — the inline
  per-query tables of BENCH_r01–r03 plus every committed version of
  BENCH_local.json (the full roster artifact BENCH_r07+ reference) —
  and write the per-query min. Re-based entries (BASELINE.md protocol)
  exclude their dishonest early recordings: the r01 count-action
  prunes (`conditional_sum`, `json_extract_agg`, `text_fingerprint` —
  Catalyst optimized the measured expressions away entirely) and the
  pre-self-check `approx_percentile_check` floor. Sources whose roster
  is under ROSTER_COMPARABLE_FRACTION of the newest run's are skipped
  entirely: per-query wall in a full-roster session degrades slowly
  with roster size (committed history shows `split_contamination_
  ngrams` at 1.13-1.16s in the 128-131-query era vs 1.6-2.3s across
  every 200+-query run of IDENTICAL code), so a small-roster floor is
  not an apples-to-apples target. The r01-era 21-query contract is
  enforced separately by bench.py's `r01_comparable_subtotal` against
  BASELINE.md — this artifact is the full-roster drift net.
- default: check a bench JSON (arg, else BENCH_local.json) against the
  envelope. An entry FAILS at ratio > THRESHOLD (2.0, the BASELINE.md
  envelope) AND an absolute delta above MATERIAL_DELTA — sub-second
  entries swing 1.5-2.5x across identical-code rounds with JVM/codegen
  session state (measured: sketch_union_rollup 0.297-0.705s over
  r04-r11 with no code change, and a reduced-context best-of-3 probe of
  the same query runs SLOWER than its full-bench number, so the wobble
  is context, not code — same reasoning as SHUFFLE.md's material
  floor). Queries with no recorded floor are listed as new. Exit 1 on
  any failure, so the check can gate a round close. A failing entry is
  either a real regression (fix it) or machine drift (re-probe on an
  idle box; if the floor itself was a one-off, re-base via --rebuild
  after committing the honest run and note it in BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENVELOPE = os.path.join(ROOT, "BENCH_ENVELOPE.json")
THRESHOLD = 2.0
MATERIAL_DELTA = 0.5  # seconds above floor before a ratio is a finding
ROSTER_COMPARABLE_FRACTION = 0.6  # floor sources need a comparable roster

# BASELINE.md re-base protocol: recordings from these sources are NOT
# honest floors for these queries and are excluded from the min.
REBASED: dict[str, set[str]] = {
    # r01 measured with a count() action; these queries' measured
    # expressions were pruned (BASELINE.md round-4 note).
    "conditional_sum": {"r01"},
    "json_extract_agg": {"r01"},
    "text_fingerprint": {"r01"},
    "daily_totals": {"r01"},
    # pre-round-5 variant lacked the rank-verification pass
    # (BASELINE.md round-7 re-base).
    "approx_percentile_check": {"r01", "r02", "r03"},
}


def _inline_rounds() -> dict[str, dict[str, float]]:
    """Per-query timings from the rounds whose BENCH_r{N}.json carries
    the inline table (r01-r03; later rounds reference BENCH_local)."""
    out: dict[str, dict[str, float]] = {}
    for n in (1, 2, 3):
        path = os.path.join(ROOT, f"BENCH_r{n:02d}.json")
        if not os.path.exists(path):
            continue
        doc = json.load(open(path))
        parsed = doc.get("parsed") or doc
        queries = parsed.get("queries") if isinstance(parsed, dict) else None
        if queries:
            out[f"r{n:02d}"] = {k: float(v) for k, v in queries.items()}
    return out


def _bench_local_history() -> dict[str, dict[str, float]]:
    """Every committed version of BENCH_local.json, keyed by short sha."""
    shas = subprocess.run(
        ["git", "log", "--format=%h", "--", "BENCH_local.json"],
        cwd=ROOT,
        capture_output=True,
        text=True,
        check=True,
    ).stdout.split()
    out: dict[str, dict[str, float]] = {}
    for sha in shas:
        blob = subprocess.run(
            ["git", "show", f"{sha}:BENCH_local.json"],
            cwd=ROOT,
            capture_output=True,
            text=True,
        )
        if blob.returncode != 0:
            continue
        try:
            doc = json.loads(blob.stdout)
        except json.JSONDecodeError:
            continue
        queries = doc.get("queries")
        if queries:
            out[sha] = {k: float(v) for k, v in queries.items()}
    return out


def rebuild() -> None:
    sources = _inline_rounds()
    sources.update(_bench_local_history())
    if not sources:
        raise SystemExit(
            "no committed bench artifact carries a per-query table "
            "(need BENCH_r01-r03 inline tables or a committed "
            "BENCH_local.json) — nothing to rebuild floors from"
        )
    current = max(len(q) for q in sources.values())
    kept = {
        src: queries
        for src, queries in sources.items()
        if len(queries) >= ROSTER_COMPARABLE_FRACTION * current
    }
    dropped = sorted(set(sources) - set(kept))
    if dropped:
        print(
            f"skipped {len(dropped)} small-roster sources (<"
            f"{ROSTER_COMPARABLE_FRACTION:.0%} of {current} queries): "
            + ", ".join(dropped)
        )
    sources = kept
    floors: dict[str, dict] = {}
    for src, queries in sources.items():
        for name, sec in queries.items():
            if src in REBASED.get(name, set()):
                continue
            cur = floors.get(name)
            if cur is None or sec < cur["floor"]:
                floors[name] = {"floor": round(sec, 3), "source": src}
    doc = {
        "threshold": THRESHOLD,
        "note": (
            "Honest per-query floors: min across every committed bench "
            "artifact, excluding re-based recordings (BASELINE.md "
            "protocol; see scripts/bench_envelope.py REBASED). Check "
            "with: python scripts/bench_envelope.py [bench.json]"
        ),
        "n_sources": len(sources),
        "floors": dict(sorted(floors.items())),
    }
    with open(ENVELOPE, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(f"wrote {len(floors)} floors from {len(sources)} sources")


def check(bench_path: str) -> int:
    env = json.load(open(ENVELOPE))
    floors = env["floors"]
    doc = json.load(open(bench_path))
    queries = (doc.get("parsed") or doc).get("queries") or {}
    if not queries:
        print(f"{bench_path}: no per-query table found", file=sys.stderr)
        return 2
    failures, new = [], []
    for name, sec in sorted(queries.items()):
        entry = floors.get(name)
        if entry is None:
            new.append(name)
            continue
        ratio = float(sec) / max(entry["floor"], 1e-9)
        if (
            ratio > env.get("threshold", THRESHOLD)
            and float(sec) - entry["floor"] > MATERIAL_DELTA
        ):
            failures.append((name, float(sec), entry["floor"], ratio))
    if new:
        print(f"{len(new)} queries without floors yet (new since last "
              f"--rebuild): {', '.join(new)}")
    if failures:
        print(f"\n{len(failures)} entries above {THRESHOLD}x their floor:")
        print(f"{'query':40s} {'now':>8s} {'floor':>8s} {'ratio':>7s}")
        for name, sec, floor, ratio in sorted(
            failures, key=lambda r: -r[3]
        ):
            print(f"{name:40s} {sec:8.3f} {floor:8.3f} {ratio:6.1f}x")
        print(
            "\nEach is a regression (fix) or machine drift (re-probe "
            "idle; re-base per BASELINE.md if the floor was a one-off)."
        )
        return 1
    print(
        f"all {len(queries) - len(new)} floored entries within "
        f"{THRESHOLD}x of their honest floors"
    )
    return 0


if __name__ == "__main__":
    if "--rebuild" in sys.argv:
        rebuild()
    else:
        args = [a for a in sys.argv[1:] if not a.startswith("-")]
        path = args[0] if args else os.path.join(ROOT, "BENCH_local.json")
        sys.exit(check(path))
