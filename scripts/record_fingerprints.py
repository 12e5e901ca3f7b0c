"""Maintain QUERY_FINGERPRINTS.json — each query's implementation
fingerprint AS OF ITS LAST DRIVER-GREEN PROOF.

The registry rotation (queries/__init__.py::_stale_proven) fronts any
query whose current fingerprint diverges from its recorded one, so
driver evidence tracks the CODE, not the name. That contract fixes WHEN
an entry may be stamped: only once driver evidence exists for the code
the stamp describes.

Two modes:

- ``--sync`` (run at ROUND START, after a new CORRECTNESS_r*.json
  lands): every query green in the NEWEST artifact gets stamped with its
  current fingerprint — the driver ran against the previous round's
  final commit, and nothing has changed since, so current == proven
  code. Queries not green in that artifact keep their old stamps.
- default (run at ROUND END, last commit): refresh stamps ONLY for
  queries that are settled (driver-proven AND fingerprint-unchanged —
  for them this is a no-op by definition) and leave every needy entry
  (unproven, or proven-but-since-edited) UNSTAMPED so it stays at the
  front of the driver window until a new artifact proves the new code.
  ``--stale n1 n2`` additionally blanks entries known to be stale (e.g.
  flagged by a judge review).

The bootstrap case (no file yet) records everything as-is; use
``--stale`` for any queries already known to have changed post-proof.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from certified_dogs_and_cats_spark.queries import (  # noqa: E402
    _DRIVER_PROVEN,
    _STALE,
    ORACLE,
    QUERIES,
)
from certified_dogs_and_cats_spark.queries.fingerprints import (  # noqa: E402
    current_fingerprints,
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "QUERY_FINGERPRINTS.json")


def _latest_artifact() -> dict:
    files = sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")))
    if not files:
        return {}
    with open(files[-1]) as fh:
        return json.load(fh)


def _green(row: dict) -> bool:
    return bool(
        isinstance(row, dict)
        and row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match", True)
        and row.get("err") in (None, "")
    )


def main() -> None:
    sync = len(sys.argv) > 1 and sys.argv[1] == "--sync"
    stale: set[str] = set()
    if len(sys.argv) > 1 and sys.argv[1] == "--stale":
        stale = set(sys.argv[2:])
        unknown = stale - set(QUERIES)
        if unknown:
            raise SystemExit(f"unknown query names: {sorted(unknown)}")
    cur = current_fingerprints(QUERIES, ORACLE)
    prior: dict[str, str] = {}
    try:
        with open(OUT) as fh:
            prior = json.load(fh)
    except (OSError, ValueError):
        pass
    if not prior:
        # Bootstrap: no recorded state — stamp everything as-is.
        fps = dict(cur)
        mode = "bootstrap"
    elif sync:
        fps = dict(prior)
        greens = [n for n, row in _latest_artifact().items() if _green(row)]
        for n in greens:
            if n in cur:
                fps[n] = cur[n]
        mode = f"sync ({len(greens)} green rows stamped)"
    else:
        # Round end: stamps may only describe driver-proven code — needy
        # entries keep their old (mismatching or absent) values so the
        # rotation keeps them in the window for the coming driver run.
        fps = {}
        kept = 0
        for n in QUERIES:
            needy = n not in _DRIVER_PROVEN or n in _STALE
            if needy:
                if n in prior:
                    fps[n] = prior[n]
                kept += 1
            else:
                fps[n] = cur[n]
        mode = f"round-end ({kept} needy entries left unstamped)"
    for name in stale:
        fps[name] = ""
    # Full-registry coverage invariant (r11 VERDICT ask #2): every
    # registered query owns a key — new queries get an explicit empty
    # stamp ("" = never proven at this code, stays needy) so
    # tests/test_registry_window.py can mechanically detect a query
    # that was proven but never stamped.
    for n in QUERIES:
        fps.setdefault(n, "")
    fps = {n: v for n, v in fps.items() if n in QUERIES}
    with open(OUT, "w") as fh:
        json.dump(dict(sorted(fps.items())), fh, indent=1)
        fh.write("\n")
    print(
        f"recorded {len(fps)} fingerprints [{mode}]"
        + (f" ({len(stale)} forced stale)" if stale else "")
    )


if __name__ == "__main__":
    main()
