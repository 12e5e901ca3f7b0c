"""Record per-query implementation fingerprints to QUERY_FINGERPRINTS.json.

Run as the LAST step of each round (after the final implementation
commit): the file then snapshots the code the driver's correctness gate
is about to prove, and the registry rotation
(queries/__init__.py::_stale_proven) re-enters any query whose
implementation later diverges from its recorded-at-proof fingerprint.

Usage:
    python scripts/record_fingerprints.py              # record all
    python scripts/record_fingerprints.py --stale n1   # blank entries
                                                       # (force re-entry)

``--stale`` marks queries KNOWN to have changed after their last green
row (e.g. flagged by a judge review) by recording an empty fingerprint
that can never match.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from certified_dogs_and_cats_spark.queries import ORACLE, QUERIES
from certified_dogs_and_cats_spark.queries.fingerprints import (
    current_fingerprints,
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "QUERY_FINGERPRINTS.json")


DRIVER_WINDOW = 50


def main() -> None:
    stale: set[str] = set()
    if len(sys.argv) > 1 and sys.argv[1] == "--stale":
        stale = set(sys.argv[2:])
        unknown = stale - set(QUERIES)
        if unknown:
            raise SystemExit(f"unknown query names: {sorted(unknown)}")
    fps = current_fingerprints(QUERIES, ORACLE)
    # A query the driver CANNOT prove this round must not be stamped as
    # proven-at-this-code: the rotation (queries/__init__) has already
    # ordered needy queries (unproven or stale) first, and the driver
    # checks only the first DRIVER_WINDOW registry entries — anything
    # needy beyond that keeps its previous recorded value (or stays
    # blank) so it re-enters the front next round.
    from certified_dogs_and_cats_spark.queries import _DRIVER_PROVEN, _STALE

    prior = {}
    try:
        with open(OUT) as fh:
            prior = json.load(fh)
    except (OSError, ValueError):
        pass
    names = list(QUERIES)
    for pos, name in enumerate(names):
        needy = name not in _DRIVER_PROVEN or name in _STALE
        if needy and pos >= DRIVER_WINDOW:
            fps[name] = prior.get(name, "")
    for name in stale:
        fps[name] = ""
    with open(OUT, "w") as fh:
        json.dump(dict(sorted(fps.items())), fh, indent=1)
        fh.write("\n")
    overflow = sum(
        1
        for pos, n in enumerate(names)
        if pos >= DRIVER_WINDOW and (n not in _DRIVER_PROVEN or n in _STALE)
    )
    print(
        f"recorded {len(fps)} fingerprints ({len(stale)} forced stale, "
        f"{overflow} window-overflow entries kept unstamped)"
    )


if __name__ == "__main__":
    main()
