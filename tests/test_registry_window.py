"""Driver-evidence budget guard: every query without a prior driver
CORRECTNESS row must sit inside the driver's 50-row check window, or it
can never earn one. Fails when additions overflow the budget — the fix
is to retire a query or wait for the next round's proven-set update."""

from __future__ import annotations

from certified_dogs_and_cats_spark.queries import (
    _DRIVER_PROVEN,
    ORACLE,
    QUERIES,
)

DRIVER_WINDOW = 50


def test_unproven_queries_fill_driver_window():
    """The window must never WASTE a slot: while any query lacks driver
    evidence, every one of the 50 checked positions holds an unproven
    query. More than 50 unproven (new queries added faster than one
    round's budget) is allowed — the overflow is the LAST-registered
    ones, which queue for the next round — but a proven query sitting
    inside the window while an unproven one waits outside is a bug."""
    names = list(QUERIES)
    unproven = [n for n in names if n not in _DRIVER_PROVEN]
    window = names[: min(DRIVER_WINDOW, len(unproven))]
    wasted = [n for n in window if n in _DRIVER_PROVEN]
    assert not wasted, f"proven queries occupying window slots: {wasted}"
    overflow = unproven[DRIVER_WINDOW:]
    assert overflow == [n for n in names[DRIVER_WINDOW:] if n not in _DRIVER_PROVEN], (
        "overflowed unproven queries must be the last-registered ones"
    )


# The documented rows-only set: queries whose VALUES cannot be oracle-hash
# compared for a stated cross-engine reason, each carrying its own
# verification elsewhere. Additions here must justify themselves in the
# query docstring.
ROWS_ONLY = {
    # ln() differs last-ulp across libms; value-verified by a tolerance
    # pytest vs a pure-Python replay (tests/test_retrieval.py).
    "bm25_textbook_topk",
}


def test_every_query_has_oracle_and_unique_name():
    assert set(ORACLE) <= set(QUERIES)
    # every registered query carries an oracle EXCEPT the explicit
    # rows-only allowlist (weaker driver check, pytest-verified values)
    assert set(QUERIES) - set(ORACLE) == ROWS_ONLY
