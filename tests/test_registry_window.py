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


def test_unproven_queries_fit_driver_window():
    names = list(QUERIES)
    unproven = [n for n in names if n not in _DRIVER_PROVEN]
    assert len(unproven) <= DRIVER_WINDOW, (
        f"{len(unproven)} unproven queries > {DRIVER_WINDOW}-row driver "
        f"window; overflow: {unproven[DRIVER_WINDOW:]}"
    )
    window = set(names[:DRIVER_WINDOW])
    missing = [n for n in unproven if n not in window]
    assert not missing, f"unproven but outside window: {missing}"


def test_every_query_has_oracle_and_unique_name():
    assert set(ORACLE) <= set(QUERIES)
    # every registered query in this build carries an oracle (weaker
    # rows-only checks are reserved for future non-SQL-expressible ops)
    assert set(QUERIES) == set(ORACLE)
