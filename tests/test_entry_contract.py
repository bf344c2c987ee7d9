"""Driver-contract invariants for __spark_entry__ — the correctness gate
only checks the FIRST 50 queries() entries, so the ordering is load-bearing."""

from __future__ import annotations

import __spark_entry__ as entry


def test_every_oracle_entry_is_inside_the_driver_window():
    q = list(entry.queries())
    oracles = entry.oracle_sql()
    assert len(oracles) == 50
    window = set(q[:50])
    assert set(oracles) == window, "oracle-bearing entries must be the first 50"
    # rows-only tail is pytest-covered, never oracle-bearing
    assert all(name not in oracles for name in q[50:])


def test_queries_and_oracles_are_callable_and_nonempty():
    q = entry.queries()
    assert len(q) == len(entry._ORACLE_ORDER) + len(entry._ROWS_ONLY_ORDER)
    assert len(entry._ORACLE_ORDER) == 50
    assert all(callable(fn) for fn in q.values())
    assert all(isinstance(sql, str) and "SELECT" in sql.upper()
               for sql in entry.oracle_sql().values())
