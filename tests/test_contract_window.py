"""The driver verifies only the FIRST 50 registered queries — these
tests pin the window so a refactor can't silently rotate the flagship
(or any §2 operator) out of verification again (it happened in rounds
1 AND 2; see VERDICT.md)."""

from log_parser_project_spark.contract import WINDOW, ordered_queries


def test_window_is_exactly_50_unique_names():
    assert len(WINDOW) == 50
    assert len(set(WINDOW)) == 50


def test_window_queries_all_have_oracles():
    q = ordered_queries()
    missing = [n for n in WINDOW if n not in q]
    assert not missing, f"window names not registered: {missing}"
    no_oracle = [n for n in WINDOW if q[n][1] is None]
    assert not no_oracle, f"window queries without oracle SQL: {no_oracle}"


def test_first_50_registrations_are_the_window():
    assert tuple(ordered_queries())[:50] == WINDOW


def test_flagships_inside_window():
    for name in ("q_pl_routed_events", "q_pl_repeat_records"):
        assert name in WINDOW


def test_reorder_preserves_every_registration():
    from log_parser_project_spark.queries import QUERIES

    assert set(ordered_queries()) == set(QUERIES)


def test_entry_module_exposes_window_order():
    import __spark_entry__ as e

    assert tuple(e.queries())[:50] == WINDOW
    sql = e.oracle_sql()
    assert all(n in sql for n in WINDOW)
