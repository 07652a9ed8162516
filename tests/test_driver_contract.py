"""Driver-contract invariants: the shapes the correctness harness relies
on (every oracle belongs to a query, names stable, builders callable),
checked without running Spark."""

import inspect

import __spark_entry__ as entry_mod


def test_contract_shapes():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    # every oracle has a query; rows-only queries are the 4 full tiers
    # (floats/Gorilla blobs byte-matched in pytest instead) plus the
    # random-forest row (tree ensembles are not SQL-replayable)
    assert set(o) <= set(q)
    rows_only = sorted(set(q) - set(o))
    assert rows_only == [
        "api_rf_classify",
        "transcript_agg_1d",
        "transcript_agg_1h",
        "transcript_packed_1h",
        "transcript_tier_1m",
    ]
    assert len(o) >= 65
    for name, sql in o.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
        # sandbox-safe subset: events-derived transcript oracles must not
        # reference any filesystem path
        if name.startswith("transcript_ev_"):
            assert "read_parquet" not in sql, name
    for name, builder in q.items():
        assert callable(builder), name
        params = inspect.signature(builder).parameters
        assert len(params) == 2, (name, params)


def test_flagship_queries_inside_driver_window():
    """The correctness harness only verifies the first 50 entries of
    queries() in insertion order; the flagship transcript-engine and
    facade oracles must sit inside that window (r3 verdict item #1)."""
    first50 = list(entry_mod.queries())[:50]
    flagship = [n for n in first50 if n.startswith("transcript_ev_")]
    assert len(flagship) == 5, flagship
    api = [n for n in first50 if n.startswith("api_")]
    assert len(api) >= 7, api
    o = entry_mod.oracle_sql()
    # every slot in the window must be oracle-checkable (no rows-only
    # entries wasting a verified slot)
    assert all(n in o for n in first50), [n for n in first50 if n not in o]
    # queries() and oracle_sql() agree on ordering for the window
    assert list(o)[:50] == first50
