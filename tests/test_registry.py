"""Pre-snapshot smoke gate: the registry must import and register the
full inventory.  Round 2 shipped a package whose registry import raised
NameError (stale names in ``text_analysis.QUERIES``) and every gated
check failed at once — this test exists so that can never ship again.

No SparkSession needed: it exercises module import + registration only,
so it runs in milliseconds and is safe to gate every commit on.
"""

from grpc_map_reduce_spark import registry


def test_registry_imports_and_is_full():
    qs = registry.all_queries()
    assert len(qs) >= 175, f"registry shrank: only {len(qs)} queries"
    # Every entry must expose a callable and a str-or-None oracle.
    for q in qs.values():
        assert callable(q.spark_fn), q.name
        assert q.oracle is None or isinstance(q.oracle, str), q.name


def test_driver_contract_surface():
    """The three functions the driver calls must exist and agree."""
    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(queries) >= 175
    # every oracle key must have a query
    assert set(oracles) <= set(queries)
    assert callable(entry_mod.entry)


def test_zero_rows_only_queries():
    """Round 10 (VERDICT r9 item 5): every registered query is
    oracle-checked — the last rows-only entry
    (docs_compression_signal) now registers its structure-gated twin.
    A future genuinely non-SQL-expressible op may amend this list
    explicitly; it must not drift in silently."""
    allowed_rows_only: set[str] = set()
    no_oracle = sorted(
        q.name for q in registry.all_queries().values() if q.oracle is None
    )
    assert no_oracle == sorted(allowed_rows_only), no_oracle
