"""The local correctness gate: every registered query with an oracle
must hash-match its DuckDB twin at the small SF — the same comparison
the driver runs at sf0.01."""

from __future__ import annotations

import pytest

from grpc_map_reduce_spark import registry
from tests.conftest import assert_matches_oracle

ORACLE_QUERIES = sorted(
    name for name, q in registry.all_queries().items() if q.oracle is not None
)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, duck, sf_dir, name):
    assert_matches_oracle(spark, duck, sf_dir, name)


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs = e.queries()
    os_ = e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 10
