"""Differential test: every SQL-checkable registered query must match its
DuckDB oracle at sf0.001 (the driver runs the same check at sf0.01).

This single parametrized test is the local mirror of the t2 gate.
"""

from __future__ import annotations

import pytest

from presto_cached_examples_spark import registry
from tests.conftest import SF_TINY
from tests.util import assert_frames_match

SPECS = registry.all_specs()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(spark, duck, name):
    spec = SPECS[name]
    df = spec.fn(spark, SF_TINY)
    if spec.oracle is None:
        # rows-only contract: must run and return a well-formed result
        assert df.columns, f"{name}: no columns"
        assert df.count() >= 0
        return
    assert_frames_match(df, duck.sql(spec.oracle), context=name)
