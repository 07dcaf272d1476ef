"""Property-based tests (SURVEY.md §5): randomized master/perturbation pairs
must always produce exact golden diff counts from the compare engine."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tidb_large_table_compare_spark.operators.compare import (
    CompareOptions,
    compare_tables,
)

ROWS = st.integers(min_value=20, max_value=200)


@st.composite
def perturbation_plan(draw):
    n = draw(ROWS)
    pks = list(range(1, n + 1))
    missing = sorted(draw(st.sets(st.sampled_from(pks), max_size=min(10, n // 3))))
    remaining = [p for p in pks if p not in missing]
    modified = sorted(
        draw(st.sets(st.sampled_from(remaining), max_size=min(10, len(remaining) // 2)))
    )
    n_extra = draw(st.integers(min_value=0, max_value=10))
    return n, missing, modified, n_extra


def _master_rows(n):
    return [
        (pk, f"v{pk}" if pk % 7 else None, pk * 1.5 if pk % 5 else None)
        for pk in range(1, n + 1)
    ]


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(plan=perturbation_plan())
def test_compare_counts_match_construction(spark, plan):
    n, missing, modified, n_extra = plan
    schema = "pk bigint, s string, d double"
    master = spark.createDataFrame(_master_rows(n), schema)
    slave_rows = [
        (pk, (s + "_x" if s else "mod") if pk in modified else s, d)
        for pk, s, d in _master_rows(n)
        if pk not in missing
    ] + [(n + 1000 + i, f"extra{i}", float(i)) for i in range(n_extra)]
    slave = spark.createDataFrame(slave_rows, schema)
    cmp = compare_tables(
        spark, master, slave, ["pk"],
        CompareOptions(chunk_size=16), "prop",
    )
    row = cmp.summary().collect()[0]
    assert row.upcount == len(missing) + len(modified)
    assert row.downcount == n_extra + len(modified)
    assert row.equivalent == (not missing and not modified and n_extra == 0)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    dup_fraction=st.integers(min_value=2, max_value=6),
    n_removed=st.integers(min_value=0, max_value=8),
    n_added=st.integers(min_value=0, max_value=8),
)
def test_multiset_counts_with_duplicate_keys(spark, dup_fraction, n_removed, n_added):
    """The keyless multiset path must report exact multiplicity deltas even
    when primary keys repeat arbitrarily."""
    base = [(pk % dup_fraction, f"p{pk % dup_fraction}") for pk in range(60)]
    slave = base[n_removed:] + [(999, f"new{i}") for i in range(n_added)]
    schema = "pk bigint, v string"
    m = spark.createDataFrame(base, schema)
    s = spark.createDataFrame(slave, schema)
    row = compare_tables(spark, m, s, None, table_name="ms").summary().collect()[0]
    assert row.upcount == n_removed
    assert row.downcount == n_added
