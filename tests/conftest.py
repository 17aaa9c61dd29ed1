from __future__ import annotations

import math

import pytest

from timeseriesflattener_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        app_name="tsf-spark-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.autoBroadcastJoinThreshold": "10485760"},
    )
    yield spark


def approx_or_equal(a, b, rel=1e-9):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == pytest.approx(b, rel=rel)
    return a == b


def assert_rows_match(result_rows: list[dict], expected_rows: list[dict], sort_keys=None):
    """Order-insensitive comparison on the intersection-checked dicts —
    mirrors the reference's assert_frame_equal wrapper
    (``main_test.py:44-52``) which ignores row/column order and dtype."""
    if sort_keys is None:
        sort_keys = sorted(expected_rows[0].keys()) if expected_rows else []

    def key(r):
        return tuple(str(r.get(k)) for k in sort_keys)

    result_sorted = sorted(result_rows, key=key)
    expected_sorted = sorted(expected_rows, key=key)
    assert len(result_sorted) == len(expected_sorted), (
        f"Row count mismatch: {len(result_sorted)} vs {len(expected_sorted)}\n"
        f"result={result_sorted}\nexpected={expected_sorted}"
    )
    for res, exp in zip(result_sorted, expected_sorted):
        for col, expected_value in exp.items():
            assert col in res, f"missing column {col}; have {sorted(res)}"
            assert approx_or_equal(res[col], expected_value), (
                f"column {col}: got {res[col]!r}, expected {expected_value!r}\n"
                f"row={res}\nexpected_row={exp}"
            )
