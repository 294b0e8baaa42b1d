"""Array-process layer vs Python/NumPy oracles (reference:
tests/test_arrays.py patterns)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from openeo_processes_dask_spark.operators import arrays as A


@pytest.fixture(scope="module")
def ev(spark):
    def evaluate(col):
        return spark.range(1).select(col.alias("r")).first()["r"]

    return evaluate


def arr(*vals):
    return F.array(*[F.lit(v) for v in vals])


def test_array_element(ev):
    data = arr(5.0, 6.0, 7.0)
    assert ev(A.array_element(data, index=1)) == 6.0
    assert ev(A.array_element(data, index=9, return_nodata=True)) is None
    labels = arr("a", "b", "c")
    assert ev(A.array_element(data, label="c", labels=labels)) == 7.0
    with pytest.raises(A.ArrayElementParameterMissing):
        A.array_element(data)
    with pytest.raises(A.ArrayElementParameterConflict):
        A.array_element(data, index=0, label="a")


def test_array_create_modify_concat_append(ev):
    assert ev(A.array_create([1, 2], repeat=2)) == [1, 2, 1, 2]
    assert ev(A.array_modify(arr(1, 2, 3, 4), [9], index=1, length=2)) == [1, 9, 4]
    assert ev(A.array_concat(arr(1, 2), arr(3))) == [1, 2, 3]
    assert ev(A.array_append(arr(1, 2), 3)) == [1, 2, 3]


def test_array_find_contains_labels(ev):
    data = arr(1.0, 2.0, 2.0, 3.0)
    assert ev(A.array_contains(data, 2.0)) is True
    assert ev(A.array_contains(data, 9.0)) is False
    assert ev(A.array_find(data, 2.0)) == 1
    assert ev(A.array_find(data, 2.0, reverse=True)) == 2
    assert ev(A.array_find(data, 9.0)) is None
    assert ev(A.array_labels(arr(7, 8, 9))) == [0, 1, 2]
    assert ev(A.array_find_label(arr("x", "y"), "y")) == 1


def test_array_apply_filter(ev):
    data = arr(1.0, 2.0, 3.0)
    assert ev(A.array_apply(data, lambda x: x * 10)) == [10.0, 20.0, 30.0]
    assert ev(A.array_filter(data, lambda x: x > 1.5)) == [2.0, 3.0]


def test_sort_order_first_last(ev, spark):
    null = F.lit(None).cast("double")
    data = F.array(F.lit(3.0), null, F.lit(1.0), F.lit(2.0))
    assert ev(A.sort_values(data)) == [1.0, 2.0, 3.0]
    assert ev(A.sort_values(data, nodata=True)) == [1.0, 2.0, 3.0, None]
    assert ev(A.sort_values(data, asc=False, nodata=False)) == [None, 3.0, 2.0, 1.0]
    # argsort oracle (reference: tests/test_apply.py:111)
    vals = [3.0, 1.0, 2.0]
    got = ev(A.order_array(arr(*vals)))
    assert got == list(np.argsort(vals, kind="mergesort"))
    assert ev(A.first_element(F.array(null, F.lit(5.0)))) == 5.0
    assert ev(A.first_element(F.array(null, F.lit(5.0)), ignore_nodata=False)) is None
    assert ev(A.last_element(F.array(F.lit(5.0), null))) == 5.0
    assert ev(A.rearrange_array(arr(10.0, 20.0, 30.0), [2, 0])) == [30.0, 10.0]


def test_count_array(ev):
    null = F.lit(None).cast("double")
    data = F.array(F.lit(1.0), null, F.lit(3.0))
    assert ev(A.count_array(data)) == 2
    assert ev(A.count_array(data, condition=True)) == 3
    assert ev(A.count_array(data, condition=lambda x: x > 1)) == 1
