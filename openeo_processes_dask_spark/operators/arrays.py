"""Array (list) processes (reference: arrays.py — SURVEY.md §2.9).

Two execution contexts, mirroring the reference's ``@process`` axis
injection (reference: core.py:71-81):

1. **Array-column context** (functions here): the value is an ArrayType
   column; every process is a pure Column expression over it — codegen'd,
   zero shuffle.
2. **Cube context**: the same semantics along a cube dimension are provided
   by the long-format operators (``array_element`` ≡ label filter,
   ``sort``/``order`` in operators/windows.py, first/last as reducers) —
   noted per function.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from openeo_processes_dask_spark.core import process
from openeo_processes_dask_spark.functions.math import _c


from openeo_processes_dask_spark.exceptions import (  # noqa: F401
    ArrayElementNotAvailable,
    ArrayElementParameterConflict,
    ArrayElementParameterMissing,
)


@process
def array_element(
    data: Column,
    index: Optional[int] = None,
    label=None,
    return_nodata: bool = False,
    labels: Optional[Column] = None,
) -> Column:
    """Pick one element by index or label (reference: arrays.py:66-122).
    In cube context this compiles to a dim-label filter ("pick band B04") —
    see operators/filters.filter_bands. ``labels`` is the parallel labels
    array for label lookup."""
    if index is None and label is None:
        raise ArrayElementParameterMissing(
            "The process 'array_element' requires either the 'index' or "
            "'labels' parameter to be set."
        )
    if index is not None and label is not None:
        raise ArrayElementParameterConflict(
            "The process 'array_element' only allows that either the "
            "'index' or the 'labels' parameter is set."
        )
    if label is not None:
        if labels is None:
            raise ArrayElementParameterMissing(
                "label lookup requires the labels array"
            )
        idx = F.array_position(labels, _c(label))
        out = F.when(idx > 0, F.element_at(data, idx.cast("int")))
    else:
        # element_at is 1-based; OpenEO index is 0-based
        out = F.when(F.size(data) > index, F.element_at(data, int(index) + 1))
    if not return_nodata:
        # The reference raises ArrayElementNotAvailable eagerly
        # (arrays.py:97-107); a distributed lazy engine can't throw per-row
        # without poisoning the whole job, so missing -> NULL (nodata) in
        # both modes. Deliberate, documented divergence.
        pass
    return out


@process
def array_create(data: Optional[Sequence] = None, repeat: int = 1) -> Column:
    """Tile ``data`` ``repeat`` times (reference: arrays.py:125-130)."""
    arr = (
        F.array(*[_c(v) for v in data])
        if data is not None and not isinstance(data, Column)
        else (data if data is not None else F.array())
    )
    if repeat == 1:
        return arr
    return F.flatten(F.array_repeat(arr, repeat))


@process
def array_create_labeled(data, labels) -> Column:
    """Attach labels (reference: arrays.py:133-141) — as an array of
    (label, value) structs (long-format-in-miniature)."""
    d = data if isinstance(data, Column) else F.array(*[_c(v) for v in data])
    l = labels if isinstance(labels, Column) else F.array(*[_c(v) for v in labels])
    return F.zip_with(l, d, lambda lab, v: F.struct(lab.alias("label"), v.alias("value")))


@process
def array_modify(data: Column, values, index: int, length: int = 1) -> Column:
    """Splice ``values`` into ``data`` at ``index``, replacing ``length``
    elements (reference: arrays.py:144-186)."""
    vals = values if isinstance(values, Column) else F.array(*[_c(v) for v in values])
    head = F.slice(data, 1, int(index))
    tail_start = int(index) + int(length) + 1
    tail = F.when(
        F.size(data) >= tail_start,
        F.slice(data, tail_start, F.size(data) - tail_start + 1),
    ).otherwise(F.slice(data, 1, 0))  # empty, same element type
    return F.concat(head, vals, tail)


@process
def array_concat(array1: Column, array2: Column) -> Column:
    """(reference: arrays.py:189-225)"""
    return F.concat(array1, array2)


@process
def array_append(data: Column, value, label=None) -> Column:
    """(reference: arrays.py:228-265)"""
    return F.array_append(data, _c(value))


@process
def array_contains(data: Column, value) -> Column:
    """(reference: arrays.py:268-282)"""
    return F.array_contains(data, _c(value))


@process
def array_find(
    data: Column, value, reverse: bool = False
) -> Column:
    """0-based index of first (or last with reverse) match; NULL when not
    found (the reference's NaN-masked not-found, arrays.py:285-324)."""
    if reverse:
        n = F.size(data)
        pos = F.array_position(F.reverse(data), _c(value))
        return F.when(pos > 0, (n - pos).cast("bigint"))
    pos = F.array_position(data, _c(value))
    return F.when(pos > 0, (pos - 1).cast("bigint"))


@process
def array_find_label(labels: Column, label) -> Column:
    """(reference: arrays.py:327-334)"""
    pos = F.array_position(labels, _c(label))
    return F.when(pos > 0, (pos - 1).cast("bigint"))


@process
def array_labels(data: Column) -> Column:
    """0..n-1 labels for a plain array (reference: arrays.py:370-384)."""
    return F.when(
        F.size(data) > 0, F.sequence(F.lit(0), F.size(data) - 1)
    ).otherwise(F.array().cast("array<int>"))


@process
def array_apply(data: Column, process, context=None) -> Column:  # noqa: A002
    """Vectorized callback over the array (reference: arrays.py:387-402);
    the callback builds a Column expression from the element."""
    return F.transform(data, lambda x: process(x))


@process
def array_filter(data: Column, condition, context=None) -> Column:
    """(reference: arrays.py:337-367)"""
    return F.filter(data, lambda x: condition(x))


# --- order-sensitive array ops ------------------------------------------

def _sorted_nodata(data: Column, asc: bool, nodata: Optional[bool]) -> Column:
    """sort_array sorts NULLs first (asc) / last (desc); OpenEO wants
    explicit placement or dropping (reference: arrays.py:558-584)."""
    valid = F.filter(data, lambda x: x.isNotNull())
    s = F.sort_array(valid, asc=asc)
    if nodata is None:
        return s
    nulls = F.filter(data, lambda x: x.isNull())
    return F.concat(s, nulls) if nodata else F.concat(nulls, s)


@process(name="sort_array_values")
def sort_values(data: Column, asc: bool = True, nodata: Optional[bool] = None) -> Column:
    return _sorted_nodata(data, asc, nodata)


@process(name="order_array")
def order_array(data: Column, asc: bool = True, nodata: Optional[bool] = None) -> Column:
    """argsort as an expression: sort (value, index) structs, project index
    (stable: index tie-breaks equal values — kind='mergesort' semantics,
    reference: arrays.py:498-535)."""
    idx = array_labels(data)
    pairs = F.zip_with(
        data, idx, lambda v, i: F.struct(v.alias("v"), i.alias("i"))
    )
    valid = F.filter(pairs, lambda p: p.getField("v").isNotNull())
    s = F.sort_array(valid, asc=asc)
    out = F.transform(s, lambda p: p.getField("i"))
    if nodata is None:
        return out
    null_idx = F.transform(
        F.filter(pairs, lambda p: p.getField("v").isNull()),
        lambda p: p.getField("i"),
    )
    return F.concat(out, null_idx) if nodata else F.concat(null_idx, out)


@process(name="rearrange_array")
def rearrange_array(data: Column, order: Column) -> Column:  # noqa: A002
    """take-by-permutation (reference: arrays.py:538-555)."""
    o = order if isinstance(order, Column) else F.array(*[F.lit(int(i)) for i in order])
    return F.transform(o, lambda i: F.element_at(data, i.cast("int") + 1))


@process(name="first_element")
def first_element(data: Column, ignore_nodata: bool = True) -> Column:
    """First (non-null) element (reference: arrays.py:461-478)."""
    if not ignore_nodata:
        return F.when(F.size(data) > 0, F.element_at(data, 1))
    valid = F.filter(data, lambda x: x.isNotNull())
    return F.when(F.size(valid) > 0, F.element_at(valid, 1))


@process(name="last_element")
def last_element(data: Column, ignore_nodata: bool = True) -> Column:
    if not ignore_nodata:
        return F.when(F.size(data) > 0, F.element_at(data, -1))
    valid = F.filter(data, lambda x: x.isNotNull())
    return F.when(F.size(valid) > 0, F.element_at(valid, -1))


@process(name="count_array")
def count_array(data: Column, condition=None) -> Column:
    """count valid / all / matching (reference: arrays.py:587-606)."""
    if condition is True:
        return F.size(data).cast("bigint")
    if condition is not None:
        return F.size(F.filter(data, lambda x: condition(x))).cast("bigint")
    return F.size(F.filter(data, lambda x: x.isNotNull())).cast("bigint")
