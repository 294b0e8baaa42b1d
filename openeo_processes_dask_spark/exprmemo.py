"""Application-id-keyed memo for driver-built pyspark Columns.

Building non-trivial Column trees is pure driver work — each functional
constructor (``F.lit``, higher-order lambdas, ``F.expr`` parses) costs a
py4j socket round-trip, and the heavy builders here (64-hash MinHash
aggregates, k x dim k-means assignment, banded explodes) pay hundreds of
them on EVERY query construction (guide §5; measured r13/r14: 0.2-1.2 s
per gate build). Columns are immutable unresolved expression trees, so
one object can safely back any number of queries; this module holds the
single memo all builders share (ADVICE r13 #4 — one eviction and
invalidation policy instead of one copy-pasted per builder).

Contract:
- the key leads with the live ``applicationId`` (or ``None`` when no
  SparkContext is up), so a session restart — whose JVM the old Columns
  belong to — invalidates everything;
- callers namespace their keys with a leading literal string;
- the cache stores only unresolved Column trees (plan metadata): no
  DataFrames, no data, nothing execution-related — memoized queries
  still scan their sources on every action;
- a size cap bounds pathological parameter sweeps (clear-all keeps the
  policy trivial; a miss only costs the original build).
"""

from __future__ import annotations

from typing import Callable, TypeVar

T = TypeVar("T")

_MEMO: dict = {}
_CAP = 256


def _app_id():
    try:
        from pyspark import SparkContext

        sc = SparkContext._active_spark_context
        return sc.applicationId if sc is not None else None
    except Exception:
        return None


def memoized_exprs(key_parts: tuple, build: Callable[[], T]) -> T:
    """Return ``build()`` memoized per (applicationId, *key_parts).

    ``key_parts`` must lead with a namespace literal and otherwise
    contain exactly the parameters ``build`` closes over — two calls
    with equal keys must build interchangeable Columns.
    """
    key = (_app_id(), *key_parts)
    hit = _MEMO.get(key)
    if hit is None:
        if len(_MEMO) > _CAP:
            _MEMO.clear()
        hit = _MEMO[key] = build()
    return hit
