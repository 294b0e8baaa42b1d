"""Process registry + parameter resolution — the spine of the engine.

Mirrors the reference's ``core.py`` (reference: openeo_processes_dask/core.py:16-103):
every public process function is collected into a registry keyed by process id,
and a ``process`` wrapper resolves ``ParameterReference`` placeholders coming
from a parsed process graph at call time. The reference outsources parsing to
``openeo-pg-parser-networkx``; we ship a small executor in ``plans/graph.py``.
"""

from __future__ import annotations

import inspect
from typing import Any, Callable, Optional

REGISTRY: dict[str, Callable] = {}

# kwargs injected by the executor that implementations may not declare —
# pruned exactly like reference core.py:71-81.
_INJECTED = {"axis", "keepdims", "source_transposed_axis", "context", "dim_labels"}


class ParameterReference:
    """Placeholder for a value supplied at execution time
    (reference: core.py:19-21 docstring)."""

    def __init__(self, from_parameter: str):
        self.from_parameter = from_parameter

    def __repr__(self) -> str:  # pragma: no cover
        return f"ParameterReference({self.from_parameter!r})"


from openeo_processes_dask_spark.exceptions import (  # noqa: F401
    ProcessParameterMissing,
)


def process(fn: Optional[Callable] = None, *, name: Optional[str] = None):
    """Register ``fn`` under ``name`` (default: fn.__name__ stripped of a
    leading underscore, so ``_and``/``_or``/``_if``/... register as
    ``and``/``or``/``if`` like the reference's naming convention)."""

    def _register(f: Callable) -> Callable:
        key = name or f.__name__.lstrip("_")
        REGISTRY[key] = f
        return f

    if fn is not None:
        return _register(fn)
    return _register


def resolve_parameters(
    fn: Callable,
    args: tuple,
    kwargs: dict,
    named_parameters: Optional[dict[str, Any]] = None,
):
    """Substitute ParameterReference args and prune injected kwargs the
    target signature doesn't accept (reference: core.py:44-90)."""
    named_parameters = named_parameters or {}

    def sub(v):
        if isinstance(v, ParameterReference):
            if v.from_parameter in named_parameters:
                return named_parameters[v.from_parameter]
            raise ProcessParameterMissing(
                f"Error: Process Parameter {v.from_parameter} was not available"
            )
        return v

    args = tuple(sub(a) for a in args)
    kwargs = {k: sub(v) for k, v in kwargs.items()}

    try:
        sig_params = set(inspect.signature(fn).parameters)
        has_var_kw = any(
            p.kind is inspect.Parameter.VAR_KEYWORD
            for p in inspect.signature(fn).parameters.values()
        )
    except (TypeError, ValueError):  # builtins
        return args, kwargs
    if not has_var_kw:
        # Prune ONLY the injected special args the callee doesn't accept
        # (reference: process.py:89-95 prunes exactly these five). Unknown
        # user kwargs pass through so a typo'd process-graph argument raises
        # TypeError instead of being silently ignored (ADVICE r01).
        kwargs = {
            k: v for k, v in kwargs.items() if k in sig_params or k not in _INJECTED
        }
    return args, kwargs


def get_process(process_id: str) -> Callable:
    if process_id not in REGISTRY:
        raise KeyError(
            f"Process {process_id!r} not in registry "
            f"({len(REGISTRY)} processes registered)"
        )
    return REGISTRY[process_id]
