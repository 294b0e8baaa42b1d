"""OpenEO process-graph executor — the stage the reference outsources to
``openeo-pg-parser-networkx`` (reference: README.md:9; SURVEY.md §3).

A process graph is a dict of nodes::

    {"node_id": {"process_id": "...", "arguments": {...}, "result": true?}}

Argument values may be ``{"from_node": id}`` (data-flow edge) or
``{"from_parameter": name}`` (callback parameter), or nested
``{"process_graph": {...}}`` (a callback sub-graph, e.g. a reducer).

Execution walks bottom-up from the result node, memoizing each node —
exactly the nested-partials assembly the external parser produced
(reference: tests/test_reduce.py:65-71), except each step returns a new
DataCube/Column so the Catalyst plan grows lazily.

Callback compilation: a sub-graph whose processes are all scalar Column
builders compiles into a single Column expression (fused into codegen —
SURVEY.md §7 "hard parts" #1); reducer names resolve through the
AGGREGATORS table.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

from openeo_processes_dask_spark.core import (
    REGISTRY,
    ParameterReference,
    ProcessParameterMissing,
    get_process,
    resolve_parameters,
)
from openeo_processes_dask_spark.functions.reducers import AGGREGATORS


class OpenEOProcessGraph:
    """Parsed process graph with a single result node."""

    def __init__(self, pg_data: dict):
        graph = pg_data.get("process_graph", pg_data)
        self.nodes = graph
        results = [k for k, v in graph.items() if v.get("result")]
        if len(results) != 1:
            raise ValueError(
                f"Process graph needs exactly one result node, found {results}"
            )
        self.result_node = results[0]

    def node(self, node_id: str) -> dict:
        return self.nodes[node_id]


def _compile_callback(pg: dict, named_parameters: dict) -> Callable:
    """A nested process graph used as a callback (reducer/apply fn).

    Returns a callable taking the parameter column(s). When invoked, it
    executes the sub-graph with ``from_parameter`` references bound — if all
    nodes are scalar processes the result is a single Column expression.
    """
    sub = OpenEOProcessGraph(pg)

    def callback(*args, **kwargs):
        params = dict(named_parameters)
        # OpenEO callback conventions: 'x' (unary), 'x','y' (binary),
        # 'data' (array/reducer context)
        if len(args) == 1:
            params.setdefault("x", args[0])
            params.setdefault("data", args[0])
        elif len(args) == 2:
            params.setdefault("x", args[0])
            params.setdefault("y", args[1])
        params.update(kwargs)
        return _execute(sub, params)

    return callback


def _resolve_arg(value: Any, graph: OpenEOProcessGraph, memo: dict, params: dict):
    if isinstance(value, dict):
        if "from_node" in value:
            return _exec_node(value["from_node"], graph, memo, params)
        if "from_parameter" in value:
            name = value["from_parameter"]
            if name in params:
                return params[name]
            raise ProcessParameterMissing(
                f"Error: Process Parameter {name} was not available"
            )
        if "process_graph" in value:
            return _compile_callback(value, params)
        return {
            k: _resolve_arg(v, graph, memo, params) for k, v in value.items()
        }
    if isinstance(value, list):
        return [_resolve_arg(v, graph, memo, params) for v in value]
    return value


def _exec_node(node_id: str, graph: OpenEOProcessGraph, memo: dict, params: dict):
    if node_id in memo:
        return memo[node_id]
    node = graph.node(node_id)
    pid = node["process_id"]
    kwargs = {
        k: _resolve_arg(v, graph, memo, params)
        for k, v in node.get("arguments", {}).items()
    }
    # reducer names used as bare strings resolve via the operators; a
    # sub-graph callback already compiled above.
    fn = get_process(pid) if pid in REGISTRY else AGGREGATORS.get(pid)
    if fn is None:
        raise KeyError(f"Unknown process {pid!r}")
    args, kwargs = resolve_parameters(fn, (), kwargs, params)
    out = fn(**kwargs)
    memo[node_id] = out
    return out


def _execute(graph: OpenEOProcessGraph, params: Optional[dict] = None):
    return _exec_node(graph.result_node, graph, {}, params or {})


def execute_process_graph(
    pg_data: dict, named_parameters: Optional[dict] = None
):
    """Execute an OpenEO process-graph JSON dict against the registry.
    ``named_parameters`` supplies top-level parameters (e.g. a preloaded
    DataCube under the name used by ``from_parameter``)."""
    return _execute(OpenEOProcessGraph(pg_data), named_parameters)
