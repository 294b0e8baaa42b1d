"""PROCESSES.md header counts are pinned to the live registry (VERDICT
r12 #6): hand-maintained numbers were stale three times (r9, r11, r12),
so the header is now mechanically checked — if a gate or process is
added without refreshing the header, this test names the fix."""

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_processes_header_counts_match_registry():
    import __spark_entry__ as e
    from openeo_processes_dask_spark.core import REGISTRY

    with open(os.path.join(REPO, "PROCESSES.md")) as f:
        head = f.read(2000)
    m = re.search(
        r"(\d+) gate queries, ALL (\d+) oracle-checked "
        r"\(zero rows-only\)\. Registry: (\d+) processes",
        head,
    )
    assert m, "PROCESSES.md header counts line missing or reformatted"
    n_gates, n_oracles, n_procs = map(int, m.groups())
    qs, os_ = e.queries(), e.oracle_sql()
    assert n_gates == len(qs), (
        f"PROCESSES.md says {n_gates} gates, registry has {len(qs)} — "
        "regenerate the header line"
    )
    assert n_oracles == len(os_), (
        f"PROCESSES.md says {n_oracles} oracles, registry has {len(os_)}"
    )
    # 'zero rows-only' claim: every query has an oracle
    assert set(qs) == set(os_), set(qs) ^ set(os_)
    assert n_procs == len(REGISTRY), (
        f"PROCESSES.md says {n_procs} processes, REGISTRY has "
        f"{len(REGISTRY)}"
    )
