"""bench_quiet_refs.json <-> bench.py contract (VERDICT r12 #1/#7):
the pinned per-gate quiet references must cover exactly the gates the
bench times, so a storm or regression on ANY timed gate is
mechanically detectable without cross-round archaeology."""

import json
import os

import bench

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _refs():
    with open(os.path.join(REPO, "bench_quiet_refs.json")) as f:
        return json.load(f)


def test_refs_file_loads_with_required_sections():
    refs = _refs()
    for key in ("headline_total_sec", "headline", "extras",
                "streaming_rows_per_s"):
        assert key in refs, key
    assert refs["headline_total_sec"] > 0


def test_headline_refs_cover_headline_gates():
    refs = _refs()
    assert set(refs["headline"]) == set(bench.HEADLINE)
    assert all(v > 0 for v in refs["headline"].values())
    # the per-gate total must be consistent with the section reference
    # (the section ref is the upper edge of the quiet band, so it sits
    # ABOVE the sum of per-gate quiet minimums)
    assert sum(refs["headline"].values()) <= refs["headline_total_sec"]


def test_extras_refs_are_a_subset_of_tracked_extras():
    """Every referenced extra must still be timed; gates NEW this round
    may lack a reference until close-out pins one (they then get only
    the calibration gates, not the per-gate trigger)."""
    refs = _refs()
    assert set(refs["extras"]) <= set(bench.EXTRAS)
    assert all(v > 0 for v in refs["extras"].values())
    # the steady-state expectation: at most the current round's new
    # gates are unpinned
    unpinned = set(bench.EXTRAS) - set(refs["extras"])
    assert len(unpinned) <= 4, unpinned


def test_streaming_refs_cover_streams():
    refs = _refs()
    assert set(refs["streaming_rows_per_s"]) == set(bench.STREAMS)
    assert all(v > 0 for v in refs["streaming_rows_per_s"].values())


def test_all_referenced_gates_exist_in_registry():
    import __spark_entry__ as e

    qs = set(e.queries())
    refs = _refs()
    for name in (
        list(refs["headline"]) + list(refs["extras"])
        + list(refs["streaming_rows_per_s"]) + list(bench.EXTRAS)
        + bench.HEADLINE + list(bench.STREAMS)
    ):
        assert name in qs, name


def test_by_cpus_entries_mirror_top_level_shape():
    """Measured per-core-count references (r14, ADVICE r13 #1): every
    by_cpus entry must be keyed by a core-count string and only carry
    sections the top level also has (so bench.py's per-section fallback
    to the scaled 32-core values stays well-defined), with gate names
    drawn from the same gate sets."""
    refs = _refs()
    allowed = {"comment", "quiet_cal_sec", "headline_total_sec",
               "headline", "extras", "streaming_rows_per_s"}
    for cpus, entry in refs.get("by_cpus", {}).items():
        assert cpus.isdigit(), cpus
        assert set(entry) <= allowed, set(entry) - allowed
        if "headline" in entry:
            assert set(entry["headline"]) == set(bench.HEADLINE)
        if "extras" in entry:
            assert set(entry["extras"]) <= set(bench.EXTRAS)
        if "streaming_rows_per_s" in entry:
            assert set(entry["streaming_rows_per_s"]) <= set(bench.STREAMS)
        if "quiet_cal_sec" in entry:
            assert entry["quiet_cal_sec"] > 0
