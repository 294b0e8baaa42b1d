"""Winnowing document fingerprints (Schleimer et al. 2003 / MOSS):
selection rule (rightmost min per window), truncated-window coverage for
short docs, the guarantee that shared runs of k+w-1 tokens share a
fingerprint, and the overlap-pair join with its document-frequency cap.
Verified against an independent pure-Python replay of the paper's rule.
"""

from __future__ import annotations

import hashlib

import pytest

from openeo_processes_dask_spark.training.dedup import (
    winnow_fingerprints,
    winnow_overlap_pairs,
)


def _py_winnow(text: str, k: int, w: int) -> set:
    """Independent replay: md5-60-bit gram hashes, window of w, min with
    rightmost tie-break; short-but-hashable docs = one truncated window."""
    tk = text.lower().split()
    hs = [
        int(hashlib.md5(" ".join(tk[i : i + k]).encode()).hexdigest()[:15], 16)
        for i in range(len(tk) - k + 1)
    ]
    if not hs:
        return set()
    sel = set()
    for j in range(max(len(hs) - w + 1, 1)):
        win = hs[j : j + w]
        m = min(win)
        pos = max(i for i, v in enumerate(win) if v == m) + j
        sel.add((pos + 1, m))
    return sel


ROWS = [
    (1, "a b c d e f g h i j"),
    (2, "x y a b c d e f q r s t"),  # shares the 6-token run "a b c d e f"
    (3, "one two three"),            # exactly k tokens at k=3
    (4, "one two"),                  # < k tokens -> no fingerprints
    (5, ""),                         # empty -> nothing
    (6, "z z z z z z z z"),          # degenerate repeats -> 1 fingerprint
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(ROWS, ["doc_id", "text"])


def test_winnow_matches_python_replay(docs):
    fp = winnow_fingerprints(docs, k=3, w=4)
    got = {}
    for r in fp.collect():
        got.setdefault(r["id"], set()).add((r["pos"], r["fingerprint"]))
    for doc_id, text in ROWS:
        assert got.get(doc_id, set()) == _py_winnow(text, 3, 4), doc_id


def test_winnow_coverage_guarantee(docs):
    # docs 1 and 2 share a run of 6 = k + w - 1 tokens (k=3, w=4): the
    # paper's theorem says they MUST share at least one fingerprint
    fp = winnow_fingerprints(docs, k=3, w=4)
    s1 = {r["fingerprint"] for r in fp.where("id = 1").collect()}
    s2 = {r["fingerprint"] for r in fp.where("id = 2").collect()}
    assert s1 & s2
    # density: at most all grams, at least one per w-window
    n1 = len({(r["pos"]) for r in fp.where("id = 1").collect()})
    assert 1 <= n1 <= 8  # 8 grams at k=3 over 10 tokens


def test_winnow_short_and_degenerate(docs):
    fp = winnow_fingerprints(docs, k=3, w=4)
    # exactly-k-token doc: one gram, one truncated window
    assert fp.where("id = 3").count() == 1
    # below k tokens / empty: nothing
    assert fp.where("id in (4, 5)").count() == 0
    # all-identical grams: rightmost-min ties collapse per window but
    # distinct (pos, fp) selections differ per window start; the repeated
    # hash value is ONE distinct fingerprint value
    rows6 = fp.where("id = 6").collect()
    assert len({r["fingerprint"] for r in rows6}) == 1


def test_winnow_overlap_pairs_and_cap(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, shared + " one"),
        (2, shared + " two"),
        (3, shared + " three"),
        (4, "totally different text with no overlap at all whatsoever"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {
        (r["id1"], r["id2"]): r["n_shared"]
        for r in winnow_overlap_pairs(df, k=3, w=4, min_shared=1).collect()
    }
    assert {(1, 2), (1, 3), (2, 3)} <= set(pairs)
    assert all(p[0] < p[1] for p in pairs)
    assert not any(4 in p for p in pairs)
    # max_df=2 drops fingerprints held by all three near-dups -> the
    # triple's shared-run fingerprints vanish, only pairwise-unique
    # overlaps (from the differing suffixes) could remain
    capped = {
        (r["id1"], r["id2"])
        for r in winnow_overlap_pairs(
            df, k=3, w=4, min_shared=1, max_df=2
        ).collect()
    }
    assert capped < set(pairs) or capped == set()

    with pytest.raises(ValueError):
        winnow_overlap_pairs(df, min_shared=0)
    with pytest.raises(ValueError):
        winnow_overlap_pairs(df, max_df=1)
    with pytest.raises(ValueError):
        winnow_fingerprints(df, k=0)


def test_winnow_incremental_new_x_seen_only(spark):
    from openeo_processes_dask_spark.training.dedup import (
        winnow_incremental,
    )

    archive = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "one two three four five six seven eight"),
        ],
        ["doc_id", "text"],
    )
    # new batch: 10 is a near-copy of archive 1; 11 near-copies NEW 12
    # (new x new must NOT pair); 13 is fresh
    new = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta eta theta tail"),
            (11, "shared run of tokens here repeated exactly once more"),
            (12, "shared run of tokens here repeated exactly once more"),
            (13, "wholly novel content with nothing in common at all"),
        ],
        ["doc_id", "text"],
    )
    seen = winnow_fingerprints(archive, k=3, w=4).select(
        "id", "fingerprint"
    )
    pairs = {
        (r["new_id"], r["seen_id"])
        for r in winnow_incremental(new, seen, k=3, w=4).collect()
    }
    assert (10, 1) in pairs
    assert all(s in (1, 2) for _, s in pairs)  # strictly new x seen
    assert not any(n in (11, 12) and s in (11, 12) for n, s in pairs)

    # seen_distinct contract: a pre-deduplicated archive table skips
    # the per-ingest distinct exchange with identical results
    full = sorted(
        tuple(r)
        for r in winnow_incremental(new, seen, k=3, w=4).collect()
    )
    fast = sorted(
        tuple(r)
        for r in winnow_incremental(
            new, seen.distinct(), k=3, w=4, seen_distinct=True
        ).collect()
    )
    assert full == fast


def test_winnow_randomized_coverage_and_replay(spark):
    """Seeded randomized sweep: 40 random docs, 15 planted pairs each
    sharing a run of EXACTLY k+w-1 tokens. The paper's theorem says
    every planted pair must share >= 1 fingerprint (coverage), and the
    whole corpus must match the independent Python replay bit-for-bit
    (selection rule). One Spark job for all docs."""
    import random

    rng = random.Random(1337)
    k, w = 4, 5
    run_len = k + w - 1  # 8 tokens

    def rand_tokens(n):
        return [f"t{rng.randrange(400)}" for _ in range(n)]

    rows, planted = [], []
    did = 0
    for _ in range(15):
        shared = rand_tokens(run_len)
        a = rand_tokens(rng.randrange(0, 12)) + shared + rand_tokens(
            rng.randrange(0, 12)
        )
        b = rand_tokens(rng.randrange(0, 12)) + shared + rand_tokens(
            rng.randrange(0, 12)
        )
        rows.append((did, " ".join(a)))
        rows.append((did + 1, " ".join(b)))
        planted.append((did, did + 1))
        did += 2
    for _ in range(10):  # unpaired noise docs
        rows.append((did, " ".join(rand_tokens(rng.randrange(0, 25)))))
        did += 1

    df = spark.createDataFrame(rows, ["doc_id", "text"])
    fp = winnow_fingerprints(df, k=k, w=w)
    got: dict = {}
    for r in fp.collect():
        got.setdefault(r["id"], set()).add((r["pos"], r["fingerprint"]))
    # selection rule == independent replay, every doc
    for doc_id, text in rows:
        assert got.get(doc_id, set()) == _py_winnow(text, k, w), doc_id
    # coverage guarantee on every planted pair
    sets = {
        i: {f for _, f in got.get(i, set())} for i, _ in rows
    }
    for a, b in planted:
        assert sets[a] & sets[b], (a, b)


def test_stream_winnow_screen_equals_batch(spark, tmp_path):
    from openeo_processes_dask_spark.training.dedup import (
        stream_winnow_screen,
        winnow_incremental,
    )

    archive = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "one two three four five six seven eight"),
        ],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta eta theta tail"),
            (11, "one two three four five six seven eight and more"),
            (12, "wholly novel content with nothing in common at all"),
        ],
        ["doc_id", "text"],
    )
    seen = winnow_fingerprints(archive, k=3, w=4).select(
        "id", "fingerprint"
    )
    batch = sorted(
        tuple(r)
        for r in winnow_incremental(new, seen, k=3, w=4).collect()
    )
    d = str(tmp_path / "winnow_stream")
    new.where("doc_id % 2 = 0").coalesce(1).write.mode(
        "overwrite"
    ).parquet(d)
    new.where("doc_id % 2 = 1").coalesce(1).write.mode(
        "append"
    ).parquet(d)
    stream = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .schema("doc_id bigint, text string")
        .parquet(d)
    )
    out = stream_winnow_screen(stream, seen, k=3, w=4)
    q = (
        out.writeStream.format("memory")
        .queryName("t_winnow_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    from pyspark.sql import functions as F

    drained = sorted(
        tuple(r)
        for r in spark.table("t_winnow_stream")
        .distinct()
        .groupBy("new_id", "seen_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .collect()
    )
    assert drained == batch and batch  # non-trivial and bit-equal


def test_contamination_attribution_pairs(spark):
    from openeo_processes_dask_spark.training.dedup import (
        contamination_attribution,
        decontaminate,
    )

    bench = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog"),
            (101, "pack my box with five dozen liquor jugs today"),
        ],
        ["doc_id", "text"],
    )
    train = spark.createDataFrame(
        [
            (1, "intro the quick brown fox jumps over the lazy dog out"),
            (2, "pack my box with five unrelated trailing words here"),
            (3, "clean text sharing nothing with any benchmark at all"),
        ],
        ["doc_id", "text"],
    )
    att = {
        (r["id"], r["bench_id"]): r["n_shared"]
        for r in contamination_attribution(train, bench, n=5).collect()
    }
    assert set(att) == {(1, 100), (2, 101)}
    # attribution refines decontaminate: per-doc sums agree whenever
    # the bench docs are shingle-disjoint (as here — a shingle in TWO
    # bench docs counts once per pair but once total in decontaminate)
    dec = {
        r["id"]: r["n_shared"]
        for r in decontaminate(train, bench, n=5).collect()
    }
    sums: dict = {}
    for (i, _b), n in att.items():
        sums[i] = sums.get(i, 0) + n
    assert sums == dec


def test_levenshtein_verify(spark):
    from openeo_processes_dask_spark.training.dedup import (
        levenshtein_verify,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox"),
            (2, "the quick brown fix"),   # 1 edit of doc 1
            (3, "completely different"),
            (4, ""),
            (5, ""),
        ],
        ["doc_id", "text"],
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (4, 5)], ["id1", "id2"]
    )
    out = {
        (r["id1"], r["id2"]): (r["lev"], r["sim"])
        for r in levenshtein_verify(
            pairs, docs, threshold=0.5
        ).collect()
    }
    assert out[(1, 2)][0] == 1
    assert abs(out[(1, 2)][1] - (1 - 1 / 19)) < 1e-6
    assert (1, 3) not in out          # below threshold -> dropped
    assert out[(4, 5)] == (0, 1.0)    # empty-vs-empty defines sim 1
    # truncation cap: identical prefixes -> sim 1 under max_chars
    trunc = {
        (r["id1"], r["id2"]): r["sim"]
        for r in levenshtein_verify(
            pairs, docs, threshold=0.0, max_chars=9
        ).collect()
    }
    assert trunc[(1, 2)] == 1.0

    import pytest as _pt
    with _pt.raises(ValueError):
        levenshtein_verify(pairs, docs, threshold=1.5)
    with _pt.raises(ValueError):
        levenshtein_verify(pairs, docs, max_chars=0)
