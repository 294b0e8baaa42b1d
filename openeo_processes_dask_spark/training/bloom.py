"""Broadcast Bloom-filter prefilter for anti-join dedup.

The incremental-dedup anti join (``dedup.dedup_against``) shuffles every
NEW row's fingerprint against the seen corpus. At 100 TB/day ingest most
new rows are genuinely new — a Bloom filter over the seen keys, inlined
as a literal bitmap in a codegen'd Column expression, lets the scan
prove "definitely not seen" for the bulk of rows WITHOUT any shuffle;
only the Bloom-positive sliver (true matches + false positives) goes
through the exact anti join. False negatives are impossible, so the
result set is identical to the plain anti join (gate-checked).

Hashing is the engine's md5-derived idiom — deterministic and
engine-portable. Spark's built-in ``DataFrameStatFunctions.bloomFilter``
builds a JVM-side filter but testing it needs a UDF; this bitmap stays
inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: multi-column key separator: ASCII unit separator, vanishingly rare in
#: real text (consistent on both the build and probe side)
_SEP = ""


def _key_sql(key_cols: list[str]) -> str:
    # Per-column 'v'+value / bare-'n' encoding: concat_ws silently SKIPS
    # NULL arguments, which made a NULL column hash like a missing one
    # (and a single NULL key like '') — never a correctness bug (the
    # exact anti join re-verifies every Bloom positive) but it inflated
    # the false-positive sliver the prefilter exists to shrink
    # (ADVICE r7). The sentinel keeps NULL distinct from '' and from the
    # literal 'n'; residual collisions still only cost false positives.
    cols = ", ".join(
        f"coalesce(concat('v', CAST(`{c}` AS STRING)), 'n')"
        for c in key_cols
    )
    return f"concat_ws('{_SEP}', {cols})"


def _pos_sql(key_sql: str, r: int, m_bits: int) -> str:
    return (
        f"(CAST(conv(substring(md5(concat('{r}-', {key_sql})), 1, 15),"
        f" 16, 10) AS BIGINT) % {m_bits})"
    )


def bloom_build(
    df: DataFrame, key_cols: list[str], m_bits: int = 1 << 13, k: int = 3
) -> list[int]:
    """Build the bitmap (list of ``m_bits/64`` signed int64 words) over
    the distinct keys of ``df``. Distributed: the k bit positions
    explode and aggregate to AT MOST ``m_bits`` distinct ints — the only
    driver traffic — so the build is one scan + one tiny aggregate no
    matter how large the seen corpus is."""
    if m_bits % 64:
        raise ValueError(f"m_bits must be a multiple of 64, got {m_bits}")
    key = _key_sql(key_cols)
    pos = df.selectExpr(
        f"explode(array({', '.join(_pos_sql(key, r, m_bits) for r in range(k))})) AS p"
    ).distinct()
    words = [0] * (m_bits // 64)
    for row in pos.collect():
        p = int(row["p"])
        words[p // 64] |= 1 << (p % 64)
    # two's complement: keep each word in signed int64 range for the
    # BIGINT literal
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_might_contain(
    key_cols: list[str], bitmap: list[int], m_bits: int = 1 << 13,
    k: int = 3,
) -> Column:
    """Codegen'd membership probe: AND over the k bit tests, the bitmap
    inlined as a BIGINT array literal. True = maybe seen (verify
    exactly); false = DEFINITELY not seen."""
    arr = (
        "array(" + ", ".join(f"CAST({w} AS BIGINT)" for w in bitmap) + ")"
    )
    key = _key_sql(key_cols)
    probes = []
    for r in range(k):
        p = _pos_sql(key, r, m_bits)
        probes.append(
            f"((shiftright(element_at({arr}, CAST({p} div 64 AS INT) + 1),"
            f" CAST({p} % 64 AS INT)) & 1) = 1)"
        )
    return F.expr(" AND ".join(probes))


def dedup_against_bloom(
    new: DataFrame,
    seen: DataFrame,
    key_cols: list[str],
    m_bits: int = 1 << 13,
    k: int = 3,
) -> DataFrame:
    """Exact incremental dedup with a Bloom prefilter: rows the filter
    rejects are provably unseen and BYPASS the anti join; only
    Bloom-positive rows shuffle. Result row set == the plain
    ``seen``-anti-join (false positives get exact verification; false
    negatives cannot happen)."""
    bitmap = bloom_build(seen, key_cols, m_bits, k)
    maybe = bloom_might_contain(key_cols, bitmap, m_bits, k)
    definite_new = new.where(~maybe)
    candidates = new.where(maybe)
    seen_keys = seen.select(*key_cols).distinct()
    survivors = candidates.join(seen_keys, key_cols, "left_anti")
    return definite_new.unionByName(survivors)
