"""Byte-pair-encoding tokenizer training + encoding (Sennrich et al.
2016, arXiv:1508.07909) — the tokenizer lane of a training-data pipeline.

No reference counterpart (LLM-pipeline lane). The 100 TB shape follows how
production tokenizer training actually splits: the CORPUS-side work is one
word-frequency aggregate (scan + explode + hash agg on the word — the only
step that touches every byte), after which merge learning runs on the
frequency-capped word-type table, which is vocabulary-sized (a 100 TB
corpus still has ~1e7 word types; top-V capping makes it driver-safe
metadata, the same class as k-means centroids). Encoding fans back out as
an Arrow-batched pandas UDF with the learned merge list broadcast.

Determinism: word candidates are capped by (freq DESC, word ASC); each
merge round picks (pair-count DESC, pair ASC); encoding applies merges in
learned order with left-to-right non-overlapping replacement — every
tie-break is total, so the result is bit-identical under any partitioning
and replayable by the DuckDB-side oracle builder.
"""

from __future__ import annotations

import re
from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, StringType

#: the engine's whitespace contract is the JVM's ``\s`` class (ASCII
#: only — textanalysis.tokens splits on the Java regex ``\s+``). The
#: Python encode UDFs must split IDENTICALLY, or a word the vocab saw
#: as one type ("a b") would fragment at encode time — str.split()
#: splits on Unicode whitespace and did exactly that (ADVICE r7).
_WS = re.compile("[ \\t\\n\\x0b\\f\\r]+")


def _pretokenize(text: str | None, lowercase: bool) -> list[str]:
    """Whitespace pre-tokenization with the same character class as the
    corpus-side :func:`word_frequencies` lane."""
    if text is None:
        return []
    if lowercase:
        text = text.lower()
    return [w for w in _WS.split(text) if w]

#: end-of-word marker appended as a standalone final symbol, so merges
#: can distinguish word-final from word-internal contexts
EOW = "</w>"


def word_frequencies(
    df: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """(word, freq) over the whitespace-tokenized corpus — the one
    corpus-sized job of tokenizer training: scan, explode, hash
    aggregate on the word. Empty texts contribute nothing."""
    from openeo_processes_dask_spark.training.textanalysis import tokens

    txt = F.col(text_col)
    if lowercase:
        txt = F.lower(txt)
    return (
        df.select(F.explode(tokens(txt)).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _merge_word(symbols: list, pair: tuple) -> list:
    """One merge applied to one word: left-to-right, non-overlapping."""
    a, b = pair
    out = []
    i = 0
    while i < len(symbols):
        if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def learn_bpe(
    df: DataFrame,
    num_merges: int,
    text_col: str = "text",
    max_word_types: int = 100_000,
    lowercase: bool = True,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus. Returns the
    ordered merge list (pairs of symbol strings).

    Distribution boundary: the corpus-sized work is
    :func:`word_frequencies` (one scan + one shuffle); the word-type
    table is then capped to the ``max_word_types`` most frequent types
    (freq DESC, word ASC — a TakeOrdered, not a full sort) and collected:
    vocabulary-sized metadata, the documented driver-side budget (same
    class as k-means centroids / logreg weights). Merge learning itself
    is inherently serial (each round's counts depend on the previous
    merge), and on the capped vocab it is microseconds per round —
    distributing it would shuffle per merge for no win."""
    wf = word_frequencies(df, text_col, lowercase)
    cap = [
        (r["word"], r["freq"])
        for r in wf.orderBy(F.col("freq").desc(), F.col("word"))
        .limit(max_word_types)
        .collect()
    ]
    vocab = {tuple(list(w) + [EOW]): f for w, f in cap}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: dict[tuple, int] = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        # deterministic: max count, then lexicographically smallest pair
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        nxt: dict[tuple, int] = {}
        for s, f in vocab.items():
            k = tuple(_merge_word(list(s), best))
            nxt[k] = nxt.get(k, 0) + f
        vocab = nxt
    return merges


def _encode_word(word: str, merges: Iterable[tuple[str, str]]) -> list[str]:
    syms = list(word) + [EOW]
    for pair in merges:
        if len(syms) == 1:
            break
        syms = _merge_word(syms, pair)
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    lowercase: bool = True,
) -> DataFrame:
    """Encode ``text_col`` with a learned merge list: whitespace
    pre-tokenization, then per-word merge application. Adds ``out_col``
    (array<string> of BPE symbols, words concatenated in order).

    Plan: the merge list is a closure constant (broadcast with the task),
    the UDF is Arrow-batched (pandas Series in/out), and each row is
    independent — map-only, no shuffle, linear in corpus size. A
    per-batch word cache collapses repeated words (Zipf: most tokens are
    the head of the distribution), so the per-row cost approaches a dict
    lookup."""
    mg = [tuple(m) for m in merges]

    @F.pandas_udf(ArrayType(StringType()))
    def enc(s):
        cache: dict[str, list[str]] = {}

        def one(text):
            out: list[str] = []
            for w in _pretokenize(text, lowercase):
                if w not in cache:
                    cache[w] = _encode_word(w, mg)
                out.extend(cache[w])
            return out

        return s.map(one)

    return df.withColumn(out_col, enc(F.col(text_col)))


def bpe_token_counts(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens) under the learned BPE — the token-budget
    accounting every mixture/packing decision needs."""
    return bpe_encode(df, merges, text_col).select(
        F.col(id_col).alias("id"),
        F.size("bpe_tokens").cast("int").alias("n_tokens"),
    )


def corpus_base_symbols(
    df: DataFrame, text_col: str = "text", lowercase: bool = True
) -> list[str]:
    """Sorted distinct characters of the tokenized corpus plus ``EOW`` —
    the base alphabet of the vocabulary. One scan + one distinct over a
    character-sized relation (alphabet-sized result, driver-safe)."""
    txt = F.trim(F.col(text_col))
    if lowercase:
        txt = F.lower(txt)
    chars = (
        df.select(
            F.explode(
                F.split(F.regexp_replace(txt, r"\s+", ""), "")
            ).alias("c")
        )
        .where(F.col("c") != "")
        .distinct()
    )
    return sorted(r["c"] for r in chars.collect()) + [EOW]


def bpe_vocab(
    merges: list[tuple[str, str]], base_symbols: list[str]
) -> dict[str, int]:
    """token -> id, GPT-2 style: id 0 is ``<unk>``, then the sorted base
    alphabet, then each merge's output token in LEARNED ORDER (ids are
    stable as long as the merge list is — append-only growth when
    training continues)."""
    vocab: dict[str, int] = {"<unk>": 0}
    for s in base_symbols:
        if s not in vocab:
            vocab[s] = len(vocab)
    for a, b in merges:
        tok = a + b
        if tok not in vocab:
            vocab[tok] = len(vocab)
    return vocab


def bpe_encode_ids(
    df: DataFrame,
    merges: list[tuple[str, str]],
    vocab: dict[str, int],
    text_col: str = "text",
    out_col: str = "ids",
    lowercase: bool = True,
) -> DataFrame:
    """Encode to VOCABULARY IDS (array<int>) — what packing and training
    actually consume; symbols outside the vocab map to ``<unk>`` (id 0).
    Same Arrow-batched map-only shape as :func:`bpe_encode`, with the
    merge list and vocab riding the task closure."""
    mg = [tuple(m) for m in merges]
    vb = dict(vocab)

    @F.pandas_udf(ArrayType(IntegerType()))
    def enc(s):
        cache: dict[str, list[int]] = {}

        def one(text):
            out: list[int] = []
            for w in _pretokenize(text, lowercase):
                if w not in cache:
                    cache[w] = [
                        vb.get(sym, 0) for sym in _encode_word(w, mg)
                    ]
                out.extend(cache[w])
            return out

        return s.map(one)

    return df.withColumn(out_col, enc(F.col(text_col)))
