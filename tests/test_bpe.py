"""training/bpe.py — distributed BPE tokenizer training + encoding."""

from openeo_processes_dask_spark.training.bpe import (
    EOW,
    bpe_encode,
    bpe_token_counts,
    learn_bpe,
    word_frequencies,
)


def _mk(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def test_word_frequencies(spark):
    df = _mk(spark, ["low low lower", "  Low\tnewest ", ""])
    got = {r["word"]: r["freq"] for r in word_frequencies(df).collect()}
    assert got == {"low": 3, "lower": 1, "newest": 1}


def test_learn_bpe_hand_checked(spark):
    # classic Sennrich-style toy corpus: 'lo' dominates
    df = _mk(spark, ["low low low low low", "lower lower", "newest"])
    merges = learn_bpe(df, num_merges=3)
    # pair counts round 1: (l,o)=7 wins (5 low + 2 lower);
    # round 2: (lo,w)=7 wins; round 3: (low,</w>)=5
    assert merges == [("l", "o"), ("lo", "w"), ("low", EOW)]


def test_bpe_encode_applies_merges_in_order(spark):
    df = _mk(spark, ["low low low low low", "lower lower", "newest"])
    merges = learn_bpe(df, num_merges=3)
    enc = bpe_encode(_mk(spark, ["low lower"]), merges)
    row = enc.select("bpe_tokens").first()[0]
    assert row == ["low</w>", "low", "e", "r", EOW]


def test_bpe_token_counts_and_empty(spark):
    df = _mk(spark, ["low low low low low", "lower lower", "newest"])
    merges = learn_bpe(df, num_merges=3)
    out = {
        r["id"]: r["n_tokens"]
        for r in bpe_token_counts(
            _mk(spark, ["low low", "", "unseen word"]), merges
        ).collect()
    }
    # 'low low' -> 2 merged tokens; '' -> 0; unseen chars fall back to
    # char-level (+EOW per word)
    assert out[0] == 2
    assert out[1] == 0
    assert out[2] == len("unseen") + 1 + len("word") + 1

def test_learn_bpe_partitioning_invariant(spark):
    texts = [f"alpha beta gamma{i % 5} alpha" for i in range(40)]
    m1 = learn_bpe(_mk(spark, texts).repartition(13), num_merges=6)
    m2 = learn_bpe(_mk(spark, texts).coalesce(1), num_merges=6)
    assert m1 == m2


def test_learn_bpe_matches_independent_python(spark):
    # independent serial BPE (dict-of-tuples formulation written fresh)
    texts = ["the cat sat", "the cats", "that hat"]

    def serial(texts, n):
        freqs = {}
        for t in texts:
            for w in t.lower().split():
                freqs[w] = freqs.get(w, 0) + 1
        vocab = {tuple(list(w) + [EOW]): f for w, f in freqs.items()}
        out = []
        for _ in range(n):
            pc = {}
            for syms, f in vocab.items():
                for a, b in zip(syms, syms[1:]):
                    pc[(a, b)] = pc.get((a, b), 0) + f
            if not pc:
                break
            best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            out.append(best)
            nv = {}
            for syms, f in vocab.items():
                s, i = [], 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and (syms[i], syms[i + 1]) == best
                    ):
                        s.append(best[0] + best[1])
                        i += 2
                    else:
                        s.append(syms[i])
                        i += 1
                nv[tuple(s)] = nv.get(tuple(s), 0) + f
            vocab = nv
        return out

    assert learn_bpe(_mk(spark, texts), num_merges=8) == serial(texts, 8)


def test_max_word_types_cap(spark):
    # with the cap at 1, only the most frequent word type ('aa') trains
    # merges: round 1 ties (a,a)=3 vs (a,</w>)=3 and the lexicographic
    # tie-break picks (a,</w>) ('<' sorts before 'a')
    df = _mk(spark, ["aa aa aa bb"])
    merges = learn_bpe(df, num_merges=2, max_word_types=1)
    assert merges == [("a", EOW), ("a", "a" + EOW)]


def test_bpe_vocab_and_encode_ids(spark):
    from openeo_processes_dask_spark.training.bpe import (
        bpe_encode_ids,
        bpe_vocab,
        corpus_base_symbols,
    )

    df = _mk(spark, ["low low low low low", "lower lower", "newest"])
    merges = learn_bpe(df, num_merges=3)
    base = corpus_base_symbols(df)
    # base alphabet: e l n o r s t w + EOW
    assert base == ["e", "l", "n", "o", "r", "s", "t", "w", EOW]
    vocab = bpe_vocab(merges, base)
    assert vocab["<unk>"] == 0 and vocab["e"] == 1 and vocab[EOW] == 9
    # merge outputs in learned order after the alphabet
    assert vocab["lo"] == 10 and vocab["low"] == 11 and vocab["low" + EOW] == 12
    out = bpe_encode_ids(_mk(spark, ["low lower", "LOW", "", "über"]), merges, vocab)
    got = {r["doc_id"]: r["ids"] for r in out.collect()}
    # 'low lower' -> low</w>, low, e, r, </w>
    assert got[0] == [12, 11, 1, 5, 9]
    assert got[1] == [12]          # lowercased
    assert got[2] == []            # empty doc
    # unseen char ü -> <unk>, rest chars known: ü b e r </w> -> b unseen too
    assert got[3][0] == 0 and got[3][-1] == 9


def test_bpe_ids_roundtrip_token_count(spark):
    from openeo_processes_dask_spark.training.bpe import (
        bpe_encode_ids,
        bpe_vocab,
        corpus_base_symbols,
    )
    from pyspark.sql import functions as F

    df = _mk(spark, [f"alpha beta{i % 4} gamma" for i in range(20)])
    merges = learn_bpe(df, num_merges=10)
    vocab = bpe_vocab(merges, corpus_base_symbols(df))
    ids = bpe_encode_ids(df, merges, vocab)
    counts = bpe_token_counts(df, merges)
    a = {r["doc_id"]: len(r["ids"]) for r in ids.collect()}
    b = {r["id"]: r["n_tokens"] for r in counts.collect()}
    assert a == b
