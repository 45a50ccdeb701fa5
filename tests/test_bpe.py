"""BPE tokenizer training/encoding (`operators/bpe.py`): golden merges
on the classic example, parity between the Spark trainer and a
pure-Python reference, and the encode round trip."""

from __future__ import annotations

import pytest

from swisscourtrulingcorpus_spark.operators.bpe import (
    END,
    bpe_encode_py,
    bpe_encode_udf,
    bpe_train,
)

# Slow tier (pytest.ini): multi-minute suite, deselected from the
# default run so the round driver's pytest window completes.
pytestmark = pytest.mark.slow


def _py_train(word_freqs: dict[str, int], num_merges: int):
    """Reference implementation (Sennrich-style, greedy, same
    tie-break: count desc, pair asc)."""
    syms = {w: list(w) + [END] for w in word_freqs}
    merges = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, f in word_freqs.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
        if not counts:
            break
        pair = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[pair] < 2:
            break
        merges.append(pair)
        a, b = pair
        for w in syms:
            s, out, i = syms[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges


CORPUS = ["low low low low low", "lower lower", "newest newest newest",
          "newest newest newest", "widest widest"]


def test_spark_trainer_matches_reference(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text: string")
    got = bpe_train(df, "text", num_merges=12)

    freqs: dict[str, int] = {}
    for t in CORPUS:
        for w in t.split():
            freqs[w] = freqs.get(w, 0) + 1
    want = _py_train(freqs, 12)
    assert got == want
    # the classic example's signature merges appear
    assert ("e", "s") in got and ("es", "t") in got and ("est", END) in got


def test_encode_applies_ranks_greedily(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text: string")
    merges = bpe_train(df, "text", num_merges=12)
    toks = bpe_encode_py("newest lowest", merges)
    # 'newest' was trained on: collapses to few symbols ending in est</w>
    assert "est</w>" in toks or f"newest{END}" in toks
    joined = "".join(toks)
    assert joined == "newest" + END + "lowest" + END

    # udf path == python path
    out = df.select(bpe_encode_udf(merges)("text").alias("t")).collect()
    for row, text in zip(out, CORPUS):
        assert row["t"] == bpe_encode_py(text, merges)


def test_encode_handles_null_and_unseen(spark):
    merges = [("l", "o"), ("lo", "w")]
    assert bpe_encode_py(None, merges) is None
    # unseen chars stay single symbols + END marker
    assert bpe_encode_py("xyz", merges) == ["x", "y", "z", END]
    assert bpe_encode_py("low", merges) == ["low", END]


def test_unigram_segmentation_matches_python_dp(spark):
    """The distributed Viterbi must equal a direct python DP over the
    same vocab/scores (packed-key semantics included), and frequent
    multi-char pieces must actually win over char-by-char splits."""
    from swisscourtrulingcorpus_spark.operators.unigram import (
        PACK,
        unigram_segment_words,
        unigram_vocab,
    )

    rows = [(i, "abab " * 5 + "xyz qq") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pcost = {
        r.piece: -r.score_micro
        for r in unigram_vocab(docs, "text").collect()
    }
    got = {
        r.word: (r.n_pieces, r.cost_micro)
        for r in unigram_segment_words(docs, "text").collect()
    }
    assert set(got) == {"abab", "xyz", "qq"}

    def dp(word):
        best = [None] * (len(word) + 1)
        best[0] = 0
        for j in range(1, len(word) + 1):
            cands = []
            for i in range(max(0, j - 6), j):
                piece = word[i + 1 - 1 : j]
                if best[i] is not None and piece in pcost:
                    cands.append(best[i] + pcost[piece] * PACK + 1)
            best[j] = min(cands) if cands else None
        key = best[len(word)]
        return (key % PACK, key // PACK)

    for w, res in got.items():
        assert res == dp(w), w
    # 'abab' is the most frequent substring -> segments as one piece
    assert got["abab"][0] == 1


def test_unigram_empty_corpus_graceful(spark):
    """Zero qualifying words (all NULL text / over-length) must yield
    empty vocab and segmentation tables, not a float(None) crash — the
    oracle's graceful-empty mirror (r06 review)."""
    from swisscourtrulingcorpus_spark.operators.unigram import (
        unigram_segment_words,
        unigram_vocab,
    )

    docs = spark.createDataFrame(
        [(1, None), (2, "x" * 40)], "doc_id long, text string"
    )
    assert unigram_vocab(docs, "text").count() == 0
    assert unigram_segment_words(docs, "text").count() == 0
