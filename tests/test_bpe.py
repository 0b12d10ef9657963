"""BPE trainer/encoder vs an independent naive reference implementation.

The reference here re-implements Sennrich-style BPE the textbook way
(regex pair replacement over a plain dict corpus) with NO shared code
with the engine — the same engine-vs-independent-oracle pattern the BM25
suite uses (oracle.py), since BPE's merge loop has no SQL twin.
"""

from __future__ import annotations

import re

import pytest

from search_replica_spark.functions.bpe import (
    EOW,
    bpe_apply,
    bpe_train,
    encode_word,
)


# --- independent naive reference (Sennrich et al. 2016 pseudocode) ---

def _ref_get_stats(vocab):
    pairs = {}
    for word, freq in vocab.items():
        symbols = word.split()
        for i in range(len(symbols) - 1):
            pairs[(symbols[i], symbols[i + 1])] = (
                pairs.get((symbols[i], symbols[i + 1]), 0) + freq
            )
    return pairs


def _ref_merge_vocab(pair, v_in):
    v_out = {}
    bigram = re.escape(" ".join(pair))
    p = re.compile(r"(?<!\S)" + bigram + r"(?!\S)")
    for word in v_in:
        v_out[p.sub("".join(pair), word)] = v_in[word]
    return v_out


def _ref_train(word_counts, n_merges):
    vocab = {" ".join(list(w) + [EOW]): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs = _ref_get_stats(vocab)
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        vocab = _ref_merge_vocab(best, vocab)
    return merges


def _ref_encode(word, merges):
    syms = " ".join(list(word) + [EOW])
    for pair in merges:  # replay training merges in rank order
        bigram = re.escape(" ".join(pair))
        p = re.compile(r"(?<!\S)" + bigram + r"(?!\S)")
        syms = p.sub("".join(pair), syms)
    return syms.split()


CORPUS_TEXTS = [
    "low lower lowest low low",
    "new newer newest new new new",
    "wide wider widest lowest newest",
    "low new wide lower newer",
]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS_TEXTS)], "doc_id long, content string"
    )


def _ref_word_counts():
    wc: dict[str, int] = {}
    for t in CORPUS_TEXTS:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    return wc


def test_train_matches_independent_reference(corpus_df):
    merges = bpe_train(corpus_df, n_merges=20)
    ref = _ref_train(_ref_word_counts(), 20)
    assert merges == ref
    assert len(merges) > 5  # the corpus genuinely supports merges


def test_encode_matches_reference_on_every_word(corpus_df):
    merges = bpe_train(corpus_df, n_merges=15)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in sorted(_ref_word_counts()):
        assert encode_word(w, ranks) == _ref_encode(w, merges), w
    # unseen word segments too (falls back toward characters)
    assert "".join(encode_word("slowest", ranks)) == "slowest" + EOW


def test_distributed_apply_equals_driver_encoding(corpus_df):
    merges = bpe_train(corpus_df, n_merges=15)
    ranks = {p: i for i, p in enumerate(merges)}
    rows = {r["doc_id"]: r for r in bpe_apply(corpus_df, merges).collect()}
    for i, text in enumerate(CORPUS_TEXTS):
        want = []
        for w in text.split():
            want.extend(encode_word(w, ranks))
        assert rows[i]["tokens"] == want
        assert rows[i]["n_bpe_tokens"] == len(want)
        assert rows[i]["n_words"] == len(text.split())
        # lossless segmentation: concatenation recovers the words
        assert "".join(want).replace(EOW, " ").split() == text.split()


def test_train_is_deterministic_and_early_stops(corpus_df):
    m1 = bpe_train(corpus_df, n_merges=500)
    m2 = bpe_train(corpus_df, n_merges=500)
    assert m1 == m2
    # early stop: nothing with freq >= 2 remains, far under 500 merges
    assert len(m1) < 100
