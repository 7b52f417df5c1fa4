"""Unigram-LM tokenizer (functions/unigram.py): Viterbi optimality,
round-trip losslessness, determinism, compression."""

import itertools
import math

import numpy as np
import pytest

from docinsight_ray.functions.unigram import (
    TARGET_VOCAB,
    UNK_LOGP,
    train_unigram,
    viterbi,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


@pytest.fixture(scope="module")
def vocab():
    from docinsight_ray.functions.bpe import word_histogram

    return train_unigram(word_histogram(SF))


def _brute_best(word: str, logp: dict) -> float:
    """Exhaustive segmentation search (2^(n-1) splits) — ground truth
    for the Viterbi DP on short words."""
    n = len(word)
    best = -np.inf
    for cuts in itertools.product([0, 1], repeat=n - 1):
        pos = [0] + [i + 1 for i, c in enumerate(cuts) if c] + [n]
        score = 0.0
        ok = True
        for a, b in zip(pos, pos[1:]):
            piece = word[a:b]
            lp = logp.get(piece)
            if lp is None:
                if b - a > 1:
                    ok = False
                    break
                lp = UNK_LOGP
            score += lp
        if ok and score > best:
            best = score
    return best


def test_viterbi_is_optimal(vocab):
    logp = dict(vocab)
    for word in ["scan", "window", "sorted", "tablesort", "zzzz", "a1b2c3"]:
        segs = viterbi(word, logp)
        assert "".join(segs) == word  # lossless
        got = sum(logp.get(p, UNK_LOGP) for p in segs)
        want = _brute_best(word, logp)
        assert math.isclose(got, want, rel_tol=0, abs_tol=1e-9), word


def test_vocab_is_normalized_and_covering(vocab):
    logp = dict(vocab)
    # probabilities sum to 1
    assert math.isclose(sum(math.exp(lp) for lp in logp.values()), 1.0, abs_tol=1e-9)
    # every corpus character is a piece (full coverage)
    from docinsight_ray.functions.bpe import word_histogram

    hist = word_histogram(SF)
    chars = {ch for w in hist["word"] for ch in w}
    assert chars <= set(p for p in logp if len(p) == 1)
    # multi-char pieces respect the prune target
    assert sum(len(p) > 1 for p in logp) <= TARGET_VOCAB


def test_trainer_deterministic(vocab):
    from docinsight_ray.functions.bpe import word_histogram

    again = train_unigram(word_histogram(SF))
    assert again == vocab


def test_compresses_below_char_baseline(vocab):
    """Viterbi token count over the corpus must be well below the
    character count — multi-char pieces actually get used."""
    from docinsight_ray.functions.bpe import word_histogram

    hist = word_histogram(SF)
    logp = dict(vocab)
    n_chars = int(sum(len(w) * c for w, c in zip(hist["word"], hist["count"])))
    n_tok = int(
        sum(len(viterbi(w, logp)) * c for w, c in zip(hist["word"], hist["count"]))
    )
    assert n_tok < 0.6 * n_chars


def test_token_count_gate(vocab):
    from docinsight_ray.functions.unigram import q_unigram_token_count, q_unigram_vocab

    t = q_unigram_token_count(SF).to_pandas()
    assert len(t) == 500 and (t["unigram_tokens"] > 0).all()
    assert (t["unigram_tokens"] >= t["n_words"]).all()  # ≥1 piece per word
    v = q_unigram_vocab(SF).to_pandas()
    assert (v["logprob_micro"] < 0).all()
    assert list(v["rank"]) == sorted(v["rank"])
