"""BPE trainer/encoder correctness + the two rows-only gate entries."""

import numpy as np
import pytest

from docinsight_ray.functions.bpe import (
    EOW,
    BPEEncoder,
    encode_word,
    merge_ranks,
    q_bpe_token_count,
    q_bpe_vocab,
    train_bpe,
    word_histogram,
)

SF = "/root/testdata/sf0.001"


def brute_train(words, counts, num_merges, min_pair_count=2):
    """From-scratch reference: recount every pair on every iteration."""
    syms = [list(w) + [EOW] for w in words]
    merges = []
    for _ in range(num_merges):
        pc = {}
        for s, c in zip(syms, counts):
            for p in zip(s, s[1:]):
                pc[p] = pc.get(p, 0) + int(c)
        if not pc:
            break
        maxc = max(pc.values())
        if maxc < min_pair_count:
            break
        a, b = min(p for p, c in pc.items() if c == maxc)
        merges.append((a, b, a + b, maxc))
        out = []
        for s in syms:
            new, j = [], 0
            while j < len(s):
                if j + 1 < len(s) and s[j] == a and s[j + 1] == b:
                    new.append(a + b)
                    j += 2
                else:
                    new.append(s[j])
                    j += 1
            out.append(new)
        syms = out
    return merges, {w: syms[i] for i, w in enumerate(words)}


WORDS = [
    "low", "lower", "lowest", "newer", "newest", "wider", "widest",
    "new", "renew", "news", "newton", "slow", "slower", "flow",
    "ab", "abab", "ababab", "a", "b0b", "10101",
]
COUNTS = [5, 2, 1, 6, 3, 2, 1, 7, 1, 2, 1, 3, 1, 2, 4, 3, 2, 9, 1, 2]


def test_incremental_trainer_matches_bruteforce():
    got_m, got_seg = train_bpe(WORDS, COUNTS, num_merges=40)
    want_m, want_seg = brute_train(WORDS, COUNTS, num_merges=40)
    assert got_m == want_m
    assert got_seg == want_seg
    assert len(got_m) > 10  # the fixture actually exercises the loop


def test_encode_matches_trainer_segmentation():
    merges, seg = train_bpe(WORDS, COUNTS, num_merges=40)
    ranks = merge_ranks(merges)
    for w in WORDS:
        assert encode_word(w, ranks) == seg[w], w


def test_encode_roundtrip_and_empty_ranks():
    merges, _ = train_bpe(WORDS, COUNTS, num_merges=40)
    ranks = merge_ranks(merges)
    for w in WORDS + ["unseenzzz", "q"]:
        toks = encode_word(w, ranks)
        assert "".join(toks) == w + EOW  # lossless
    # zero merges → pure character segmentation
    assert encode_word("abc", {}) == ["a", "b", "c", EOW]


def test_min_pair_count_floor():
    merges, _ = train_bpe(["xy"], [1], num_merges=10, min_pair_count=2)
    assert merges == []  # every pair count is 1 < floor


@pytest.mark.usefixtures("ray_session")
def test_bpe_vocab_gate_deterministic():
    from docinsight_ray.functions.bpe import _BPE_CACHE

    _BPE_CACHE.clear()
    t1 = q_bpe_vocab(SF)
    _BPE_CACHE.clear()  # force a full re-run, not a cache hit
    t2 = q_bpe_vocab(SF)
    assert t1.equals(t2)
    assert t1.num_rows > 50
    ranks = t1["rank"].to_pylist()
    assert ranks == sorted(ranks)
    counts = t1["pair_count"].to_pylist()
    assert all(c >= 2 for c in counts)
    # merged is always left+right (display form)
    for left, right, merged in zip(
        t1["left"].to_pylist(), t1["right"].to_pylist(), t1["merged"].to_pylist()
    ):
        assert merged == left + right


@pytest.mark.usefixtures("ray_session")
def test_bpe_token_count_gate():
    hist = word_histogram(SF)
    t = q_bpe_token_count(SF)
    import pyarrow.parquet as pq

    ndocs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert t.num_rows == ndocs
    n_words = np.asarray(t["n_words"])
    n_tok = np.asarray(t["bpe_tokens"])
    # every word is at least one token, at most len(word)+1 symbols
    assert (n_tok >= n_words).all()
    # merges actually compress: corpus-wide tokens < char+EOW baseline
    baseline = int(
        (hist["word"].str.len().to_numpy() + 1) @ hist["count"].to_numpy()
    )
    assert int(n_tok.sum()) < baseline
