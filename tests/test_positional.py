"""Positional index + phrase serving (pipelines/positional.py)."""

import numpy as np
import pyarrow as pa
import pytest

from docinsight_ray.config import EngineConfig
from docinsight_ray.pipelines.positional import (
    PhraseScorer,
    build_positional_index,
    query_phrases,
)
from docinsight_ray.tokenizer import tokenize_text

CFG = EngineConfig(tokenizer="simple", doc_id_mode="column", dedup=False)


def _corpus_tbl(texts: list[str]) -> pa.Table:
    n = len(texts)
    return pa.table(
        {
            "repo": pa.array(["r"] * n), "path": pa.array([f"p{i}" for i in range(n)]),
            "commit": pa.array([""] * n), "lang": pa.array(["en"] * n),
            "content": pa.array(texts), "doc_id": pa.array(range(n), type=pa.int64()),
        }
    )


def _brute_phrase(texts: list[str], phrase: str) -> dict[int, int]:
    """Ground truth: token-scan occurrence counts (overlaps counted)."""
    words = tokenize_text(phrase, CFG)
    out = {}
    for i, t in enumerate(texts):
        toks = tokenize_text(t, CFG)
        n = sum(
            1
            for s in range(len(toks) - len(words) + 1)
            if toks[s:s + len(words)] == words
        )
        if n:
            out[i] = n
    return out


@pytest.fixture(scope="module")
def pos_index(ray_session, tmp_path_factory):
    import ray.data

    rng = np.random.default_rng(5)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    texts = [" ".join(rng.choice(vocab, size=30)) for _ in range(120)]
    # craft edge docs: overlapping occurrences + a filtered 1-char token
    texts += ["aa aa aa aa", "aa x bb x aa bb", "zz zz"]
    root = str(tmp_path_factory.mktemp("pos") / "posidx")
    build_positional_index(ray.data.from_arrow(_corpus_tbl(texts)), root, CFG, fingerprint="t")
    return texts, root


def test_phrase_matches_brute_force(pos_index):
    texts, root = pos_index
    sc = PhraseScorer(root, CFG)
    for phrase in ("aa bb", "aa aa", "bb cc dd", "ee", "aa bb aa"):
        want = _brute_phrase(texts, phrase)
        d, c = sc.phrase_occurrences(phrase, k=10_000)
        got = dict(zip(d.tolist(), c.tolist()))
        assert got == want, f"phrase {phrase!r}"
        # ranking: (n_occ desc, doc_id asc)
        order = np.lexsort((d, -c))
        assert (order == np.arange(d.size)).all()


def test_overlaps_and_filtered_tokens(pos_index):
    texts, root = pos_index
    sc = PhraseScorer(root, CFG)
    # "aa aa aa aa" contains 3 overlapping "aa aa" occurrences
    d, c = sc.phrase_occurrences("aa aa", k=10_000)
    occ = dict(zip(d.tolist(), c.tolist()))
    assert occ[len(texts) - 3] == 3
    # 1-char tokens are dropped by tokenization, so "aa bb" is adjacent
    # in "aa x bb ..." under indexed-token adjacency
    assert occ.get(len(texts) - 2, 0) >= 0  # presence checked via ground truth above
    want = _brute_phrase(texts, "aa bb")
    assert len(texts) - 2 in want  # the crafted doc matches post-filter


def test_unknown_term_and_empty(pos_index):
    texts, root = pos_index
    sc = PhraseScorer(root, CFG)
    d, c = sc.phrase_occurrences("aa missingterm", k=10)
    assert d.size == 0 and c.size == 0
    d, c = sc.phrase_occurrences("", k=10)
    assert d.size == 0
    # unbuilt index
    with pytest.raises(FileNotFoundError):
        PhraseScorer("/tmp/definitely_not_a_pos_index", CFG)


def test_actor_pool_path(pos_index, ray_session):
    import ray.data

    texts, root = pos_index
    ptbl = pa.table(
        {
            "phrase_id": pa.array([0, 1], type=pa.int64()),
            "text": pa.array(["aa bb", "zz zz"], type=pa.string()),
            "k": pa.array([5, 5], type=pa.int64()),
        }
    )
    out = query_phrases(ray.data.from_arrow(ptbl), root, CFG).to_pandas()
    sc = PhraseScorer(root, CFG)
    for pid, phrase in ((0, "aa bb"), (1, "zz zz")):
        d, c = sc.phrase_occurrences(phrase, k=5)
        sub = out[out.phrase_id == pid].sort_values("rank")
        np.testing.assert_array_equal(sub.doc_id.to_numpy(dtype=np.uint64), d)
        np.testing.assert_array_equal(sub.n_occ.to_numpy(), c)


def _brute_chains(texts, phrase, slop):
    """Ground truth chain counts: DP over token positions."""
    words = tokenize_text(phrase, CFG)
    out = {}
    for i, t in enumerate(texts):
        toks = tokenize_text(t, CFG)
        pos = {w: [p for p, x in enumerate(toks) if x == w] for w in set(words)}
        prev = {p: 1 for p in pos.get(words[0], [])}
        for w in words[1:]:
            nxt = {}
            for p in pos.get(w, []):
                nxt[p] = sum(v for q, v in prev.items() if 1 <= p - q <= 1 + slop)
            prev = {p: v for p, v in nxt.items() if v}
        n = sum(prev.values())
        if n:
            out[i] = n
    return out


def test_proximity_matches_brute_force(pos_index):
    texts, root = pos_index
    sc = PhraseScorer(root, CFG)
    for phrase, slop in (("aa bb", 2), ("aa aa", 1), ("bb cc dd", 3), ("aa bb aa", 2)):
        want = _brute_chains(texts, phrase, slop)
        d, c = sc.proximity_occurrences(phrase, k=10_000, slop=slop)
        got = dict(zip(d.tolist(), c.tolist()))
        assert got == want, f"phrase {phrase!r} slop={slop}"


def test_proximity_slop0_equals_phrase(pos_index):
    texts, root = pos_index
    sc = PhraseScorer(root, CFG)
    for phrase in ("aa bb", "aa aa", "bb cc dd"):
        d0, c0 = sc.phrase_occurrences(phrase, k=10_000)
        d1, c1 = sc.proximity_occurrences(phrase, k=10_000, slop=0)
        np.testing.assert_array_equal(d0, d1)
        np.testing.assert_array_equal(c0, c1)


def test_positions_probe_gate_parity(ray_session):
    """positions_probe gate: decoded (term, doc_id, pos) rows equal the
    DuckDB tokenizer-derived oracle at sf0.001 — bitwise codec
    integrity for the positional layout."""
    import duckdb
    import pandas as pd

    from docinsight_ray.pipelines.documents import ORACLE_SQL, q_positions_probe

    sf = "/root/testdata/sf0.001"
    got = q_positions_probe(sf).to_pandas()
    assert len(got) > 0
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')")
    want = con.sql(ORACLE_SQL["positions_probe"]).df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want.reset_index(drop=True), check_dtype=False)


def test_phrase_prefix_completions_context(pos_index):
    """Contextual completion ranks by completed-PHRASE count, not df,
    and every count equals the exact phrase-occurrence total."""
    texts, root = pos_index
    from docinsight_ray.pipelines.positional import PhraseScorer

    sc = PhraseScorer(root, CFG)
    # context-free: counts are collection term frequencies
    free = dict(sc.phrase_prefix_completions("a", n=50))
    assert free.get("aa", 0) > 0
    # contextual: every returned completion must actually follow the
    # fixed word, with count == exact phrase occurrences
    ctx = sc.phrase_prefix_completions("aa b", n=50)
    assert ctx, "no completions for 'aa b'"
    for term, c in ctx:
        _d, occ = sc.phrase_occurrences(f"aa {term}", 10**6)
        assert int(occ.sum()) == c, term
    # contextual counts can never exceed the context-free tf
    free_b = dict(sc.phrase_prefix_completions("b", n=50))
    for term, c in ctx:
        assert c <= free_b.get(term, 0)
