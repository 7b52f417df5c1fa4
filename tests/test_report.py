"""S8 report writer + D3 keep-max document query."""

import json
import os

import numpy as np
import pytest

from docinsight_ray.config import EngineConfig
from docinsight_ray.fixtures import gen_corpus, gen_queries
from docinsight_ray.oracle import OracleIndex
from docinsight_ray.report import query_document_topk, split_words, write_query_report
from docinsight_ray.scorer import BM25Scorer

CFG = EngineConfig(num_buckets=8, hot_df_ratio=0.25)


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    import ray.data

    from docinsight_ray.build import build_index

    corpus = gen_corpus(200, seed=51)
    idx = str(tmp_path_factory.mktemp("rep") / "index")
    build_index(ray.data.from_arrow(corpus), idx, CFG, fingerprint="rep")
    return corpus, idx


def test_report_schema_and_hydration(built, tmp_path):
    corpus, idx = built
    sc = BM25Scorer(idx, CFG, mode="maxscore")
    queries = [(0, "public static void"), (1, "class main string")]
    import pyarrow as pa

    rows = []
    for qid, text in queries:
        d, s = sc.score_maxscore(text, 5)
        rows += [(qid, r, int(x), float(y)) for r, (x, y) in enumerate(zip(d, s))]
    results = pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "rank": pa.array([r[1] for r in rows], type=pa.uint32()),
            "doc_id": pa.array([r[2] for r in rows], type=pa.uint64()),
            "score": pa.array([r[3] for r in rows], type=pa.float64()),
        }
    )
    out = str(tmp_path / "report.json")
    payload = write_query_report(results, queries, idx, out)
    on_disk = json.load(open(out))
    assert on_disk == json.loads(json.dumps(payload))  # round-trips
    assert on_disk["n_queries"] == 2
    assert set(on_disk["corpus_stats"]) >= {"n_docs", "avgdl", "k1", "b", "tokenizer"}
    for q in on_disk["queries"]:
        assert q["query"]  # original text present
        assert q["n_hits"] == len(q["hits"])
        for h in q["hits"]:
            # hydration: every hit carries doc metadata from the registry
            assert {"rank", "doc_id", "score", "repo", "path", "lang"} <= set(h)
        ranks = [h["rank"] for h in q["hits"]]
        assert ranks == sorted(ranks)


def test_query_document_keep_max(built, ray_session):
    """D3: the per-doc score is the MAX over chunk scores, and ranking
    follows (score desc, doc_id asc) — verified against a driver-side
    oracle computation."""
    corpus, idx = built
    oracle = OracleIndex(corpus, CFG)
    text = " ".join(corpus["content"].to_pylist()[0].split()[:40])
    chunks = split_words(text, 8)
    assert len(chunks) >= 3
    best: dict[int, float] = {}
    hits: dict[int, int] = {}
    for c in chunks:
        d, s = oracle.score(c, oracle.n_docs)
        for di, si in zip(d.tolist(), s.tolist()):
            hits[di] = hits.get(di, 0) + 1
            if di not in best or si > best[di]:
                best[di] = si
    docs = np.array(sorted(best), dtype=np.uint64)
    scores = np.array([best[int(d)] for d in docs])
    order = np.lexsort((docs, -np.round(scores, 6)))[:10]

    got = query_document_topk(text, idx, CFG, k=10, chunk_words=8).to_pandas()
    np.testing.assert_array_equal(got["doc_id"].to_numpy().astype(np.uint64), docs[order])
    np.testing.assert_array_equal(got["score"].to_numpy(), np.round(scores[order], 6))
    np.testing.assert_array_equal(
        got["n_chunk_hits"].to_numpy(), [hits[int(d)] for d in docs[order]]
    )


def test_best_snippet_window_choice():
    """best_snippet: picks the window with the most distinct query
    terms (earliest on ties), highlights exactly the matching words,
    and degrades sanely on empty input."""
    from docinsight_ray.report import best_snippet

    terms = frozenset({"alpha", "beta", "gamma"})
    # matches are dense at the END — the window must move there
    text = "x x x x x x x x x x x x x x alpha y beta z gamma alpha"
    snip = best_snippet(text, terms, window_words=8)
    assert "[alpha]" in snip and "[beta]" in snip and "[gamma]" in snip
    assert snip.split().count("x") <= 2, "window should center the match cluster"
    # punctuation/case-insensitive word-form matching
    assert "[Alpha,]" in best_snippet("q Alpha, w", terms, window_words=3)
    # tie on distinct terms → earliest window
    t2 = "alpha n n n n n n n n n n alpha"
    s2 = best_snippet(t2, frozenset({"alpha"}), window_words=4)
    assert s2.split()[0] == "[alpha]"
    assert best_snippet("", terms) == ""
    # no match at all → unhighlighted prefix window
    assert "[" not in best_snippet("u v w", terms, window_words=2)


def test_report_snippets_from_corpus(built, tmp_path):
    """With corpus_path, every hit carries a preview AND a best-window
    snippet that highlights at least one query term."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    corpus, idx = built
    corpus_path = str(tmp_path / "corpus.parquet")
    pq.write_table(corpus, corpus_path)
    sc = BM25Scorer(idx, CFG, mode="maxscore")
    queries = [(0, "public static void")]
    d, s = sc.score_maxscore(queries[0][1], 5)
    results = pa.table(
        {
            "query_id": pa.array([0] * d.size, type=pa.int64()),
            "rank": pa.array(range(d.size), type=pa.uint32()),
            "doc_id": pa.array(d, type=pa.uint64()),
            "score": pa.array(s, type=pa.float64()),
        }
    )
    out = str(tmp_path / "report.json")
    payload = write_query_report(results, queries, idx, out, corpus_path=corpus_path)
    hits = payload["queries"][0]["hits"]
    assert hits
    for h in hits:
        assert "preview" in h and len(h["preview"]) <= 160
        assert "snippet" in h and "[" in h["snippet"], h


def test_html_report_rendering(built, tmp_path):
    """S8 HTML tail: the HTML rendering contains every hit row of the
    JSON payload, escapes markup in query text, and parses cleanly
    (stdlib HTMLParser finds balanced tables)."""
    from html.parser import HTMLParser

    import pyarrow as pa

    from docinsight_ray.report import render_html_report, write_html_report

    corpus, idx = built
    sc = BM25Scorer(idx, CFG, mode="maxscore")
    queries = [(0, "public static void"), (1, "<script>alert('x')</script> main")]
    rows = []
    for qid, text in queries:
        d, s = sc.score_maxscore(text, 5)
        rows += [(qid, r, int(x), float(y)) for r, (x, y) in enumerate(zip(d, s))]
    results = pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "rank": pa.array([r[1] for r in rows], type=pa.uint32()),
            "doc_id": pa.array([r[2] for r in rows], type=pa.uint64()),
            "score": pa.array([r[3] for r in rows], type=pa.float64()),
        }
    )
    out = str(tmp_path / "report.html")
    payload = write_html_report(results, queries, idx, out)
    html = open(out).read()
    assert html == render_html_report(payload)  # deterministic
    assert "<script>" not in html  # query text is escaped
    assert "&lt;script&gt;" in html
    for q in payload["queries"]:
        for h in q["hits"]:
            assert f"<td>{h['doc_id']}</td>" in html
            assert h["path"] in html

    class Audit(HTMLParser):
        def __init__(self):
            super().__init__()
            self.opened = 0
            self.rows = 0

        def handle_starttag(self, tag, attrs):
            if tag == "table":
                self.opened += 1
            if tag == "tr":
                self.rows += 1

        def handle_endtag(self, tag):
            if tag == "table":
                self.opened -= 1

    a = Audit()
    a.feed(html)
    assert a.opened == 0  # balanced tables
    n_hits = sum(q["n_hits"] for q in payload["queries"])
    assert a.rows == n_hits + len(payload["queries"])  # data rows + header per query
