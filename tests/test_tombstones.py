"""Document deletion (tombstones) over the windowed index.

Contract: ``delete_docs`` excludes docs from every query immediately
with scores of survivors unchanged (pre-delete corpus statistics —
Lucene deleted-docs semantics); ``compact_windows`` applies the
tombstones physically, after which results are rank-identical to a
fresh build over the surviving corpus (statistics exact again). The
reference can only rebuild to remove
(/root/reference/index/faiss_index.py:243-266)."""

import json
import os

import numpy as np
import pyarrow as pa

from docinsight_ray.config import EngineConfig
from docinsight_ray.fixtures import gen_corpus, gen_queries, queries_table
from docinsight_ray.ids import doc_id_from_key, sha256_hex
from docinsight_ray.oracle import OracleIndex
from docinsight_ray.pipelines.incremental import (
    append_window,
    compact_windows,
    delete_docs,
    query_windows,
)

CFG = EngineConfig(num_buckets=8, dedup=True)

# rows to delete: some from each window (window split at row 120)
DEL_ROWS = list(range(5, 13)) + list(range(125, 132))


def _build_two_windows(tmp_path):
    import ray.data

    corpus = gen_corpus(240, seed=23, with_cases=False)
    root = str(tmp_path / "tomb")
    append_window(ray.data.from_arrow(corpus.slice(0, 120)), root, "000", CFG)
    append_window(ray.data.from_arrow(corpus.slice(120)), root, "001", CFG)
    return corpus, root


def _dead_ids(corpus) -> np.ndarray:
    ids = doc_id_from_key(
        corpus["repo"].to_pylist(), corpus["path"].to_pylist(), corpus["commit"].to_pylist()
    )
    return np.sort(ids[DEL_ROWS].astype(np.uint64))


def _expect_filtered(oracle: OracleIndex, text: str, k: int, dead: np.ndarray):
    """Exact deleted-docs expectation: over-fetch from the FULL-corpus
    oracle (stats unchanged), drop dead docs, take k — filtering a
    (score desc, doc_id asc)-sorted list preserves the order."""
    od, osc = oracle.score(text, k + dead.size)
    keep = ~np.isin(od, dead)
    return od[keep][:k], osc[keep][:k]


def test_delete_docs_serving_semantics(ray_session, tmp_path):
    import ray.data

    corpus, root = _build_two_windows(tmp_path)
    shas = [sha256_hex([corpus["content"][i].as_py()])[0] for i in DEL_ROWS]
    n = delete_docs(root, shas=shas)
    assert n == len(DEL_ROWS)
    # idempotent: same set → same content-addressed file, still one file
    assert delete_docs(root, shas=shas) == len(DEL_ROWS)
    tomb_files = [f for f in os.listdir(os.path.join(root, "tombstones")) if f.endswith(".parquet")]
    assert len(tomb_files) == 1
    # unknown sha is a no-op
    assert delete_docs(root, shas=["0" * 64]) == 0

    dead = _dead_ids(corpus)
    oracle = OracleIndex(corpus, CFG)  # full-corpus stats: pre-delete semantics
    queries = gen_queries(corpus, n_keyword=8, seed=23)
    qds = ray.data.from_arrow(queries_table(queries))
    out = query_windows(qds, root, CFG, mode="taat").to_pandas()
    assert not np.isin(out.doc_id.to_numpy(dtype=np.uint64), dead).any()
    hit_any = False
    for qid, text, k in queries:
        ed, es = _expect_filtered(oracle, text, k, dead)
        sub = out[out.query_id == qid].sort_values("rank")
        np.testing.assert_array_equal(sub.doc_id.to_numpy(dtype=np.uint64), ed)
        np.testing.assert_array_equal(sub.score.to_numpy(), es)
        fd, _ = oracle.score(text, k)
        hit_any = hit_any or bool(np.isin(fd, dead).any())
    assert hit_any, "fixture too weak: no deleted doc ever ranked top-k pre-delete"


def test_compaction_applies_tombstones(ray_session, tmp_path):
    import ray.data

    corpus, root = _build_two_windows(tmp_path)
    dead = _dead_ids(corpus)
    delete_docs(root, doc_ids=dead.tolist())

    out_dir = compact_windows(root, cfg=CFG)
    # full compaction applied every tombstone: dir cleared, docs gone
    assert not os.path.exists(os.path.join(root, "tombstones"))
    # expected survivors emulate the build exactly: exact-dedup FIRST
    # (keep-first = min doc_id, same rule as the build — the fixture
    # corpus contains a couple of exact dups), THEN drop tombstoned ids
    ids = doc_id_from_key(
        corpus["repo"].to_pylist(), corpus["path"].to_pylist(), corpus["commit"].to_pylist()
    ).astype(np.uint64)
    winners: dict = {}
    for i, c in enumerate(corpus["content"].to_pylist()):
        j = winners.get(c)
        if j is None or ids[i] < ids[j]:
            winners[c] = i
    dead_set = set(dead.tolist())
    keep = sorted(i for i in winners.values() if int(ids[i]) not in dead_set)
    oracle = OracleIndex(corpus.take(keep), CFG)  # stats recomputed post-delete
    stats = json.load(open(os.path.join(out_dir, "corpus_stats.json")))
    assert stats["n_docs"] == oracle.n_docs == len(keep)
    queries = gen_queries(corpus, n_keyword=8, seed=23)
    qds = ray.data.from_arrow(queries_table(queries))
    out = query_windows(qds, root, CFG, mode="bmw").to_pandas()
    for qid, text, k in queries:
        od, osc = oracle.score(text, k)
        sub = out[out.query_id == qid].sort_values("rank")
        np.testing.assert_array_equal(sub.doc_id.to_numpy(dtype=np.uint64), od)
        np.testing.assert_array_equal(sub.score.to_numpy(), osc)


def test_delete_then_reingest(ray_session, tmp_path):
    """Deleted content re-ingested under a NEW key must be indexed
    again: tombstoned registry rows do not count as 'seen' in the
    cross-window dedup filter."""
    import ray.data

    corpus, root = _build_two_windows(tmp_path)
    sha = sha256_hex([corpus["content"][7].as_py()])[0]
    assert delete_docs(root, shas=[sha]) >= 1
    # same content, different key (→ different doc_id, not tombstoned)
    readd = corpus.slice(7, 1).set_column(
        0, "repo", pa.array(["reingested/" + corpus["repo"][7].as_py()])
    )
    append_window(ray.data.from_arrow(readd), root, "002", CFG)
    stats = json.load(open(os.path.join(root, "window=002", "corpus_stats.json")))
    assert stats["shard_n_docs"] == 1, "re-ingested deleted content must survive the seen filter"


def test_exclude_doc_ids_single_index(ray_session, tmp_path):
    """The scorer-level exclude_doc_ids param on a plain (non-windowed)
    index: identical to post-filtering the full ranking, in a pruning
    mode (stored bounds stay safe over-estimates under deletion)."""
    import ray.data

    from docinsight_ray.build import build_index
    from docinsight_ray.scorer import query_index

    corpus = gen_corpus(200, seed=29, with_cases=False)
    idx = str(tmp_path / "idx")
    build_index(ray.data.from_arrow(corpus), idx, CFG, fingerprint="t")
    ids = doc_id_from_key(
        corpus["repo"].to_pylist(), corpus["path"].to_pylist(), corpus["commit"].to_pylist()
    )
    dead = np.sort(ids[10:30].astype(np.uint64))
    oracle = OracleIndex(corpus, CFG)
    queries = gen_queries(corpus, n_keyword=6, seed=29)
    qds = ray.data.from_arrow(queries_table(queries))
    out = query_index(qds, idx, CFG, mode="maxscore", exclude_doc_ids=dead).to_pandas()
    for qid, text, k in queries:
        ed, es = _expect_filtered(oracle, text, k, dead)
        sub = out[out.query_id == qid].sort_values("rank")
        np.testing.assert_array_equal(sub.doc_id.to_numpy(dtype=np.uint64), ed)
        np.testing.assert_array_equal(sub.score.to_numpy(), es)
