"""Per-query JSON report writer (SURVEY §2.1 S8) and the multi-chunk
document-query pipeline with keep-max result dedup (SURVEY §2.7 D3).

Reference analogues:
- report files: /root/reference/enhanced_pipeline.py:649-672
  (``generate_report_files`` — JSON + HTML; the HTML rendering is UI
  surface and intentionally out of scope, the JSON payload is not);
- document query + keep-max: /root/reference/retrieval/retrieval.py
  splits a query document into chunks, retrieves top-k per chunk, and
  ``_deduplicate_results`` (retrieval.py:163-172) keeps the highest-
  scoring hit per target — re-expressed here as chunk → actor-pool
  scoring → groupby(doc_id).max keep-max → global top-k.
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .config import EngineConfig
from .state.manifest import atomic_write_bytes


# --------------------------------------------------------------------------
# S8: JSON report
# --------------------------------------------------------------------------


def hydrate_results(results: pa.Table, index_dir: str) -> dict[int, dict[str, str]]:
    """doc_id → {repo, path, lang} for every doc_id in a (tiny) results
    table, read from the index's docs registry with a narrow projection
    + is_in filter (results are queries × k rows — broadcast side)."""
    import pyarrow.compute as pc

    wanted = pa.array(sorted({int(d) for d in results["doc_id"].to_pylist()}), type=pa.uint64())
    docs = pq.read_table(
        os.path.join(index_dir, "docs"), columns=["doc_id", "repo", "path", "lang"]
    )
    hit = docs.filter(pc.is_in(pc.cast(docs["doc_id"], pa.uint64()), value_set=wanted))
    return {
        int(d): {"repo": r, "path": p, "lang": lg}
        for d, r, p, lg in zip(
            hit["doc_id"].to_pylist(), hit["repo"].to_pylist(),
            hit["path"].to_pylist(), hit["lang"].to_pylist(),
        )
    }


def hydrate_previews(
    results: pa.Table, corpus_path: str, preview_chars: int | None = 160
) -> dict[int, str]:
    """doc_id → content preview for the hit docs, from the SOURCE
    corpus (the reference report's preview_text,
    enhanced_pipeline.py:712-718; content is never stored in the
    index). Streams batches with a narrow projection — the corpus is
    never fully materialized on the driver: only id-key columns plus
    the content of matching rows are held, one batch at a time.
    ``preview_chars=None`` keeps full content (snippet extraction)."""
    from .ids import doc_id_from_key

    wanted = np.fromiter(
        sorted({int(d) for d in results["doc_id"].to_pylist()}), dtype=np.uint64
    )
    files = (
        [corpus_path] if os.path.isfile(corpus_path)
        else [os.path.join(corpus_path, f) for f in sorted(os.listdir(corpus_path))
              if f.endswith(".parquet")]
    )
    names = pq.read_schema(files[0]).names
    content_col = "content" if "content" in names else "text"
    key_cols = ["doc_id"] if "doc_id" in names else ["repo", "path", "commit"]
    out: dict[int, str] = {}
    for f in files:
        pf = pq.ParquetFile(f)
        for batch in pf.iter_batches(columns=key_cols + [content_col], batch_size=4096):
            t = pa.Table.from_batches([batch])
            if "doc_id" in key_cols:
                ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
            else:
                ids = doc_id_from_key(
                    t["repo"].to_pylist(), t["path"].to_pylist(), t["commit"].to_pylist()
                )
            mask = np.isin(ids, wanted)
            if not mask.any():
                continue
            for d, c in zip(ids[mask], t.filter(pa.array(mask))[content_col].to_pylist()):
                out[int(d)] = c if preview_chars is None else c[:preview_chars]
            if len(out) == wanted.size:
                return out
    return out


_WORD_TOK = None  # compiled lazily (module import stays light)


def best_snippet(
    text: str,
    terms: set[str] | frozenset[str],
    window_words: int = 12,
    mark: tuple[str, str] = ("[", "]"),
) -> str:
    """Best-matching-window snippet with query-term highlighting (the
    serving-side hit-highlight primitive; reference analogue: matched
    span preview, /root/reference/enhanced_pipeline.py:712-718).

    Deterministic choice: over all ``window_words``-wide word windows,
    maximize (distinct matched terms, total matched words, -start) —
    earliest window wins ties. A word matches when any of its
    lowercase alnum runs (the simple-tokenizer word form) is in the
    term set; matched words are wrapped in ``mark``. Pure function —
    unit-testable without an index."""
    import re

    global _WORD_TOK
    if _WORD_TOK is None:
        _WORD_TOK = re.compile(r"[a-z0-9]+")
    words = text.split()
    if not words:
        return ""
    per_word = [frozenset(_WORD_TOK.findall(w.lower())) & terms for w in words]
    w = min(window_words, len(words))
    best = (-1, -1, 0)  # (distinct, total, -start)
    best_start = 0
    for s in range(len(words) - w + 1):
        win = per_word[s : s + w]
        total = sum(1 for m in win if m)
        if total == 0:
            continue
        distinct = len(frozenset().union(*win))
        key = (distinct, total, -s)
        if key > best:
            best, best_start = key, s
    lo, hi = best_start, best_start + w
    out = [
        f"{mark[0]}{word}{mark[1]}" if per_word[i] else word
        for i, word in enumerate(words[lo:hi], start=lo)
    ]
    return " ".join(out)


def build_query_report(
    results: pa.Table,
    queries: list[tuple[int, str]],
    index_dir: str,
    corpus_path: str | None = None,
) -> dict[str, Any]:
    """Assemble the JSON report payload: corpus stats + per-query hits
    hydrated with doc metadata (and content previews when the source
    corpus is provided)."""
    from .state.fsio import read_bytes

    stats_path = os.path.join(index_dir, "corpus_stats.json")
    data = read_bytes(stats_path)
    if data is None:
        raise FileNotFoundError(f"{stats_path}: not a built index")
    stats = json.loads(data)
    meta = hydrate_results(results, index_dir)
    content: dict[int, str] = {}
    if corpus_path:
        content = hydrate_previews(results, corpus_path, preview_chars=None)
        for d, c in content.items():
            meta.setdefault(d, {})["preview"] = c[:160]
    df = results.to_pandas().sort_values(["query_id", "rank"])
    by_query = []
    qtext = dict(queries)
    import re

    for qid, g in df.groupby("query_id", sort=True):
        qterms = frozenset(
            t for t in re.findall(r"[a-z0-9]+", qtext.get(int(qid), "").lower())
            if len(t) >= 2
        )
        hits = [
            {
                "rank": int(rk),
                "doc_id": int(d),
                "score": round(float(s), 6),
                **meta.get(int(d), {}),
                **(
                    {"snippet": best_snippet(content[int(d)], qterms)}
                    if int(d) in content and qterms
                    else {}
                ),
            }
            for rk, d, s in zip(g["rank"], g["doc_id"], g["score"])
        ]
        by_query.append(
            {"query_id": int(qid), "query": qtext.get(int(qid), ""), "n_hits": len(hits), "hits": hits}
        )
    return {
        "engine": "docinsight_ray",
        "index_dir": index_dir,
        "corpus_stats": {
            "n_docs": stats["n_docs"],
            "avgdl": stats["avgdl"],
            "k1": stats["k1"],
            "b": stats["b"],
            "tokenizer": stats["tokenizer"],
            "config_hash": stats["config_hash"],
        },
        "n_queries": len(by_query),
        "queries": by_query,
    }


def write_query_report(
    results: pa.Table,
    queries: list[tuple[int, str]],
    index_dir: str,
    out_path: str,
    corpus_path: str | None = None,
) -> dict[str, Any]:
    """Write the JSON report atomically; returns the payload."""
    payload = build_query_report(results, queries, index_dir, corpus_path=corpus_path)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)) or ".", exist_ok=True)
    atomic_write_bytes(out_path, json.dumps(payload, indent=2, sort_keys=True).encode())
    return payload


# --------------------------------------------------------------------------
# D3: document query with keep-max result dedup
# --------------------------------------------------------------------------


def split_words(text: str, chunk_words: int) -> list[str]:
    """Deterministic word-window chunker for query documents (the
    reference splits query docs into sentences; word windows are the
    tokenizer-agnostic equivalent and are SQL-reproducible)."""
    words = text.split()
    return [
        " ".join(words[i : i + chunk_words]) for i in range(0, len(words), chunk_words)
    ] or [""]


def query_document_topk(
    text: str,
    index_dir: str,
    cfg: EngineConfig | None = None,
    k: int = 10,
    chunk_words: int = 8,
    per_chunk_k: int | None = None,
    mode: str = "maxscore",
    concurrency: int = 2,
) -> pa.Table:
    """Score a whole DOCUMENT: chunk → score each chunk through the
    actor pool → keep-max per doc over chunk hits → global top-k.

    ``per_chunk_k`` is the per-chunk retrieval fan-out (the reference
    uses top-10 per sentence, config.py:203-208 — keep-max over
    partial per-chunk lists is approximate by design there; pass
    ``per_chunk_k=None`` to over-fetch everything and make keep-max
    exact). Output: (rank, doc_id, score, n_chunk_hits)."""
    import ray
    import ray.data

    from ray.data.aggregate import Count, Max

    from .scorer import query_index

    cfg = cfg or EngineConfig()
    chunks = split_words(text, chunk_words)
    from .state.fsio import read_bytes

    stats_raw = read_bytes(os.path.join(index_dir, "corpus_stats.json"))
    if stats_raw is None:
        raise FileNotFoundError(
            f"{index_dir}/corpus_stats.json: not a built index (run build_index first)"
        )
    n_docs = json.loads(stats_raw)["n_docs"]
    fanout = int(per_chunk_k) if per_chunk_k else int(n_docs)
    qtbl = pa.table(
        {
            "query_id": pa.array(range(len(chunks)), type=pa.int64()),
            "text": pa.array(chunks, type=pa.string()),
            "k": pa.array([fanout] * len(chunks), type=pa.uint32()),
        }
    )
    per_chunk = query_index(
        ray.data.from_arrow(qtbl), index_dir, cfg, mode=mode, concurrency=concurrency
    )
    # keep-max dedup (D3): one row per doc, its best chunk score
    best = per_chunk.groupby("doc_id").aggregate(
        Max("score", alias_name="score"), Count(alias_name="n_chunk_hits")
    )
    df = best.to_pandas()  # result-sized: ≤ chunks × fanout docs
    docs = df["doc_id"].to_numpy().astype(np.uint64)
    scores = df["score"].to_numpy()
    order = np.lexsort((docs, -np.round(scores, 6)))[:k]
    return pa.table(
        {
            "rank": pa.array(np.arange(order.size, dtype=np.int64), type=pa.int64()),
            "doc_id": pa.array(docs[order].astype(np.int64), type=pa.int64()),
            "score": pa.array(np.round(scores[order], 6), type=pa.float64()),
            "n_chunk_hits": pa.array(
                df["n_chunk_hits"].to_numpy()[order].astype(np.int64), type=pa.int64()
            ),
        }
    )


# --------------------------------------------------------------------------
# HTML rendering (S8 tail; reference enhanced_pipeline.py:673-721
# _generate_html_report — same payload, stdlib-only renderer)


_HTML_HEAD = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>docinsight_ray query report</title>
<style>
body{font-family:system-ui,sans-serif;margin:2rem;color:#1a1a1a}
table{border-collapse:collapse;margin:0.5rem 0 1.5rem}
th,td{border:1px solid #ccc;padding:0.3rem 0.6rem;text-align:left;font-size:0.9rem}
th{background:#f0f0f0}
.stats{color:#555;font-size:0.9rem}
.snippet{color:#333;font-size:0.85rem;max-width:48rem}
h2{margin-top:1.5rem;font-size:1.1rem}
</style></head><body>
"""


def render_html_report(payload: dict[str, Any]) -> str:
    """Render the ``build_query_report`` JSON payload as a static HTML
    page (stdlib only; output is deterministic for a fixed payload).

    Reference parity: enhanced_pipeline.py:673-721 renders its report
    dict to HTML with per-sentence tables; here the unit is the
    per-query hit table, matching this engine's retrieval contract."""
    from html import escape

    st = payload["corpus_stats"]
    parts = [_HTML_HEAD]
    parts.append("<h1>docinsight_ray query report</h1>\n")
    parts.append(
        f'<p class="stats">index: {escape(str(payload["index_dir"]))} &middot; '
        f'{int(st["n_docs"])} docs &middot; avgdl {float(st["avgdl"]):.2f} &middot; '
        f'BM25(k1={st["k1"]}, b={st["b"]}) &middot; tokenizer {escape(str(st["tokenizer"]))} '
        f'&middot; config {escape(str(st["config_hash"]))}</p>\n'
    )
    meta_keys: list[str] = []
    for q in payload["queries"]:
        for h in q["hits"]:
            for k in h:
                if k not in ("rank", "doc_id", "score", "preview", "snippet") and k not in meta_keys:
                    meta_keys.append(k)
    for q in payload["queries"]:
        parts.append(
            f'<h2>Q{int(q["query_id"])}: {escape(q["query"])} '
            f'<span class="stats">({int(q["n_hits"])} hits)</span></h2>\n'
        )
        cols = ["rank", "doc_id", "score", *meta_keys]
        has_text = any(("snippet" in h or "preview" in h) for h in q["hits"])
        if has_text:
            cols.append("snippet")
        parts.append("<table><tr>" + "".join(f"<th>{escape(c)}</th>" for c in cols) + "</tr>\n")
        for h in q["hits"]:
            cells = [str(int(h["rank"])), str(int(h["doc_id"])), f'{float(h["score"]):.6f}']
            cells += [escape(str(h.get(k, ""))) for k in meta_keys]
            if has_text:
                cells.append(
                    f'<span class="snippet">{escape(str(h.get("snippet", h.get("preview", ""))))}</span>'
                )
            parts.append("<tr>" + "".join(f"<td>{c}</td>" for c in cells) + "</tr>\n")
        parts.append("</table>\n")
    parts.append("</body></html>\n")
    return "".join(parts)


def write_html_report(
    results: pa.Table,
    queries: list[tuple[int, str]],
    index_dir: str,
    out_path: str,
    corpus_path: str | None = None,
) -> dict[str, Any]:
    """Build the payload and write its HTML rendering atomically;
    returns the payload (same contract as ``write_query_report``)."""
    payload = build_query_report(results, queries, index_dir, corpus_path=corpus_path)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)) or ".", exist_ok=True)
    atomic_write_bytes(out_path, render_html_report(payload).encode())
    return payload
