"""Document filtering + chunking operators.

- ``doc_filter`` — language/length filters with predicate pushdown at
  the read (reference analogue: ingest filters,
  /root/reference/ingestion/pipeline_ingest.py:255-263). The filter is
  given to ``read_parquet`` as a pyarrow dataset expression so
  row-groups that can't match never leave storage.
- ``chunk_docs`` — sliding-window chunking (reference:
  /root/reference/ingestion/pipeline_ingest.py:143-170). The gate
  variant uses fixed windows (size 500, stride 400 — SQL-expressible
  via substr); ``chunk_docs_word_boundary`` adds the reference's
  word-boundary backoff (non-gate, pytest-tested).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

MIN_CHARS = 200
LANGS = ("en", "de", "es")
CHUNK_SIZE = 500
CHUNK_STRIDE = 400
MAX_CHUNKS_PER_DOC = 100  # reference cap: /root/reference/config.py:258


def q_doc_filter(sf_dir: str) -> pa.Table:
    """Length+language filter, pushed down to the parquet read."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "n_chars"],
        filter=(pc.field("n_chars") >= MIN_CHARS) & (pc.field("lang").isin(LANGS)),
    )
    out = ds.to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    out["n_chars"] = out["n_chars"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def q_chunk_docs(sf_dir: str) -> pa.Table:
    """Fixed sliding-window chunks: (doc_id, ordinal, chunk_text,
    char_count); windows start at 0, CHUNK_STRIDE, 2*CHUNK_STRIDE, …
    while start < len(text), capped at MAX_CHUNKS_PER_DOC."""

    def chunk(batch: pa.Table) -> pa.Table:
        dids, ords, texts = [], [], []
        for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            n = len(text)
            ordinal = 0
            for start in range(0, max(n, 1), CHUNK_STRIDE):
                if start >= n or ordinal >= MAX_CHUNKS_PER_DOC:
                    break
                dids.append(did)
                ords.append(ordinal)
                texts.append(text[start : start + CHUNK_SIZE])
                ordinal += 1
        return pa.table(
            {
                "doc_id": pa.array(dids, type=pa.int64()),
                "ordinal": pa.array(ords, type=pa.int64()),
                "chunk_text": pa.array(texts, type=pa.string()),
                "char_count": pa.array([len(t) for t in texts], type=pa.int64()),
            }
        )

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text"])
    from ..collect import collect_table

    return collect_table(ds.map_batches(chunk, batch_format="pyarrow", zero_copy_batch=True))


def chunk_docs_word_boundary(sf_dir: str) -> pa.Table:
    """Reference-style chunking with word-boundary backoff: a window is
    shortened to the last space inside it (if any beyond half the
    window) so words are not split (pipeline_ingest.py:143-170
    semantics, re-expressed)."""

    def chunk(batch: pa.Table) -> pa.Table:
        dids, ords, texts = [], [], []
        for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            n = len(text)
            start = 0
            ordinal = 0
            while start < n and ordinal < MAX_CHUNKS_PER_DOC:
                end = min(start + CHUNK_SIZE, n)
                if end < n:
                    cut = text.rfind(" ", start + CHUNK_SIZE // 2, end)
                    if cut > start:
                        end = cut
                dids.append(did)
                ords.append(ordinal)
                texts.append(text[start:end])
                ordinal += 1
                start = end if end > start else start + CHUNK_SIZE
        return pa.table(
            {
                "doc_id": pa.array(dids, type=pa.int64()),
                "ordinal": pa.array(ords, type=pa.int64()),
                "chunk_text": pa.array(texts, type=pa.string()),
                "char_count": pa.array([len(t) for t in texts], type=pa.int64()),
            }
        )

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text"])
    from ..collect import collect_table

    return collect_table(ds.map_batches(chunk, batch_format="pyarrow", zero_copy_batch=True))


ORACLE_SQL = {
    "doc_filter": f"""
        SELECT doc_id, lang, n_chars FROM documents
        WHERE n_chars >= {MIN_CHARS} AND lang IN ({", ".join(repr(l) for l in LANGS)})
    """,
    "chunk_docs": f"""
        WITH nums AS (SELECT unnest(generate_series(0, {MAX_CHUNKS_PER_DOC - 1})) AS ordinal)
        SELECT d.doc_id, n.ordinal,
               substr(d.text, n.ordinal * {CHUNK_STRIDE} + 1, {CHUNK_SIZE}) AS chunk_text,
               length(substr(d.text, n.ordinal * {CHUNK_STRIDE} + 1, {CHUNK_SIZE}))::BIGINT AS char_count
        FROM documents d CROSS JOIN nums n
        WHERE n.ordinal * {CHUNK_STRIDE} < length(d.text)
    """,
}

QUERIES = {
    "doc_filter": q_doc_filter,
    "chunk_docs": q_chunk_docs,
}
