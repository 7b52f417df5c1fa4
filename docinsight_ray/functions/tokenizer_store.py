"""Persisted tokenizer artifacts: train once, save, load anywhere.

Completes the tokenizer-training lifecycle next to the index lifecycle
(build → persist → serve): the BPE merge table or unigram piece table
— a pure function of the corpus word histogram — is written as a
parquet artifact with a JSON stats sidecar (row-count + sha256
checksum, fingerprint, algo) through ``state/fsio``, so tokenizer dirs
live on the same shared-FS paths or pyarrow.fs URIs as index dirs.
Loading verifies the checksum BEFORE handing the vocabulary to an
encoder (a truncated artifact must fail loudly, not re-segment the
corpus differently), mirroring ``state/snapshot``'s verify-then-serve
discipline.

Layout::

    <dir>/vocab.parquet     # BPE: (rank,left,right,merged,pair_count)
                            # unigram: (rank,piece,logprob)
    <dir>/tok_stats.json    # {"algo","fingerprint","n_rows","sha256"}

CLI: ``tokbuild <documents_dir_or_sf> <out_dir> --algo bpe|unigram``.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pyarrow as pa

TOK_STATS = "tok_stats.json"
VOCAB_FILE = "vocab.parquet"


def _table_sha(tbl: pa.Table) -> str:
    import pyarrow.ipc as ipc
    import io

    sink = io.BytesIO()
    with ipc.new_stream(sink, tbl.schema) as w:
        w.write_table(tbl.combine_chunks())
    return hashlib.sha256(sink.getvalue()).hexdigest()


def save_tokenizer(sf_dir: str, out_dir: str, algo: str = "bpe",
                   fingerprint: str = "") -> dict:
    """Train over ``sf_dir``'s documents (one histogram pass) and
    persist the artifact. Returns the stats dict."""
    from ..state.fsio import makedirs, write_bytes_atomic, write_parquet_atomic

    if algo == "bpe":
        from .bpe import train_bpe, word_histogram

        hist = word_histogram(sf_dir)
        merges, _seg = train_bpe(
            hist["word"].tolist(), hist["count"].to_numpy(dtype=np.int64)
        )
        tbl = pa.table(
            {
                "rank": pa.array(np.arange(len(merges), dtype=np.int64)),
                "left": pa.array([a for a, _b, _m, _c in merges], type=pa.string()),
                "right": pa.array([b for _a, b, _m, _c in merges], type=pa.string()),
                "merged": pa.array([m for _a, _b, m, _c in merges], type=pa.string()),
                "pair_count": pa.array([c for *_x, c in merges], type=pa.int64()),
            }
        )
    elif algo == "unigram":
        from .bpe import word_histogram
        from .unigram import train_unigram

        vocab = train_unigram(word_histogram(sf_dir))
        tbl = pa.table(
            {
                "rank": pa.array(np.arange(len(vocab), dtype=np.int64)),
                "piece": pa.array([p for p, _ in vocab], type=pa.string()),
                "logprob": pa.array([lp for _, lp in vocab], type=pa.float64()),
            }
        )
    else:
        raise ValueError(f"unknown tokenizer algo: {algo!r} (bpe | unigram)")
    makedirs(out_dir)
    write_parquet_atomic(tbl, os.path.join(out_dir, VOCAB_FILE))
    stats = {
        "algo": algo,
        "fingerprint": fingerprint or sf_dir,
        "n_rows": tbl.num_rows,
        "sha256": _table_sha(tbl),
    }
    # stats written LAST: its presence marks a complete artifact
    write_bytes_atomic(
        os.path.join(out_dir, TOK_STATS), json.dumps(stats, sort_keys=True).encode()
    )
    return stats


def load_tokenizer(tok_dir: str):
    """Load + VERIFY a persisted tokenizer. Returns ``(algo, payload)``
    where payload is BPE merge ranks (``{(l, r): rank}``) or the
    unigram ``[(piece, logprob)]`` list — exactly what the encoders
    take. Raises FileNotFoundError for an unbuilt dir and ValueError
    on checksum mismatch (corruption)."""
    import pyarrow.parquet as pq

    from ..state.fsio import read_bytes

    raw = read_bytes(os.path.join(tok_dir, TOK_STATS))
    if raw is None:
        raise FileNotFoundError(f"{tok_dir}/{TOK_STATS}: not a built tokenizer dir")
    stats = json.loads(raw)
    tbl = pq.read_table(os.path.join(tok_dir, VOCAB_FILE))
    if tbl.num_rows != stats["n_rows"] or _table_sha(tbl) != stats["sha256"]:
        raise ValueError(
            f"{tok_dir}/{VOCAB_FILE}: checksum mismatch — artifact is corrupt "
            "or was overwritten mid-write"
        )
    if stats["algo"] == "bpe":
        ranks = {
            (l, r): int(k)
            for k, l, r in zip(
                tbl["rank"].to_pylist(), tbl["left"].to_pylist(), tbl["right"].to_pylist()
            )
        }
        return "bpe", ranks
    return "unigram", list(zip(tbl["piece"].to_pylist(), tbl["logprob"].to_pylist()))
