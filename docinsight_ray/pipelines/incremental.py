"""Windowed incremental indexing — append-only corpora.

The streaming-shaped build path (brief: "a streaming window" custom
operator): an append-only corpus arrives as time/ingest windows; each
window becomes an independent, resumable sub-index
(``index_root/window=<id>``), and every append re-distributes the
corpus-wide statistics (n_docs, avgdl, global df) to all windows so
BM25 scores stay globally correct. Querying fans out over windows and
exact-merges top-k — identical machinery to doc-sharded serving
(``sharded.py``), because a window IS a doc-partition keyed by arrival
time instead of hash.

Contract (tested in tests/test_incremental.py): after appending
windows W1..Wn, results are rank-identical to a single build over the
concatenated corpus. This replaces the reference's incremental
``add_vectors`` path (/root/reference/index/index_manager.py:124-201)
with window-granular appends that keep the per-partition
checkpoint/lineage story — no in-place index mutation, ever (the
reference itself can only rebuild to remove,
/root/reference/index/faiss_index.py:243-266).

Caveat (documented, matching sharded.py): exact dedup across windows
requires a global (sha → winner) pre-pass; with dedup enabled, a
duplicate arriving in a LATER window than its original is dropped via
the cross-window loser filter below.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import ray
import ray.data

from ..build import build_index
from ..config import EngineConfig
from ..scorer import BM25Scorer
from .sharded import distribute_global_stats, merge_topk


def _window_dirs(index_root: str) -> list[str]:
    from ..state.fsio import listdir_names

    return [
        os.path.join(index_root, n)
        for n in listdir_names(index_root)
        if n.startswith("window=")
    ]


def _window_stats(d: str) -> dict | None:
    """Stats of a COMMITTED window; None for a partially-built dir
    (corpus_stats.json is the last thing a build writes)."""
    from ..state.fsio import read_bytes

    data = read_bytes(os.path.join(d, "corpus_stats.json"))
    return None if data is None else json.loads(data)


def append_window(
    corpus_window: "ray.data.Dataset",
    index_root: str,
    window_id: str,
    cfg: EngineConfig | None = None,
) -> list[str]:
    """Index one corpus window and refresh global stats across all
    windows. Returns the current window dir list."""
    cfg = cfg or EngineConfig()

    if cfg.dedup:
        # cross-window exact dedup: drop rows whose content_sha256
        # already exists in an earlier window's docs registry. The seen
        # set never lands in a driver Python set: prior windows' sha
        # columns are read as a Dataset and filtered through
        # key_set_filter (ray.put broadcast below cfg.broadcast_limit,
        # hash-partitioned anti-join above — docinsight_ray.joins).
        from ..state.fsio import exists as fs_exists, read_parquet_files

        # "prior" = COMMITTED windows other than the one being appended:
        # a crashed earlier attempt at THIS window leaves a stats-less
        # dir whose docs registry must not poison the seen-sha set
        # (it would filter out every row of the resumed append), and
        # other partially-built windows aren't committed corpus either
        this_dir = os.path.join(index_root, f"window={window_id}")
        prior_stats = [
            (d, _window_stats(d)) for d in _window_dirs(index_root) if d != this_dir
        ]
        prior_stats = [(d, s) for d, s in prior_stats if s is not None]
        docs_dirs = [os.path.join(d, "docs") for d, _ in prior_stats
                     if fs_exists(os.path.join(d, "docs"))]
        n_seen = sum(s.get("shard_n_docs", s["n_docs"]) for _, s in prior_stats)
        if docs_dirs and n_seen:
            from ..joins import key_set_filter

            def with_sha(batch: pa.Table) -> pa.Table:
                from ..ids import sha256_hex

                return batch.append_column(
                    "content_sha256",
                    pa.array(sha256_hex(batch["content"].to_pylist()), type=pa.string()),
                )

            # read_parquet rejects a LIST of directories — expand to files
            docs_files = [f for dd in docs_dirs for f in read_parquet_files(dd)]
            seen_ds = ray.data.read_parquet(docs_files, columns=["content_sha256"])
            corpus_window = key_set_filter(
                corpus_window.map_batches(
                    with_sha, batch_format="pyarrow", zero_copy_batch=True
                ),
                seen_ds,
                "content_sha256",
                n_keys=n_seen,
                broadcast_limit=cfg.broadcast_limit,
                num_partitions=cfg.num_buckets,
            ).drop_columns(["content_sha256"])

    d = os.path.join(index_root, f"window={window_id}")
    build_index(corpus_window, d, cfg, fingerprint=f"window:{window_id}")
    dirs = _window_dirs(index_root)
    # incremental df path: prior snapshot + this window's parts (falls
    # back to full re-aggregation when coverage doesn't line up)
    distribute_global_stats(dirs, appended=d)
    return dirs


def query_windows(
    queries: "ray.data.Dataset",
    index_root: str,
    cfg: EngineConfig | None = None,
    mode: str = "taat",
    concurrency_per_window: int = 1,
) -> "ray.data.Dataset":
    """Fan queries over all window sub-indexes; exact top-k merge
    (same shape as sharded.query_sharded)."""
    cfg = cfg or EngineConfig()
    dirs = []
    for d in _window_dirs(index_root):
        # skip empty windows (fully-deduplicated appends) and
        # partially-built dirs (no committed corpus_stats yet)
        s = _window_stats(d)
        if s is not None and s.get("shard_n_docs", s["n_docs"]) > 0:
            dirs.append(d)
    if not dirs:
        raise FileNotFoundError(f"no non-empty window=* sub-indexes under {index_root}")
    results = [
        queries.map_batches(
            BM25Scorer,
            fn_constructor_args=(d, cfg, mode, True),  # emit_k: carry k to the merge
            batch_format="pyarrow",
            batch_size=cfg.query_batch_size,
            concurrency=concurrency_per_window,
            num_cpus=1,
        )
        for d in dirs
    ]
    union = results[0].union(*results[1:]) if len(results) > 1 else results[0]
    return union.groupby("query_id").map_groups(merge_topk, batch_format="pyarrow")
