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

Deletes: ``delete_docs`` tombstones documents (append-only parquet
under ``index_root/tombstones``); ``query_windows`` excludes them
immediately (scores keep pre-delete statistics — Lucene deleted-docs
semantics) and ``compact_windows`` removes them physically, after
which statistics are exact again.
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
    corpus_factory=None,
    refresh_stats: bool = True,
) -> list[str]:
    """Index one corpus window and refresh global stats across all
    windows. Returns the current window dir list.

    ``refresh_stats=False`` defers the global-stats redistribution —
    the batched-append path (``append_windows`` /
    ``refresh_global_stats``): N appends pay ONE redistribution instead
    of N. Until the explicit refresh runs, windows score with stale
    (per-window or last-refresh) statistics, so serve only after
    ``refresh_global_stats``. Cross-window dedup is unaffected (it
    reads docs registries, not stats).

    ``corpus_factory`` (optional zero-arg callable recreating
    ``corpus_window``, e.g. a column-pruned ``read_parquet``): when
    given AND the seen-sha set exceeds ``cfg.broadcast_limit``, the
    cross-window dedup runs through ``joins.bloom_key_set_filter`` —
    definitely-new rows bypass the anti-join shuffle entirely and only
    the maybe-seen sliver is join-verified (the 100-TB append shape:
    the seen set dwarfs the broadcast budget while most of the new
    window is genuinely new). Without it, the proven
    broadcast/anti-join auto path runs unchanged."""
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
        superseded = _compacted_sources(index_root)
        prior_stats = [
            (d, _window_stats(d)) for d in _window_dirs(index_root)
            if d != this_dir and os.path.basename(d) not in superseded
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
            # tombstoned docs must NOT count as "seen": deleted content
            # re-ingested under a new key is corpus again, not a dup
            # (n_seen stays the pre-filter upper bound — safe for
            # broadcast sizing and the Bloom n_keys estimate)
            seen_ds = _drop_tombstoned(
                ray.data.read_parquet(docs_files, columns=["content_sha256", "doc_id"]),
                _tombstone_ids(index_root),
            ).drop_columns(["doc_id"])
            if corpus_factory is not None and n_seen > cfg.broadcast_limit:
                from ..joins import bloom_key_set_filter

                corpus_window = bloom_key_set_filter(
                    lambda: corpus_factory().map_batches(
                        with_sha, batch_format="pyarrow", zero_copy_batch=True
                    ),
                    seen_ds,
                    "content_sha256",
                    n_keys=n_seen,
                    num_partitions=cfg.num_buckets,
                ).drop_columns(["content_sha256"])
            else:
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
    # LIVE windows only: sources superseded by a committed compaction
    # still on disk (delete_sources=False) hold docs the compacted
    # window already carries — including them would double-count every
    # global statistic (n_docs, avgdl, df) across the whole index
    superseded = _compacted_sources(index_root)
    dirs = [
        w for w in _window_dirs(index_root)
        if os.path.basename(w) not in superseded
    ]
    # incremental df path: prior snapshot + this window's parts (falls
    # back to full re-aggregation when coverage doesn't line up)
    if refresh_stats:
        distribute_global_stats(dirs, appended=d)
    return dirs


def refresh_global_stats(index_root: str, appended: str | None = None) -> list[str]:
    """Redistribute corpus-wide statistics across all live windows —
    the explicit counterpart to deferred ``append_window(...,
    refresh_stats=False)`` appends. With multiple new windows the
    coverage marker can't match, so this is the full (term, df)
    re-aggregation; still O(dictionary), never O(postings)."""
    superseded = _compacted_sources(index_root)
    dirs = [
        w for w in _window_dirs(index_root)
        if os.path.basename(w) not in superseded
    ]
    distribute_global_stats(dirs, appended=appended)
    return dirs


def append_windows(
    windows,
    index_root: str,
    cfg: EngineConfig | None = None,
) -> list[str]:
    """Append N corpus windows with ONE global-stats redistribution
    (VERDICT r3, Next round #5 — frequent-append batching).

    ``windows``: iterable of ``(corpus_window, window_id)`` or
    ``(corpus_window, window_id, corpus_factory)`` tuples, applied in
    order (cross-window dedup sees each earlier window). Returns the
    live window dirs after the final refresh. Rank-identity with the
    per-append refresh path is pinned by
    tests/test_incremental.py::test_append_windows_batched."""
    cfg = cfg or EngineConfig()
    for w in windows:
        ds, window_id, *rest = w
        append_window(
            ds, index_root, window_id, cfg,
            corpus_factory=rest[0] if rest else None,
            refresh_stats=False,
        )
    return refresh_global_stats(index_root)


def _drop_tombstoned(ds: "ray.data.Dataset", dead) -> "ray.data.Dataset":
    """Filter rows whose uint64 ``doc_id`` is in the sorted ``dead``
    array (broadcast once via ray.put; sorted-probe per batch)."""
    if dead is None or not len(dead):
        return ds
    ref = ray.put(dead)

    def drop(t: pa.Table, _r=ref) -> pa.Table:
        import numpy as np

        da = ray.get(_r)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        pos = np.minimum(np.searchsorted(da, ids), da.size - 1)
        return t.filter(pa.array(da[pos] != ids))

    return ds.map_batches(drop, batch_format="pyarrow", zero_copy_batch=True)


def _tombstone_ids(index_root: str):
    """Sorted uint64 doc_ids tombstoned under ``index_root/tombstones``
    (empty array when none)."""
    import numpy as np

    from ..state.fsio import glob_parquet

    import pyarrow.parquet as pq

    files = glob_parquet(os.path.join(index_root, "tombstones"))
    if not files:
        return np.empty(0, dtype=np.uint64)
    return np.unique(
        np.concatenate(
            [
                pq.read_table(f, columns=["doc_id"])["doc_id"]
                .to_numpy(zero_copy_only=False)
                .astype(np.uint64)
                for f in files
            ]
        )
    )


def delete_docs(
    index_root: str,
    doc_ids=None,
    shas: list[str] | None = None,
    cfg: EngineConfig | None = None,
) -> int:
    """Tombstone documents in a windowed index (Lucene-style deletes —
    the capability the reference lacks entirely: its FAISS index can
    only REBUILD to remove, /root/reference/index/faiss_index.py:243-266).

    Writes an append-only, content-addressed tombstone parquet under
    ``index_root/tombstones/`` (idempotent: re-deleting the same set
    overwrites the same file). ``query_windows`` then excludes the
    doc_ids from every result while corpus statistics stay pre-delete
    (the standard deleted-docs contract); ``compact_windows`` applies
    tombstones physically and recomputes exact statistics.

    ``shas`` are resolved to doc_ids against the live windows' docs
    registries via a distributed narrow read (only matches reach the
    driver). Unknown shas are no-ops. Returns the number of doc_ids
    tombstoned by THIS call."""
    import hashlib

    import numpy as np
    import pyarrow.compute as pc

    from ..collect import collect_table
    from ..state.fsio import makedirs as fs_makedirs, read_parquet_files, write_parquet_atomic

    ids: list = list(doc_ids or [])
    if shas:
        superseded = _compacted_sources(index_root)
        docs_files = []
        for d in _window_dirs(index_root):
            if os.path.basename(d) in superseded or _window_stats(d) is None:
                continue
            dd = os.path.join(d, "docs")
            docs_files.extend(read_parquet_files(dd))
        if docs_files:
            want = pa.array(sorted(set(shas)), type=pa.string())

            def matches(t: pa.Table) -> pa.Table:
                m = pc.is_in(t["content_sha256"].combine_chunks(), value_set=want)
                return t.filter(m).select(["doc_id", "content_sha256"])

            hits = collect_table(
                ray.data.read_parquet(
                    docs_files, columns=["doc_id", "content_sha256"]
                ).map_batches(matches, batch_format="pyarrow", zero_copy_batch=True),
                empty_schema=pa.schema(
                    [("doc_id", pa.uint64()), ("content_sha256", pa.string())]
                ),
            )
            ids.extend(hits["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64))
    if not ids:
        return 0
    arr = np.unique(np.asarray(ids, dtype=np.uint64))
    tag = hashlib.sha256(arr.tobytes()).hexdigest()[:16]
    fs_makedirs(os.path.join(index_root, "tombstones"))
    write_parquet_atomic(
        pa.table({"doc_id": pa.array(arr, type=pa.uint64())}),
        os.path.join(index_root, "tombstones", f"tomb-{tag}.parquet"),
    )
    return int(arr.size)


class _PostingsDecoder:
    """Actor-pool stage for compaction: one source postings part file →
    SPIMI fragment rows (term, doc_id, tf, doc_len) + df sidecar,
    written straight into the compacted window's staging dirs.

    doc_len rides back in via a per-window (doc_id → doc_len) lookup
    loaded once per actor per window (the same per-sub-index doc-len
    array the scorer itself holds — the documented partitioning
    assumption is that ONE WINDOW's doc-len table fits a worker).
    Fragment names are content-addressed by the source file path, so
    Ray task retries overwrite idempotently.

    Sidecar soundness: within one window a term's postings live in
    exactly ONE parts file (its bucket, or one hot row), so pdf_f =
    df_w and with ndocs_f = window n_docs the hot-term pigeonhole
    (build.py hot detection) holds ACROSS windows: global df ≥
    ratio·Σn_w implies some window has df_w ≥ ratio·n_w."""

    def __init__(self, frag_dir: str, dfstats_dir: str, dead_ref=None):
        self.frag_dir = frag_dir
        self.dfstats_dir = dfstats_dir
        # tombstoned doc_ids (sorted uint64, ray.put once driver-side):
        # dropped from every decoded posting list, so compaction applies
        # deletes physically and the rebuild's stats exclude them
        import numpy as np

        if dead_ref is None:
            self._dead = np.empty(0, dtype=np.uint64)
        else:  # ObjectRef, or already resolved by the actor call path
            v = ray.get(dead_ref) if isinstance(dead_ref, ray.ObjectRef) else dead_ref
            self._dead = np.asarray(v, dtype=np.uint64)
        self._dl: dict[str, tuple] = {}  # window dir → (sorted ids, lens)

    def _doc_lens(self, wdir: str):
        import numpy as np
        import pyarrow.parquet as pq

        cached = self._dl.get(wdir)
        if cached is None:
            t = pq.read_table(os.path.join(wdir, "docs"), columns=["doc_id", "doc_len"])
            ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
            lens = t["doc_len"].to_numpy(zero_copy_only=False).astype(np.uint32)
            order = np.argsort(ids, kind="stable")
            cached = (ids[order], lens[order])
            if len(self._dl) > 4:
                self._dl.clear()
            self._dl[wdir] = cached
        return cached

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        import numpy as np

        from ..codec import decode_posting
        from ..state.fsio import write_parquet_atomic

        n_terms_out = 0
        for fpath, wdir, wdocs in zip(
            batch["file"].to_pylist(), batch["wdir"].to_pylist(), batch["wdocs"].to_pylist()
        ):
            import pyarrow.parquet as pq

            t = pq.read_table(fpath, columns=["term", "df", "doc_ids_vb", "tfs_vb"])
            if t.num_rows == 0:
                continue
            dl_ids, dl_lens = self._doc_lens(wdir)
            terms_out, ids_out, tfs_out, lens_out = [], [], [], []
            dead = self._dead
            for term, df, dvb, tvb in zip(
                t["term"].to_pylist(), t["df"].to_pylist(),
                t["doc_ids_vb"].to_pylist(), t["tfs_vb"].to_pylist(),
            ):
                d, f = decode_posting(dvb, tvb, int(df))
                if dead.size:
                    pos = np.minimum(np.searchsorted(dead, d), dead.size - 1)
                    keep = dead[pos] != d
                    d, f = d[keep], f[keep]
                    if d.size == 0:
                        continue
                terms_out.append(np.full(d.size, term, dtype=object))
                ids_out.append(d)
                tfs_out.append(f.astype(np.uint32))
                lens_out.append(dl_lens[np.searchsorted(dl_ids, d)])
            tag = hashlib.sha256(fpath.encode()).hexdigest()[:20]
            if terms_out:  # tombstones can empty an entire parts file
                frag = pa.table(
                    {
                        "term": pa.array(np.concatenate(terms_out), type=pa.string()),
                        "doc_id": pa.array(np.concatenate(ids_out), type=pa.uint64()),
                        "tf": pa.array(np.concatenate(tfs_out), type=pa.uint32()),
                        "doc_len": pa.array(np.concatenate(lens_out), type=pa.uint32()),
                    }
                )
                write_parquet_atomic(frag, f"{self.frag_dir}/frag-{tag}-{frag.num_rows}.parquet")
            side = pa.table(
                {
                    "term": t["term"],
                    "pdf": pa.array(
                        t["df"].to_numpy(zero_copy_only=False).astype(np.uint32),
                        type=pa.uint32(),
                    ),
                    "ndocs": pa.array(
                        np.full(t.num_rows, int(wdocs), dtype=np.uint32), type=pa.uint32()
                    ),
                }
            )
            write_parquet_atomic(side, f"{self.dfstats_dir}/frag-{tag}.parquet")
            n_terms_out += t.num_rows
        return pa.table({"n_terms": pa.array([n_terms_out], type=pa.int64())})


def plan_compaction(
    index_root: str,
    max_windows: int = 4,
    tier_factor: float = 4.0,
) -> list[str]:
    """Tiered merge policy (the Lucene TieredMergePolicy analogue for
    window sub-indexes): decide WHICH windows to compact instead of
    always folding everything. Long-running deployments accumulate one
    window per append; merging all of them every time rewrites the big
    old segments over and over (O(n²) total write amplification). The
    policy keeps per-query fan-out ≤ ``max_windows`` while never
    rewriting a window more than ``tier_factor`` times its own size
    ladder (each window participates in O(log_tier(total)) merges over
    its lifetime):

    - if the live window count is ≤ max_windows → no merge (empty plan);
    - otherwise merge the first (smallest-start) RUN of size-sorted
      windows whose members stay within one size tier: each next
      window must be ≤ tier_factor × the largest already in the run.
      A tier gap ends the run; a run of one is skipped (a lone minnow
      below a gap must never block the tier above it), and the scan
      resumes at the gap. No mergeable run → empty plan even if the
      fan-out target is not met (best effort — folding a giant
      segment into a merge of minnows is the write-amplification
      Lucene's policy exists to avoid; the giant merges when its own
      tier fills up).

    Returns window ids (without the ``window=`` prefix) for
    ``compact_windows(window_ids=...)``; pure planning — no I/O beyond
    stats reads."""
    excluded = _compacted_sources(index_root)
    live = sorted(
        (int(s.get("shard_n_docs", s["n_docs"])), os.path.basename(d))
        for d in _window_dirs(index_root)
        if os.path.basename(d) not in excluded and (s := _window_stats(d)) is not None
    )
    if len(live) <= max_windows:
        return []
    start = 0
    while start < len(live) - 1:
        pick = [live[start]]
        biggest = live[start][0]
        for n, name in live[start + 1:]:
            if n > tier_factor * max(biggest, 1):
                break  # tier gap — never merge across it
            pick.append((n, name))
            biggest = n  # live is sorted ascending
        if len(pick) >= 2:
            return [name.removeprefix("window=") for _, name in pick]
        start += 1  # lone window below a gap: skip it, scan the next tier
    return []


def compact_windows(
    index_root: str,
    window_ids: list[str] | None = None,
    out_window_id: str | None = None,
    cfg: EngineConfig | None = None,
    delete_sources: bool = True,
) -> str:
    """Merge N committed window sub-indexes into ONE (Lucene-style
    segment compaction): long-running windowed deployments accumulate
    per-window fan-out cost at query time; compaction folds old
    windows back into a single sub-index with rank-identical results.

    Pipeline (all staged + resumable, no in-place mutation):
    1. decode every source window's postings back into SPIMI fragments
       (+ df sidecars) in the new ``window=<out_id>`` staging dirs —
       content is NOT re-tokenized (it was never stored);
    2. concatenate the source docs registries into the new docs dir;
    3. run the ordinary ``build_index`` merge shuffle over the staged
       fragments (docs manifest pre-committed, same trick as the
       sharded split) — dedup semantics recompute to the identical
       winner set (keep-first = global min doc_id);
    4. crash-safe cutover: a ``_COMPACTED_FROM`` marker in the new dir
       (written BEFORE the build; effective only once the build
       commits) makes ``query_windows`` exclude the sources even if
       deletion hasn't happened yet — at no point can a query double-
       count; source dirs are deleted last, then global stats
       redistribute over the remaining windows.

    Returns the new window dir."""
    import hashlib

    from ..state.fsio import (
        glob_parquet,
        makedirs as fs_makedirs,
        read_bytes,
        rmtree as fs_rmtree,
    )
    from ..state.manifest import atomic_write_bytes, committed_parts, write_manifest

    cfg = cfg or EngineConfig()
    committed = [(d, s) for d in _window_dirs(index_root)
                 if (s := _window_stats(d)) is not None]
    excluded = _compacted_sources(index_root)
    committed = [(d, s) for d, s in committed if os.path.basename(d) not in excluded]
    if window_ids is not None:
        want = {f"window={w}" for w in window_ids}
        sources = [(d, s) for d, s in committed if os.path.basename(d) in want]
        if len(sources) != len(want):
            have = {os.path.basename(d) for d, _ in sources}
            raise FileNotFoundError(f"compact_windows: missing committed windows: {sorted(want - have)}")
    else:
        sources = committed
    if not sources:
        raise FileNotFoundError(f"compact_windows: no committed windows under {index_root}")
    src_names = sorted(os.path.basename(d) for d, _ in sources)
    # tombstones (delete_docs) are applied PHYSICALLY here: their
    # identity is part of the staging fingerprint, so deleting more
    # docs and re-compacting never reuses stale pre-delete staging
    dead = _tombstone_ids(index_root)
    tdig = hashlib.sha256(dead.tobytes()).hexdigest()[:10] if dead.size else "none"
    if out_window_id is None:
        out_window_id = (
            "compact-"
            + hashlib.sha256(("|".join(src_names) + "#" + tdig).encode()).hexdigest()[:10]
        )
    out_dir = os.path.join(index_root, f"window={out_window_id}")
    if os.path.basename(out_dir) in src_names:
        raise ValueError(f"compact_windows: output window id collides with a source: {out_window_id}")

    fingerprint = f"compact:{out_window_id}:{','.join(src_names)}:tomb={tdig}"
    inner_fp = f"{fingerprint}:{cfg.config_hash()}"
    man_dir = os.path.join(out_dir, "manifest")
    if "docs" not in committed_parts(man_dir, inner_fp):
        # fresh staging for THIS source-set identity
        fs_rmtree(out_dir)
        frag_dir = os.path.join(out_dir, "fragments")
        dfstats_dir = os.path.join(out_dir, "fragments-dfstats")
        docs_dir = os.path.join(out_dir, "docs")
        for p in (frag_dir, dfstats_dir, docs_dir):
            fs_makedirs(p)
        # marker = TRANSITIVE supersession closure: direct sources plus
        # whatever they themselves superseded — so exclusion survives
        # the deletion of an intermediate compacted window whose own
        # marker was the only thing excluding still-on-disk leftovers
        closure = set(src_names)
        for d, _ in sources:
            prior = read_bytes(os.path.join(d, "_COMPACTED_FROM"))
            if prior:
                closure.update(json.loads(prior))
        atomic_write_bytes(os.path.join(out_dir, "_COMPACTED_FROM"),
                           json.dumps(sorted(closure)).encode())
        # 2. union docs registries (narrow metadata, one pass),
        # dropping tombstoned docs — the rebuild's stats (n_docs,
        # avgdl, df) then exclude them exactly
        dead_ref = ray.put(dead) if dead.size else None
        docs_files = [f for d, _ in sources for f in glob_parquet(os.path.join(d, "docs"))]
        _drop_tombstoned(ray.data.read_parquet(docs_files), dead).write_parquet(docs_dir)
        # 1. decode postings → fragments (+ sidecars). Note: df
        # sidecars keep PRE-delete pdf/ndocs — the exact candidate-df
        # pass corrects over-estimates, and a (rare, delete-heavy)
        # missed hot term only inflates one merge group, never results
        items = []
        for d, s in sources:
            wdocs = s.get("shard_n_docs", s["n_docs"])
            for f in glob_parquet(os.path.join(d, "parts")):
                items.append({"file": f, "wdir": d, "wdocs": int(wdocs)})
        if items:
            ray.data.from_items(items).map_batches(
                _PostingsDecoder,
                fn_constructor_args=(frag_dir, dfstats_dir, dead_ref),
                batch_format="pyarrow",
                batch_size=4,
                concurrency=4,
            ).sum("n_terms")
        write_manifest(man_dir, "docs", {
            "part_id": "docs", "stage": "compact-stage", "status": "committed",
            "fingerprint": inner_fp, "config_hash": cfg.config_hash(),
            "sources": src_names,
        })
    # 3. ordinary build over the staged fragments
    placeholder = ray.data.from_arrow(pa.schema([("doc_id", pa.uint64())]).empty_table())
    build_index(placeholder, out_dir, cfg, fingerprint=fingerprint)
    # 4. cutover: sources are already query-excluded by the marker now
    # that the build committed; delete them, then refresh global stats
    if delete_sources:
        for d, _ in sources:
            fs_rmtree(d)
        # also reclaim windows superseded by ANY committed compaction
        # (e.g. kept on disk by an earlier delete_sources=False run) —
        # they are already query-excluded, on disk purely as leftovers
        superseded = _compacted_sources(index_root)
        for d in _window_dirs(index_root):
            if os.path.basename(d) in superseded:
                fs_rmtree(d)
    # a FULL compaction (every live window was a source) has applied
    # every tombstone physically — clear them. Partial compactions keep
    # the tombstones: untouched windows may still hold the doc_ids, and
    # a tombstone for an already-removed doc is a harmless no-op.
    if dead.size and len(sources) == len(committed):
        fs_rmtree(os.path.join(index_root, "tombstones"))
    live = _compacted_sources(index_root)
    remaining = [
        d for d in _window_dirs(index_root)
        if _window_stats(d) is not None and os.path.basename(d) not in live
    ]
    distribute_global_stats(remaining)
    return out_dir


def _compacted_sources(index_root: str) -> set[str]:
    """Window basenames superseded by a COMMITTED compacted window
    (its _COMPACTED_FROM marker only takes effect once its own
    corpus_stats exists — a half-built compaction excludes nothing)."""
    from ..state.fsio import read_bytes

    excluded: set[str] = set()
    for d in _window_dirs(index_root):
        if _window_stats(d) is None:
            continue
        data = read_bytes(os.path.join(d, "_COMPACTED_FROM"))
        if data:
            excluded.update(json.loads(data))
    return excluded


def query_windows(
    queries: "ray.data.Dataset",
    index_root: str,
    cfg: EngineConfig | None = None,
    mode: str = "taat",
    concurrency_per_window: int = 1,
    doc_filter: tuple[str, tuple] | None = None,
    exclude_terms: tuple[str, ...] | None = None,
    include_doc_ids=None,
    min_should_match: int | None = None,
    synonyms: dict[str, tuple[str, ...]] | None = None,
    boosts: dict[str, float] | None = None,
) -> "ray.data.Dataset":
    """Fan queries over all window sub-indexes; exact top-k merge
    (same shape as sharded.query_sharded). Docs tombstoned via
    ``delete_docs`` are excluded from every result (each scorer actor
    reads the small tombstones dir once; scores of surviving docs keep
    the pre-delete corpus statistics until compaction).

    ``doc_filter`` / ``exclude_terms`` / ``include_doc_ids`` carry the
    single-index semantics window-locally, exactly as
    ``sharded.query_sharded`` does shard-locally: cross-window dedup
    makes windows disjoint and each doc's postings live wholly in its
    window, so the union of window-local sets is the global set; the
    same disjointness makes ``min_should_match`` / ``synonyms`` /
    ``boosts`` window-locally exact (see query_sharded)."""
    from ..state.fsio import glob_parquet

    cfg = cfg or EngineConfig()
    tomb_dir = os.path.join(index_root, "tombstones")
    tomb: str | None = tomb_dir if glob_parquet(tomb_dir) else None
    excluded = _compacted_sources(index_root)
    dirs = []
    for d in _window_dirs(index_root):
        # skip empty windows (fully-deduplicated appends),
        # partially-built dirs (no committed corpus_stats yet), and
        # windows superseded by a committed compaction (their docs live
        # in the compacted window now — serving both would double-count)
        if os.path.basename(d) in excluded:
            continue
        s = _window_stats(d)
        if s is not None and s.get("shard_n_docs", s["n_docs"]) > 0:
            dirs.append(d)
    if not dirs:
        raise FileNotFoundError(f"no non-empty window=* sub-indexes under {index_root}")
    results = [
        queries.map_batches(
            BM25Scorer,
            fn_constructor_args=(d, cfg, mode, True),  # emit_k: carry k to the merge
            fn_constructor_kwargs={
                "exclude_doc_ids": tomb,
                "doc_filter": doc_filter,
                "exclude_terms": exclude_terms,
                "include_doc_ids": include_doc_ids,
                "min_should_match": min_should_match,
                "synonyms": synonyms,
                "boosts": boosts,
            },
            batch_format="pyarrow",
            batch_size=cfg.query_batch_size,
            concurrency=concurrency_per_window,
            num_cpus=1,
        )
        for d in dirs
    ]
    union = results[0].union(*results[1:]) if len(results) > 1 else results[0]
    return union.groupby("query_id").map_groups(merge_topk, batch_format="pyarrow")
