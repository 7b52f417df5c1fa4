"""Document-sharded query serving — the multi-node scale architecture.

At 10^12 files no single actor holds the whole index (SURVEY.md §2.6
T1). The scale-out layout partitions DOCUMENTS (not terms) into S
shards — each shard is a complete sub-index over its doc subset, so a
shard scorer produces complete, final BM25 scores for its docs (idf /
avgdl use the GLOBAL corpus stats, injected at shard-build time via a
shared stats override) and a per-shard top-k. The merge is then an
exact global top-k over S·k candidates per query:

    queries ─▶ every shard's actor pool ─▶ per-shard top-k
            ─▶ groupby(query_id) ─▶ merge_topk (score desc, doc_id asc)

This is rank-identical to the single-index engine because BM25 scores
depend only on (term stats, doc stats) — both global — and every doc
is scored by exactly one shard. tests/test_sharded.py proves it.

Sharding key: hash doc_id % S — even at Zipfian term skew, documents
spread uniformly, so shard sizes are balanced by construction.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..build import build_index
from ..config import EngineConfig
from ..ids import doc_id_from_key
from ..scorer import RESULTS_SCHEMA, BM25Scorer
from ..state.manifest import atomic_write_bytes


def build_sharded_index(
    corpus: "ray.data.Dataset",
    index_dir: str,
    n_shards: int,
    cfg: EngineConfig | None = None,
    fingerprint: str = "",
) -> list[str]:
    """Build S doc-partitioned sub-indexes. Global corpus stats
    (n_docs, avgdl) are computed over the union and written into every
    shard so per-shard scoring uses global BM25 statistics."""
    cfg = cfg or EngineConfig()

    def batch_ids(batch: pa.Table) -> np.ndarray:
        if cfg.doc_id_mode == "column":
            return batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return doc_id_from_key(
            batch["repo"].to_pylist(), batch["path"].to_pylist(), batch["commit"].to_pylist()
        )

    # ---- GLOBAL exact dedup BEFORE the shard split: duplicates with
    # different doc_ids land in different shards, so per-shard dedup
    # cannot see them. Distributed keep-first over the narrow
    # (sha, doc_id) projection — content never shuffles; the loser set
    # then either broadcasts (small) or anti-joins (above
    # cfg.broadcast_limit; docinsight_ray.joins).
    losers = np.empty(0, dtype=np.uint64)
    if cfg.dedup:
        from ray.data.aggregate import Min as _Min
        import pyarrow.compute as pc

        from ..ids import sha256_hex
        from ..joins import anti_join

        def sha_ids(batch: pa.Table) -> pa.Table:
            ids = batch_ids(batch)
            # skey: sign-bit-flipped int64 view of the uint64 doc_id —
            # Ray 2.49's Min overflows on full-range uint64 (SIGSEGVs
            # the hash-shuffle aggregator); int64 order after XOR 2^63
            # equals uint64 order, so min(skey) is min(doc_id)
            skey = (ids ^ np.uint64(1 << 63)).view(np.int64)
            return pa.table(
                {
                    "content_sha256": pa.array(sha256_hex(batch["content"].to_pylist())),
                    "doc_id": pa.array(ids, type=pa.uint64()),
                    "skey": pa.array(skey, type=pa.int64()),
                }
            )

        narrow = corpus.map_batches(sha_ids, batch_format="pyarrow", zero_copy_batch=True).materialize()
        winners = narrow.select_columns(["content_sha256", "skey"]).groupby(
            "content_sha256"
        ).aggregate(_Min("skey", alias_name="winner_skey")).repartition(cfg.num_buckets)
        # ^ Ray 2.49: joins break on empty right-side blocks (joins.py)
        losers_ds = narrow.join(
            winners, join_type="inner", num_partitions=cfg.num_buckets, on=("content_sha256",)
        ).map_batches(
            lambda t: t.select(["doc_id"]).filter(pc.not_equal(t["skey"], t["winner_skey"])),
            batch_format="pyarrow",
        ).materialize()
        n_losers = losers_ds.count()
        if n_losers == 0:
            pass
        elif n_losers <= cfg.broadcast_limit:
            losers = np.sort(losers_ds.to_pandas()["doc_id"].to_numpy().astype(np.uint64))
        else:
            # anti-join path: annotate with the doc_id key, drop losers,
            # continue with the filtered corpus (no broadcast)
            def with_key(batch: pa.Table) -> pa.Table:
                return batch.append_column(
                    "__doc_id", pa.array(batch_ids(batch), type=pa.uint64())
                )

            keys = losers_ds.map_batches(
                lambda t: t.rename_columns(["__doc_id"]), batch_format="pyarrow"
            )
            corpus = anti_join(
                corpus.map_batches(with_key, batch_format="pyarrow", zero_copy_batch=True),
                keys, "__doc_id", cfg.num_buckets,
            ).drop_columns(["__doc_id"])
    losers_ref = ray.put(losers)
    # shards build with dedup off — global dedup already applied above
    import dataclasses

    shard_cfg = cfg if not cfg.dedup else dataclasses.replace(cfg, dedup=False)

    def add_shard(batch: pa.Table, _l=losers_ref) -> pa.Table:
        ids = batch_ids(batch)
        lo = ray.get(_l)
        if lo.size:
            keep = ~np.isin(ids, lo)
            batch = batch.filter(pa.array(keep))
            ids = ids[keep]
        return batch.append_column(
            "shard", pa.array((ids % np.uint64(n_shards)).astype(np.int32), type=pa.int32())
        )

    # ---- ONE pass over the corpus: hive-partitioned write by shard.
    # (The round-1 layout filtered the full annotated corpus once per
    # shard — S sequential re-reads. This is the materialized
    # repartition every partitioned build does at scale: each shard
    # then builds from its own partition directory only.)
    from ..state.fsio import (
        exists as fs_exists,
        glob_parquet,
        makedirs as fs_makedirs,
        read_bytes,
        rmtree as fs_rmtree,
    )
    from ..state.manifest import atomic_write_bytes as _awb

    sharded = corpus.map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True)
    split_dir = os.path.join(index_dir, "shard_input")
    split_done = os.path.join(split_dir, "_SPLIT_DONE")
    split_tag = f"{fingerprint}:{n_shards}:{shard_cfg.config_hash()}"
    prev = read_bytes(split_done)
    if prev is None or prev.decode() != split_tag:
        fs_rmtree(split_dir)
        fs_makedirs(split_dir)
        sharded.write_parquet(split_dir, partition_cols=["shard"])
        _awb(split_done, split_tag.encode())

    shard_dirs = []
    empty_corpus = None
    for s in range(n_shards):
        part = os.path.join(split_dir, f"shard={s}")
        if fs_exists(part):
            sub = ray.data.read_parquet(part)
        else:  # hash-empty shard: commit an empty-but-valid sub-index
            if empty_corpus is None:
                split_files = glob_parquet(split_dir)
                if split_files:
                    import pyarrow.parquet as _pq

                    empty_corpus = _pq.read_table(split_files[0]).schema.empty_table()
                else:
                    # empty or fully-deduplicated corpus: the split wrote
                    # no files at all — derive the schema from the input
                    # Dataset so every shard still commits an
                    # empty-but-valid sub-index (build_index's own
                    # empty-corpus path)
                    schema = corpus.schema()
                    empty_corpus = getattr(schema, "base_schema", schema).empty_table()
            sub = ray.data.from_arrow(empty_corpus)
        d = os.path.join(index_dir, f"shard={s}")
        build_index(sub, d, shard_cfg, fingerprint=f"{fingerprint}:shard{s}/{n_shards}")
        shard_dirs.append(d)

    # the split copy has served its purpose once every shard committed
    fs_rmtree(split_dir)

    distribute_global_stats(shard_dirs)
    return shard_dirs


def query_sharded(
    queries: "ray.data.Dataset",
    index_dir: str,
    n_shards: int,
    cfg: EngineConfig | None = None,
    mode: str = "taat",
    concurrency_per_shard: int = 1,
) -> "ray.data.Dataset":
    """Fan every query out to all shard scorers, then exact-merge the
    per-shard top-k candidates per query. Hash-empty shards (possible
    when n_shards approaches the doc count) are skipped — their
    empty-but-valid sub-indexes have no postings to serve."""
    from ..state.fsio import read_bytes

    cfg = cfg or EngineConfig()
    shard_results = []
    for s in range(n_shards):
        d = os.path.join(index_dir, f"shard={s}")
        raw = read_bytes(os.path.join(d, "corpus_stats.json"))
        if raw is None:
            raise FileNotFoundError(
                f"{d}/corpus_stats.json: not a built sharded index "
                f"(expected {n_shards} shard=* sub-indexes under {index_dir})"
            )
        st = json.loads(raw)
        if st.get("shard_n_docs", st["n_docs"]) == 0:
            continue
        shard_results.append(
            queries.map_batches(
                BM25Scorer,
                fn_constructor_args=(d, cfg, mode, True),  # emit_k: carry k to the merge
                batch_format="pyarrow",
                batch_size=cfg.query_batch_size,
                concurrency=concurrency_per_shard,
                num_cpus=1,
            )
        )
    if not shard_results:
        raise FileNotFoundError(f"no non-empty shard=* sub-indexes under {index_dir}")
    union = shard_results[0].union(*shard_results[1:]) if len(shard_results) > 1 else shard_results[0]
    return union.groupby("query_id").map_groups(merge_topk, batch_format="pyarrow")


def merge_topk(g: pa.Table) -> pa.Table:
    """Exact global top-k over one query's per-sub-index candidates.

    The requested k travels WITH each result row (scorer ``emit_k``):
    inferring it as max(rank)+1 truncates the merge when every
    sub-index returned fewer than k rows but their union has more."""
    docs = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
    scores = g["score"].to_numpy(zero_copy_only=False)
    k = int(g["k"][0].as_py())
    order = np.lexsort((docs, -scores))[:k]
    return pa.table(
        {
            "query_id": pa.array(np.repeat(g["query_id"][0].as_py(), order.size), type=pa.int64()),
            "rank": pa.array(np.arange(order.size, dtype=np.uint32), type=pa.uint32()),
            "doc_id": pa.array(docs[order], type=pa.uint64()),
            "score": pa.array(scores[order], type=pa.float64()),
        }
    )


def distribute_global_stats(sub_dirs: list[str], appended: str | None = None) -> None:
    """Make a set of sub-indexes (doc shards or time windows) score with
    corpus-WIDE statistics: overwrite each sub-index's n_docs/total_len/
    avgdl with the global values (preserving build_avgdl for block-max
    validity checks) and drop an aggregated global_df.parquet into each
    (the distributed-term-stats broadcast every partitioned engine does).

    The global df aggregation is a Ray Dataset ``groupby(term).sum(df)``
    over narrow (term, df) columns — the term dictionary is never
    materialized in a driver-side Python dict. The aggregated
    dictionary is written ONCE, then file-copied into each sub-index
    (ship-the-small-dictionary broadcast; posting payloads never move).

    ``appended``: the just-added sub-index for the INCREMENTAL path —
    when a prior sub-index holds a global_df snapshot whose recorded
    coverage equals exactly the other sub-dirs, the new global df is
    (prior snapshot + new sub-index's parts), so append cost stays
    O(dictionary + new window) instead of re-reading every window's
    postings. Any coverage mismatch (e.g. a crash between build and
    distribute) falls back to the full re-aggregation."""
    import shutil
    import tempfile

    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    from ..state.fsio import exists as fs_exists, glob_parquet, makedirs, read_bytes, remove_path

    # COMMITTED sub-indexes only: a half-built dir (no corpus_stats —
    # it is the last thing a build writes) contributes neither stats
    # nor postings, instead of raising an opaque TypeError
    loaded = []
    for d in sub_dirs:
        data = read_bytes(os.path.join(d, "corpus_stats.json"))
        if data is not None:
            loaded.append((d, json.loads(data)))
    sub_dirs = [d for d, _ in loaded]
    stats = [s for _, s in loaded]
    if not sub_dirs:
        return
    # capture the snapshot coverage BEFORE the stats rewrites below
    pre_covers = {d: s.get("global_df_covers") for d, s in zip(sub_dirs, stats)}
    g_docs = sum(s.get("shard_n_docs", s["n_docs"]) for s in stats)
    g_len = sum(s.get("shard_total_len", s["total_len"]) for s in stats)
    covers = sorted(os.path.basename(d.rstrip("/")) for d in sub_dirs)
    # First stats pass WITHOUT the coverage marker: if this distribute
    # crashes anywhere before the snapshot copies complete, the next
    # run sees no/stale-mismatched covers and falls back to the full
    # re-aggregation — the marker is only committed at the very end.
    for d, s in zip(sub_dirs, stats):
        s.pop("global_df_covers", None)
        s.update({
            "shard_n_docs": s.get("shard_n_docs", s["n_docs"]),
            "shard_total_len": s.get("shard_total_len", s["total_len"]),
            "n_docs": g_docs, "total_len": g_len,
            "avgdl": g_len / g_docs if g_docs else 1.0,
        })
        atomic_write_bytes(os.path.join(d, "corpus_stats.json"),
                           json.dumps(s, sort_keys=True, indent=1).encode())

    # incremental source selection: prior snapshot + new parts, but only
    # when the snapshot's recorded coverage is exactly the prior set
    files: list[str] | None = None
    if appended is not None and appended in sub_dirs and len(sub_dirs) > 1:
        prior = [d for d in sub_dirs if d != appended]
        expect = sorted(os.path.basename(d.rstrip("/")) for d in prior)
        snap = os.path.join(prior[0], "global_df.parquet")
        if fs_exists(snap) and pre_covers.get(prior[0]) == expect:
            files = glob_parquet(snap) + glob_parquet(os.path.join(appended, "parts"))
    if files is None:
        files = [f for d in sub_dirs for f in glob_parquet(os.path.join(d, "parts"))]

    tmp = tempfile.mkdtemp(prefix="global_df-", dir="/tmp")
    if files:
        import pyarrow.compute as _pc

        (
            ray.data.read_parquet(files, columns=["term", "df"])
            .groupby("term")
            .aggregate(Sum("df", alias_name="df"))
            # store df as uint64 so the snapshot merges cleanly with
            # posting rows (also uint64) on the next incremental append
            .map_batches(
                lambda t: pa.table(
                    {"term": t["term"], "df": _pc.cast(t["df"], pa.uint64())}
                ),
                batch_format="pyarrow",
            )
            .write_parquet(tmp)
        )
    else:  # every sub-index empty (e.g. fully-deduplicated windows)
        pq.write_table(
            pa.table({"term": pa.array([], type=pa.string()),
                      "df": pa.array([], type=pa.uint64())}),
            os.path.join(tmp, "empty.parquet"),
        )
    # ship the small aggregated dictionary into each sub-index
    # (file-level copy; works for plain paths and pyarrow.fs URIs)
    for d in sub_dirs:
        dst = os.path.join(d, "global_df.parquet")
        remove_path(dst)
        makedirs(dst)
        for fn in sorted(os.listdir(tmp)):
            with open(os.path.join(tmp, fn), "rb") as f:
                atomic_write_bytes(os.path.join(dst, fn), f.read())
    shutil.rmtree(tmp)
    # every snapshot copy succeeded — NOW commit the coverage marker
    # the next incremental append trusts
    for d, s in zip(sub_dirs, stats):
        s["global_df_covers"] = covers
        atomic_write_bytes(os.path.join(d, "corpus_stats.json"),
                           json.dumps(s, sort_keys=True, indent=1).encode())
