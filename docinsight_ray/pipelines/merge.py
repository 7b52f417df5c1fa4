"""Merge independently built indexes into ONE standalone index.

The operational analogue of Lucene ``IndexWriter.addIndexes`` (the
capability the reference lacks entirely — FAISS/SQLite state there can
only be rebuilt from source documents,
/root/reference/index/index_manager.py:124-201): N committed index
directories — built anywhere, e.g. one per corpus shard on different
machines — fold into one standalone index that is rank-identical to
building once over the concatenated corpora.

Content is never re-tokenized (it was never stored): each source's
postings decode back into SPIMI fragments (+ df sidecars) through the
same actor-pool stage window compaction uses, the docs registries
union in one narrow pass, and the ordinary ``build_index`` merge
shuffle runs over the staged fragments. Exact dedup recomputes across
the union (keep-first = global min doc_id per content sha), so
cross-index duplicates collapse exactly as a single build would.

Partitioning assumptions (documented, same as compaction): one
source's (doc_id → doc_len) table fits a worker (8 bytes/doc — the
scorer's own memory class), and doc_ids are globally consistent —
``doc_id_mode="hash"`` (content-derived) guarantees it; ``column``
mode callers must feed disjoint id spaces.
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa
import ray
import ray.data

from ..build import BuildResult, build_index
from ..config import EngineConfig
from .incremental import _PostingsDecoder

__all__ = ["merge_indexes"]


def merge_indexes(
    sources: list[str],
    out_dir: str,
    cfg: EngineConfig | None = None,
    overwrite: bool = False,
) -> BuildResult:
    """Merge committed indexes ``sources`` into a new standalone index
    at ``out_dir``. Staged + resumable (a crash re-enters at the merge
    shuffle; a completed merge returns instantly). Raises
    FileNotFoundError for an unbuilt source and ValueError when a
    source was built under a DIFFERENT EngineConfig than ``cfg`` —
    mixing analyzer/codec configs would silently corrupt term
    statistics, so the caller must pass the build config."""
    from ..state.fsio import (
        glob_parquet,
        makedirs as fs_makedirs,
        read_bytes,
        rmtree as fs_rmtree,
    )
    from ..state.manifest import committed_parts, write_manifest

    cfg = cfg or EngineConfig()
    if len(sources) < 1:
        raise ValueError("merge_indexes: need at least one source index")
    if os.path.abspath(out_dir) in {os.path.abspath(s) for s in sources}:
        raise ValueError(
            f"merge_indexes: out_dir {out_dir!r} is one of the sources — "
            "staging would destroy it (same guard as compact_windows)"
        )
    stats = []
    for d in sources:
        raw = read_bytes(os.path.join(d, "corpus_stats.json"))
        if raw is None:
            raise FileNotFoundError(f"{d}/corpus_stats.json: not a built index")
        stats.append(json.loads(raw))
    from ..ids import check_term_hash_canary

    for d, s in zip(sources, stats):
        # cross-machine merge is the advertised use case — refuse a
        # source whose builder hashed terms differently than we will
        # when re-bucketing its decoded postings
        check_term_hash_canary(s, f"merge_indexes(source={d})")
    want_hash = cfg.config_hash()
    for d, s in zip(sources, stats):
        if s.get("config_hash") != want_hash:
            raise ValueError(
                f"merge_indexes: {d} was built with config_hash="
                f"{s.get('config_hash')!r}, merge cfg has {want_hash!r} — "
                "pass the EngineConfig the sources were built with"
            )

    ident = "|".join(
        f"{os.path.abspath(d)}#{s.get('fingerprint', '')}" for d, s in
        sorted(zip(sources, stats), key=lambda x: os.path.abspath(x[0]))
    )
    fingerprint = "merge:" + hashlib.sha256(ident.encode()).hexdigest()[:12]
    inner_fp = f"{fingerprint}:{want_hash}"
    man_dir = os.path.join(out_dir, "manifest")
    if "docs" not in committed_parts(man_dir, inner_fp):
        # fresh staging for THIS source-set identity. Before wiping:
        # out_dir may be an UNRELATED existing index (or a merge of a
        # different source set) — the sources-identity guard above only
        # protects out_dir being one of the sources. Refuse to destroy
        # anything whose recorded fingerprint isn't a prior merge of
        # these same sources unless the caller says overwrite=True.
        if not overwrite:
            from ..state.manifest import read_manifest

            prior_fp = None
            existing = read_bytes(os.path.join(out_dir, "corpus_stats.json"))
            if existing is not None:
                prior_fp = json.loads(existing).get("fingerprint")
            else:
                staged = read_manifest(man_dir, "docs")
                if staged is not None:
                    prior_fp = staged.get("fingerprint")
            if prior_fp is not None and prior_fp not in (fingerprint, inner_fp):
                raise ValueError(
                    f"merge_indexes: out_dir {out_dir!r} already holds an "
                    f"index/merge with fingerprint {prior_fp!r} that is not "
                    f"a prior merge of these sources ({fingerprint!r}) — "
                    "refusing to destroy it; pass overwrite=True to replace"
                )
        fs_rmtree(out_dir)
        frag_dir = os.path.join(out_dir, "fragments")
        dfstats_dir = os.path.join(out_dir, "fragments-dfstats")
        docs_dir = os.path.join(out_dir, "docs")
        for p in (frag_dir, dfstats_dir, docs_dir):
            fs_makedirs(p)
        # union docs registries (narrow metadata, one streaming pass)
        docs_files = [f for d in sources for f in glob_parquet(os.path.join(d, "docs"))]
        ray.data.read_parquet(docs_files).write_parquet(docs_dir)
        # decode postings → SPIMI fragments (+ df sidecars); sidecar
        # pigeonhole soundness across sources is the compaction
        # argument verbatim (one parts file per term per source)
        # shard sub-indexes carry GLOBAL n_docs after stat distribution;
        # the sidecar wants the SOURCE-local doc count (shard_n_docs) —
        # same fallback as compaction
        items = [
            {"file": f, "wdir": d, "wdocs": int(s.get("shard_n_docs", s["n_docs"]))}
            for d, s in zip(sources, stats)
            for f in glob_parquet(os.path.join(d, "parts"))
        ]
        if items:
            ray.data.from_items(items).map_batches(
                _PostingsDecoder,
                fn_constructor_args=(frag_dir, dfstats_dir, None),
                batch_format="pyarrow",
                batch_size=4,
                concurrency=4,
            ).sum("n_terms")
        write_manifest(man_dir, "docs", {
            "part_id": "docs", "stage": "merge-stage", "status": "committed",
            "fingerprint": inner_fp, "config_hash": want_hash,
            "sources": [os.path.abspath(d) for d in sources],
        })
    # ordinary build over the staged fragments (tokenization skipped:
    # the "docs" part above matches build_index's resume identity)
    placeholder = ray.data.from_arrow(pa.schema([("doc_id", pa.uint64())]).empty_table())
    return build_index(placeholder, out_dir, cfg, fingerprint=fingerprint)
