"""Zero-downtime reindex + alias cutover.

The reference CLI ships ``reindex`` — rebuild the search index from
the stored corpus with ``force_rebuild=True``
(/root/reference/docinsight_cli.py:87-106). The Ray-native analogue
splits that into the three pieces a production search cluster needs
(Elasticsearch ``_reindex`` + alias-swap semantics):

1. **build into a NEW directory** from the source lake under a
   possibly-different :class:`EngineConfig` (re-bucketing, tokenizer
   change, block-size tuning) — the old index keeps serving untouched;
2. **verify** the new index covers the same corpus: a distributed
   content digest over each index's docs registry (row count + XOR and
   wrap-sum of a 64-bit prefix of every ``content_sha256``). The digest
   is tokenizer- and layout-independent — it asserts *content*
   identity, the invariant that survives any config change — and costs
   one narrow two-column registry scan per side (no shuffle, no driver
   materialization: per-batch partials reduce to one row each);
3. **alias swap**: serving goes through a stable alias directory whose
   ``alias.json`` names the live index; the swap is a single atomic
   write (rename-commit on POSIX, object PUT on stores — both via
   state/fsio), so readers see either the old or the new index, never
   a mix. :class:`~docinsight_ray.scorer.BM25Scorer` resolves aliases
   transparently.

Scale: the only data moved is one streaming pass over the corpus (the
rebuild itself) plus two narrow registry scans; the digest partials
are one row per batch.
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np
import pyarrow as pa

from ..config import EngineConfig

ALIAS_FILE = "alias.json"


# --------------------------------------------------------------------------
# alias
# --------------------------------------------------------------------------


def set_alias(alias_dir: str, index_dir: str) -> str:
    """Point ``alias_dir`` at ``index_dir`` atomically. Returns the
    previous target ('' if the alias is new)."""
    from ..state import fsio

    prev = get_alias(alias_dir) or ""
    fsio.makedirs(alias_dir)
    payload = json.dumps({"index_dir": index_dir, "previous": prev}).encode()
    fsio.write_bytes_atomic(os.path.join(alias_dir, ALIAS_FILE), payload)
    return prev


def get_alias(alias_dir: str) -> str | None:
    """Current alias target, or None if ``alias_dir`` is not an alias."""
    from ..state import fsio

    raw = fsio.read_bytes(os.path.join(alias_dir, ALIAS_FILE))
    if raw is None:
        return None
    return json.loads(raw)["index_dir"]


def resolve_alias(path: str) -> str:
    """Follow ``alias.json`` if ``path`` is an alias directory (one
    level only — an alias names an index, not another alias); plain
    index directories pass through unchanged."""
    target = get_alias(path)
    return path if target is None else target


# --------------------------------------------------------------------------
# registry digest
# --------------------------------------------------------------------------


def _digest_batch(batch: pa.Table) -> pa.Table:
    # 64-bit prefix of each content sha; XOR + wrap-sum are
    # order-insensitive, so the reduce over batch partials is exact
    # regardless of block order/count.
    shas = batch["content_sha256"].to_pylist()
    v = np.array([int(s[:16], 16) for s in shas], dtype=np.uint64)
    x = np.bitwise_xor.reduce(v) if v.size else np.uint64(0)
    with np.errstate(over="ignore"):
        ssum = v.sum(dtype=np.uint64)
    return pa.table(
        {
            "n": pa.array([len(v)], type=pa.int64()),
            "sha_xor": pa.array([int(x)], type=pa.uint64()),
            "sha_sum": pa.array([int(ssum)], type=pa.uint64()),
        }
    )


def registry_digest(index_dir: str) -> dict[str, int]:
    """Content digest of an index's docs registry: one narrow
    streaming scan, one partial row per batch, driver reduces the
    partials only."""
    import ray.data

    from ..collect import collect_table

    docs_dir = os.path.join(resolve_alias(index_dir), "docs")
    ds = ray.data.read_parquet(docs_dir, columns=["content_sha256"])
    parts = collect_table(
        ds.map_batches(_digest_batch, batch_format="pyarrow"),
        empty_schema=pa.schema(
            [("n", pa.int64()), ("sha_xor", pa.uint64()), ("sha_sum", pa.uint64())]
        ),
    )
    n = int(pa.compute.sum(parts["n"]).as_py() or 0)
    xs = parts["sha_xor"].to_numpy(zero_copy_only=False).astype(np.uint64)
    ss = parts["sha_sum"].to_numpy(zero_copy_only=False).astype(np.uint64)
    x = int(np.bitwise_xor.reduce(xs)) if xs.size else 0
    with np.errstate(over="ignore"):
        s = int(ss.sum(dtype=np.uint64)) if ss.size else 0
    return {"n_docs": n, "sha_xor": x, "sha_sum": s}


# --------------------------------------------------------------------------
# reindex
# --------------------------------------------------------------------------


def reindex(
    corpus: "Any",
    old_index_dir: str,
    new_index_dir: str,
    cfg: EngineConfig | None = None,
    fingerprint: str = "reindex",
    alias_dir: str | None = None,
) -> dict[str, Any]:
    """Rebuild ``corpus`` into ``new_index_dir`` under ``cfg``, verify
    content identity against ``old_index_dir``'s registry, and (only
    on success) cut ``alias_dir`` over to the new index.

    ``corpus`` is a ``ray.data.Dataset`` over the SAME source lake the
    old index was built from — the whole point of the digest check is
    to catch the lake having drifted since the old build (new/changed
    documents), in which case the swap is refused and the old index
    keeps serving.

    Returns a summary dict; ``verified`` False means the digests
    diverged and no alias was touched.
    """
    from ..build import build_index

    cfg = cfg or EngineConfig()
    old_dir = resolve_alias(old_index_dir)
    res = build_index(corpus, new_index_dir, cfg, fingerprint=fingerprint)
    d_old = registry_digest(old_dir)
    d_new = registry_digest(new_index_dir)
    verified = d_old == d_new
    swapped = False
    if verified and alias_dir is not None:
        set_alias(alias_dir, new_index_dir)
        swapped = True
    return {
        "old_index": old_dir,
        "new_index": new_index_dir,
        "n_docs": res.n_docs,
        "digest_old": d_old,
        "digest_new": d_new,
        "verified": verified,
        "alias_swapped": swapped,
        "alias_dir": alias_dir,
    }
