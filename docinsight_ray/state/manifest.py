"""Partition-granular checkpoint manifest.

Replaces the reference's row-granular resume trick (``chunks.embedding
IS NULL`` scans, /root/reference/embeddings/embedder.py:147-156) and its
``ingestion_runs`` lineage table (/root/reference/db/schema.sql:43-53)
with write-then-commit partition manifests: every index partition file
is written to a temp path, fsync-renamed (object stores: atomic PUT —
state/fsio.py), and only then gets a manifest JSON recording lineage
(rows in/out, bytes, wall seconds, input fingerprint, config hash).
Resume = the set of committed manifests. All paths may be plain
(local/NFS) or pyarrow.fs URIs.
"""

from __future__ import annotations

import json
import os
from typing import Any

from .fsio import listdir_names, read_bytes, write_bytes_atomic

# kept as the public name older call sites import
atomic_write_bytes = write_bytes_atomic


def write_manifest(manifest_dir: str, part: str, record: dict[str, Any]) -> None:
    write_bytes_atomic(
        os.path.join(manifest_dir, f"{part}.json"),
        json.dumps(record, sort_keys=True).encode(),
    )


def read_manifest(manifest_dir: str, part: str) -> dict[str, Any] | None:
    data = read_bytes(os.path.join(manifest_dir, f"{part}.json"))
    return None if data is None else json.loads(data)


def committed_parts(manifest_dir: str, fingerprint: str) -> set[str]:
    """Names of partitions whose manifests match the current build identity."""
    done: set[str] = set()
    for fn in listdir_names(manifest_dir):
        if not fn.endswith(".json"):
            continue
        data = read_bytes(os.path.join(manifest_dir, fn))
        if data is None:
            continue
        try:
            rec = json.loads(data)
        except json.JSONDecodeError:
            continue
        if rec.get("fingerprint") == fingerprint and rec.get("status") == "committed":
            done.add(fn[: -len(".json")])
    return done
