"""Partition-granular checkpoint manifest.

Replaces the reference's row-granular resume trick (``chunks.embedding
IS NULL`` scans, /root/reference/embeddings/embedder.py:147-156) and its
``ingestion_runs`` lineage table (/root/reference/db/schema.sql:43-53)
with write-then-commit partition manifests: every index partition file
is written to a temp path, fsync-renamed, and only then gets a manifest
JSON recording lineage (rows in/out, bytes, wall seconds, input
fingerprint, config hash). Resume = the set of committed manifests.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any


def atomic_write_bytes(path: str, data: bytes) -> None:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def write_manifest(manifest_dir: str, part: str, record: dict[str, Any]) -> None:
    atomic_write_bytes(
        os.path.join(manifest_dir, f"{part}.json"),
        json.dumps(record, sort_keys=True).encode(),
    )


def read_manifest(manifest_dir: str, part: str) -> dict[str, Any] | None:
    p = os.path.join(manifest_dir, f"{part}.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def committed_parts(manifest_dir: str, fingerprint: str) -> set[str]:
    """Names of partitions whose manifests match the current build identity."""
    done: set[str] = set()
    if not os.path.isdir(manifest_dir):
        return done
    for fn in os.listdir(manifest_dir):
        if not fn.endswith(".json"):
            continue
        try:
            with open(os.path.join(manifest_dir, fn)) as f:
                rec = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        if rec.get("fingerprint") == fingerprint and rec.get("status") == "committed":
            done.add(fn[: -len(".json")])
    return done
