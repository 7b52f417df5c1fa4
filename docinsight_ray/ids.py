"""Deterministic identifiers and hashing.

- ``content_sha256``: hex SHA-256 of the raw ``content`` bytes — the
  per-row invariant against the source table (the reference's
  ``get_content_hash``, /root/reference/db/db_manager.py:215-217, minus
  its pre-normalization: we hash content verbatim so the invariant is
  checkable against the unmodified source column).
- ``doc_id``: first 8 bytes of sha256(repo||'\\x00'||path||'\\x00'||commit)
  as uint64 — deterministic under any parallelism / ordering, so
  ``preserve_order`` can stay off (SURVEY.md §2.9).
- ``term_bucket``: stable term-hash partition via
  ``pandas.util.hash_array`` (SipHash with pandas' fixed default key —
  deterministic across processes, vectorized in C).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd


def sha256_hex(values: list[str] | np.ndarray) -> np.ndarray:
    return np.array(
        [hashlib.sha256(s.encode("utf-8")).hexdigest() for s in values], dtype=object
    )


def doc_id_from_key(repos, paths, commits) -> np.ndarray:
    out = np.empty(len(repos), dtype=np.uint64)
    for i, (r, p, c) in enumerate(zip(repos, paths, commits)):
        h = hashlib.sha256(f"{r}\x00{p}\x00{c}".encode("utf-8")).digest()
        out[i] = int.from_bytes(h[:8], "big")
    return out


def term_hash(terms: np.ndarray) -> np.ndarray:
    """Stable uint64 hash of a term string array (vectorized)."""
    return pd.util.hash_array(np.asarray(terms, dtype=object), categorize=True)


def term_bucket(terms: np.ndarray, num_buckets: int) -> np.ndarray:
    return (term_hash(terms) % np.uint64(num_buckets)).astype(np.uint32)
