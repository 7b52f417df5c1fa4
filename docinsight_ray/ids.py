"""Deterministic identifiers and hashing.

- ``content_sha256``: hex SHA-256 of the raw ``content`` bytes — the
  per-row invariant against the source table (the reference's
  ``get_content_hash``, /root/reference/db/db_manager.py:215-217, minus
  its pre-normalization: we hash content verbatim so the invariant is
  checkable against the unmodified source column).
- ``doc_id``: first 8 bytes of sha256(repo||'\\x00'||path||'\\x00'||commit)
  as uint64 — deterministic under any parallelism / ordering, so
  ``preserve_order`` can stay off (SURVEY.md §2.9).
- ``term_bucket``: stable term-hash partition via polars' Arrow-native
  string hash (fixed seed — deterministic across processes, runs over
  Arrow buffers with no Python-string materialization).
"""

from __future__ import annotations

import hashlib

import numpy as np
import polars as pl
import pyarrow as pa


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


_TERM_HASH_SEED = 0  # fixed: build-time gkeys and query-time lookups must agree


def term_hash(terms) -> np.ndarray:
    """Stable uint64 hash of a term string array (vectorized, Arrow-native).

    Accepts a pyarrow ``Array``/``ChunkedArray`` (hashed with zero
    Python-string materialization — polars' string hash runs over the
    Arrow buffers in native code) or any numpy/list of str. The hash is
    deterministic for a fixed seed across processes within one
    environment, which is the scope the index needs: builders and
    scorers inside one deployment must agree on bucket routing, and the
    index fingerprint pins the environment.

    The previous implementation (``pd.util.hash_array`` over an object
    array built by ``to_pylist()``) allocated one Python string per
    token in the SPIMI hot path; under 32-way concurrency the allocator
    contention inflated per-task time ~2.6x. This path allocates none.
    """
    if not isinstance(terms, (pa.Array, pa.ChunkedArray)):
        terms = pa.array(np.asarray(terms, dtype=object), type=pa.string())
    return pl.from_arrow(terms).hash(seed=_TERM_HASH_SEED).to_numpy()


def term_bucket(terms, num_buckets: int) -> np.ndarray:
    return (term_hash(terms) % np.uint64(num_buckets)).astype(np.uint32)
