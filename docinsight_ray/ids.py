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


# Fixed probe set for the cross-environment hash canary. term_hash is
# polars' ahash, whose output can vary not just with pl.__version__ but
# with the PLATFORM / CPU-feature wheel build — config_hash pins only
# the version, so an index built on one architecture and served on
# another (shared-FS URIs, cross-machine merge_indexes) could silently
# route terms to the wrong bucket and return empty lookups. The canary
# makes that failure LOUD: builders persist term_hash over these probes
# in corpus_stats/pos_stats, and every load path re-computes and
# compares before trusting bucket routing.
_CANARY_PROBES = (
    "", "a", "term", "the", "0123456789",
    "snake_case_token", "CamelCaseToken", "naïve-ünïcode-✓",
)


def term_hash_canary() -> str:
    """Hex fingerprint of ``term_hash`` over a fixed probe set —
    equal iff two environments' term hashes agree on bucket routing."""
    h = term_hash(np.asarray(_CANARY_PROBES, dtype=object)).astype("<u8")
    return hashlib.sha256(h.tobytes()).hexdigest()[:16]


def check_term_hash_canary(stats: dict, where: str) -> None:
    """Fail loudly when ``stats`` (a corpus_stats/pos_stats dict) was
    written by an environment whose term_hash disagrees with ours.
    Stats from pre-canary builds pass (nothing recorded to compare)."""
    recorded = stats.get("term_hash_canary")
    if recorded is not None and recorded != term_hash_canary():
        raise RuntimeError(
            f"{where}: term-hash canary mismatch (index built with "
            f"{recorded!r}, this environment computes {term_hash_canary()!r}) "
            "— the builder's polars string hash differs from this "
            "platform's, so term->bucket routing would silently miss "
            "terms. Rebuild the index in this environment or serve it "
            "from a matching one."
        )
