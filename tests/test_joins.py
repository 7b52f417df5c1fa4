"""Broadcast vs anti-join key-set filters produce identical output.

The scale fallback (ADVICE/VERDICT r1): above cfg.broadcast_limit the
dedup loser / seen-sha filters switch from a ray.put broadcast to a
hash-partitioned Dataset.join anti-join. Forcing the threshold to 0
routes everything through the join path; output must be identical.
"""

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from docinsight_ray.config import EngineConfig
from docinsight_ray.fixtures import gen_corpus, gen_queries, queries_table
from docinsight_ray.oracle import OracleIndex


def test_key_set_filter_both_paths(ray_session):
    import ray.data

    from docinsight_ray.joins import key_set_filter

    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(100), type=pa.uint64()),
                  "v": [f"v{i}" for i in range(100)]})
    )
    keys = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([3, 7, 50, 99], type=pa.uint64())})
    )
    out = {}
    for limit in (1_000_000, 0):  # broadcast path, then join path
        got = key_set_filter(
            ds, keys, "doc_id", n_keys=4, broadcast_limit=limit, num_partitions=4
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        out[limit] = got
    assert len(out[0]) == 96
    assert set(out[0]["doc_id"]) == set(range(100)) - {3, 7, 50, 99}
    import pandas as pd

    pd.testing.assert_frame_equal(out[0], out[1_000_000])


def test_anti_join_duplicate_keys_and_empty(ray_session):
    """Duplicate values in the key set must not duplicate or drop
    surviving rows; an empty key set is the identity."""
    import ray.data

    from docinsight_ray.joins import anti_join, key_set_filter

    ds = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, 3, 4], type=pa.uint64()), "v": ["a", "b", "c", "d"]})
    )
    dup_keys = ray.data.from_arrow(
        pa.table({"k": pa.array([2, 2, 2, 4], type=pa.uint64())})
    )
    got = anti_join(ds, dup_keys, "k", 2).to_pandas().sort_values("k")
    assert list(got["k"]) == [1, 3] and list(got["v"]) == ["a", "c"]
    # n_keys=0 short-circuits to the input
    same = key_set_filter(
        ds, dup_keys, "k", n_keys=0, broadcast_limit=10, num_partitions=2
    ).to_pandas().sort_values("k")
    assert list(same["k"]) == [1, 2, 3, 4]


def _postings(idx):
    files = sorted(glob.glob(os.path.join(idx, "parts", "**", "*.parquet"), recursive=True))
    return pa.concat_tables([pq.read_table(f) for f in files]).sort_by("term")


def test_build_dedup_join_path_identical(ray_session, tmp_path):
    """build_index with broadcast_limit=0 (all loser filtering through
    the anti-join) produces byte-identical postings and stats to the
    broadcast path."""
    import ray.data

    from docinsight_ray.build import build_index

    corpus = gen_corpus(300, seed=31)  # fixture injects duplicate contents
    base = EngineConfig(num_buckets=8)
    joined = EngineConfig(num_buckets=8, broadcast_limit=0)
    ia, ib = str(tmp_path / "bcast"), str(tmp_path / "join")
    ra = build_index(ray.data.from_arrow(corpus), ia, base, fingerprint="ddj")
    rb = build_index(ray.data.from_arrow(corpus), ib, joined, fingerprint="ddj")
    assert ra.n_dup_losers > 0  # the filter actually did something
    assert rb.n_dup_losers == ra.n_dup_losers
    assert rb.n_docs == ra.n_docs and rb.total_len == ra.total_len
    a, b = _postings(ia), _postings(ib)
    assert a.num_rows == b.num_rows
    for col in ["term", "df", "doc_ids_vb", "tfs_vb"]:
        assert a[col].to_pylist() == b[col].to_pylist(), f"column {col} differs"
    assert (ra.stats["stages"]["dedup"]["path"] == "broadcast"
            and rb.stats["stages"]["dedup"]["path"] == "join")


def test_sharded_dedup_join_path_identical(ray_session, tmp_path):
    """Sharded build with the anti-join loser path stays rank-identical
    to the oracle (global dedup applied)."""
    import ray.data

    from docinsight_ray.pipelines.sharded import build_sharded_index, query_sharded

    cfg = EngineConfig(num_buckets=8, dedup=True, broadcast_limit=0)
    corpus = gen_corpus(200, seed=41)
    idx = str(tmp_path / "shj")
    build_sharded_index(ray.data.from_arrow(corpus), idx, 2, cfg, fingerprint="shj")
    oracle = OracleIndex(corpus, cfg)
    queries = gen_queries(corpus, n_keyword=6, seed=41)
    qds = ray.data.from_arrow(queries_table(queries))
    out = query_sharded(qds, idx, 2, cfg, mode="taat").to_pandas()
    for qid, text, k in queries:
        od, osc = oracle.score(text, k)
        sub = out[out.query_id == qid].sort_values("rank")
        np.testing.assert_array_equal(sub.doc_id.to_numpy(dtype=np.uint64), od)
        np.testing.assert_array_equal(sub.score.to_numpy(), osc)


def test_bloom_key_set_filter_identity(ray_session):
    """bloom_key_set_filter == anti_join as a row set (exactness: the
    Bloom has no false negatives, the maybe-branch is join-verified),
    and the Bloom routes the vast majority of new rows around the
    shuffle (maybe-fraction ≈ dupes + FPR)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from docinsight_ray.joins import (
        anti_join,
        bloom_key_set_filter,
        bloom_might_contain,
        build_bloom,
    )

    rng = np.random.default_rng(11)
    seen = [f"sha-{i:06d}" for i in range(5000)]
    # left: 1000 true dupes + 9000 new keys
    left_keys = seen[:1000] + [f"new-{i:06d}" for i in range(9000)]
    rng.shuffle(left_keys)
    left_tbl = pa.table(
        {
            "content_sha256": pa.array(left_keys, type=pa.string()),
            "payload": pa.array(np.arange(len(left_keys), dtype=np.int64)),
        }
    )
    keys_ds = ray.data.from_arrow(
        pa.table({"content_sha256": pa.array(seen, type=pa.string())})
    )

    got = (
        bloom_key_set_filter(
            lambda: ray.data.from_arrow(left_tbl),
            keys_ds,
            "content_sha256",
            n_keys=len(seen),
            num_partitions=4,
        )
        .to_pandas()
        .sort_values("payload")
        .reset_index(drop=True)
    )
    want = (
        anti_join(ray.data.from_arrow(left_tbl), keys_ds, "content_sha256", 4)
        .to_pandas()
        .sort_values("payload")
        .reset_index(drop=True)
    )
    assert got.equals(want)
    assert len(got) == 9000  # every dupe dropped, every new row kept

    # no false negatives + bounded false-positive rate on fresh keys
    bm_bytes, m, k = build_bloom(keys_ds, "content_sha256", len(seen))
    bm = np.frombuffer(bm_bytes, dtype=np.uint8)
    members = pa.array(seen, type=pa.string())
    assert bloom_might_contain(members, bm, m, k).all()
    fresh = pa.array([f"probe-{i}" for i in range(20000)], type=pa.string())
    fpr = float(bloom_might_contain(fresh, bm, m, k).mean())
    assert fpr < 0.05, fpr


def test_bloom_key_set_filter_int_keys(ray_session):
    """Same exactness for fixed-width (uint64 doc_id) keys, including
    full-range values (sign bit set)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from docinsight_ray.joins import anti_join, bloom_key_set_filter

    rng = np.random.default_rng(5)
    seen = rng.integers(0, 2**63, size=2000, dtype=np.uint64) | np.uint64(1) << np.uint64(63)
    new = rng.integers(0, 2**62, size=6000, dtype=np.uint64)
    left = np.concatenate([seen[:500], new])
    rng.shuffle(left)
    left_tbl = pa.table({"doc_id": pa.array(left, type=pa.uint64())})
    keys_ds = ray.data.from_arrow(pa.table({"doc_id": pa.array(seen, type=pa.uint64())}))
    got = (
        bloom_key_set_filter(
            lambda: ray.data.from_arrow(left_tbl), keys_ds, "doc_id",
            n_keys=len(seen), num_partitions=4,
        ).to_pandas()["doc_id"].sort_values().reset_index(drop=True)
    )
    want = (
        anti_join(ray.data.from_arrow(left_tbl), keys_ds, "doc_id", 4)
        .to_pandas()["doc_id"].sort_values().reset_index(drop=True)
    )
    assert got.equals(want) and len(got) == 6000
