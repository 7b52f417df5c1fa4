"""Reindex + alias cutover: rebuild under a new config, verify the
content digest, swap serving atomically (reference ``reindex``,
docinsight_cli.py:87-106, as a zero-downtime lifecycle)."""

import json
import os

import numpy as np
import pytest

from docinsight_ray.config import EngineConfig
from docinsight_ray.fixtures import gen_corpus, gen_queries, queries_table
from docinsight_ray.pipelines.reindex import (
    get_alias,
    registry_digest,
    reindex,
    resolve_alias,
    set_alias,
)

CFG = EngineConfig(num_buckets=8)


def _build(corpus, path, cfg=CFG, fp="t"):
    import ray.data

    from docinsight_ray.build import build_index

    return build_index(ray.data.from_arrow(corpus), path, cfg, fingerprint=fp)


def _topk(qds, idx, cfg=CFG):
    from docinsight_ray.scorer import query_index

    return (
        query_index(qds, idx, cfg, mode="taat")
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


def test_reindex_rebucket_serves_identically(ray_session, tmp_path):
    """Re-bucketing under reindex verifies and serves rank-identical
    results; the alias cuts over atomically."""
    import ray.data

    corpus = gen_corpus(240, seed=31)
    old = str(tmp_path / "old")
    new = str(tmp_path / "new")
    alias = str(tmp_path / "serve")
    _build(corpus, old)
    set_alias(alias, old)
    assert resolve_alias(alias) == old

    queries = gen_queries(corpus, n_keyword=6, seed=31)
    qds_t = queries_table(queries)
    before = _topk(ray.data.from_arrow(qds_t), alias)

    cfg2 = EngineConfig(num_buckets=3)  # layout change, same content
    out = reindex(
        ray.data.from_arrow(corpus), old, new, cfg2,
        fingerprint="re", alias_dir=alias,
    )
    assert out["verified"] and out["alias_swapped"]
    assert out["digest_old"] == out["digest_new"]
    assert get_alias(alias) == new

    after = _topk(ray.data.from_arrow(qds_t), alias, cfg2)
    np.testing.assert_array_equal(
        before.doc_id.to_numpy(np.uint64), after.doc_id.to_numpy(np.uint64)
    )
    np.testing.assert_array_equal(before.score.to_numpy(), after.score.to_numpy())


def test_reindex_refuses_drifted_lake(ray_session, tmp_path):
    """If the source lake drifted since the old build, the digest
    diverges: verified=False and the alias is NOT touched."""
    import pyarrow as pa
    import ray.data

    corpus = gen_corpus(150, seed=32)
    drifted = pa.concat_tables([corpus, gen_corpus(30, seed=99)])
    old = str(tmp_path / "old")
    alias = str(tmp_path / "serve")
    _build(corpus, old)
    set_alias(alias, old)

    out = reindex(
        ray.data.from_arrow(drifted), old, str(tmp_path / "new"), CFG,
        fingerprint="re", alias_dir=alias,
    )
    assert not out["verified"] and not out["alias_swapped"]
    assert out["digest_old"]["n_docs"] != out["digest_new"]["n_docs"]
    assert get_alias(alias) == old  # old index keeps serving


def test_registry_digest_is_layout_independent(ray_session, tmp_path):
    corpus = gen_corpus(120, seed=33)
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    _build(corpus, a, EngineConfig(num_buckets=8))
    _build(corpus, b, EngineConfig(num_buckets=2, tokenizer="simple"))
    assert registry_digest(a) == registry_digest(b)


def test_alias_cli_roundtrip(ray_session, tmp_path, capsys):
    from docinsight_ray.cli import main

    corpus = gen_corpus(100, seed=34)
    idx = str(tmp_path / "idx")
    alias = str(tmp_path / "al")
    _build(corpus, idx)

    assert main(["alias", alias, idx]) == 0
    assert main(["alias", alias]) == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(out) == {"alias": alias, "index_dir": idx}
    assert main(["alias", str(tmp_path / "notalias")]) == 1


def test_reindex_cli_end_to_end(ray_session, tmp_path, capsys):
    import pyarrow.parquet as pq

    from docinsight_ray.cli import main

    corpus = gen_corpus(120, seed=35)
    lake = str(tmp_path / "lake.parquet")
    pq.write_table(corpus, lake)
    old = str(tmp_path / "old")
    new = str(tmp_path / "new")
    alias = str(tmp_path / "serve")

    assert main(["build", lake, old, "--num-buckets", "4"]) == 0
    assert main(["alias", alias, old]) == 0
    rc = main(["reindex", lake, alias, new, "--alias", alias,
               "--num-buckets", "2"])
    capsys.readouterr()
    assert rc == 0
    assert get_alias(alias) == new
    # the new index is a complete, servable build
    assert os.path.exists(os.path.join(new, "corpus_stats.json"))
