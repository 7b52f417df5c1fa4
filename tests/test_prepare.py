"""Composed training-corpus preparation pipeline (pipelines/prepare.py)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def _oracle(name):
    from docinsight_ray.pipelines.prepare import ORACLE_SQL

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    return con.sql(ORACLE_SQL[name]).df()


@pytest.mark.parametrize("name", ["prepare_corpus", "prepare_corpus_stats"])
def test_prepare_sql_parity(name):
    from docinsight_ray.pipelines.prepare import QUERIES

    got = QUERIES[name](SF).to_pandas()
    want = _oracle(name)
    cols = sorted(got.columns)
    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols).reset_index(drop=True),
        want[cols].sort_values(cols).reset_index(drop=True),
        check_dtype=False,
    )


def test_prepare_stage_semantics():
    """Every stage fires on the fixture; stats reconcile with the kept
    table; packing is a contiguous per-split scan; kept docs respect
    the pipeline's own invariants."""
    from docinsight_ray.pipelines.prepare import (
        PREP_MIN_CHARS,
        PACK_BUDGET,
        q_prepare_corpus,
        q_prepare_corpus_stats,
    )

    kept = q_prepare_corpus(SF).to_pandas()
    stats = q_prepare_corpus_stats(SF).to_pandas().set_index("stage")["n_docs"]

    assert stats["0_input"] == 500
    # dropping stages fire on the fixture (the driver table has no
    # byte-identical duplicates, so 2_exact_dup is legitimately 0
    # there — its mechanics are covered by the exact_dedup gate)
    for s in ["1_len_filtered", "3_near_dup", "4_contaminated", "5_sampled_out"]:
        assert stats[s] > 0, f"stage {s} never fired"
    assert stats["2_exact_dup"] >= 0
    assert stats["6_kept"] == len(kept)
    assert stats["0_input"] == stats[
        ["1_len_filtered", "2_exact_dup", "3_near_dup", "4_contaminated", "5_sampled_out", "6_kept"]
    ].sum()

    # contiguous per-split packing in doc_id order
    for split, g in kept.groupby("split"):
        g = g.sort_values("doc_id")
        start = g["start_token"].to_numpy()
        n = g["n_tokens"].to_numpy()
        assert start[0] == 0
        assert (start[1:] == start[:-1] + n[:-1]).all()
        assert (g["pack_id"].to_numpy() == start // PACK_BUDGET).all()

    # no kept doc is duplicated, every kept doc is long enough
    assert kept["doc_id"].is_unique
    docs = duckdb.sql(
        f"SELECT doc_id, n_chars FROM read_parquet('{SF}/documents.parquet')"
    ).df().set_index("doc_id")
    assert (docs.loc[kept["doc_id"], "n_chars"] >= PREP_MIN_CHARS).all()


def test_exact_dedup_sparse_dups_many_blocks():
    """Regression (sf0.1 sweep, round 5): with rare duplicates spread
    over MANY input blocks, the broadcast-filtered dup-rows Dataset is
    mostly empty blocks and Ray 2.49's hash join raised ArrowInvalid
    ('No match ... key field ... left side') before the repartition
    consolidation. Pins distributed keep-first semantics on that shape."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from docinsight_ray.pipelines.prepare import _exact_dedup

    n = 400
    shas = [f"sha{i:05d}" for i in range(n)]
    shas[37] = shas[11]     # one dup pair
    shas[399] = shas[202]   # another, far apart
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "sha": pa.array(shas, type=pa.string()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(64)  # many near-empty blocks
    out = _exact_dedup(ds).to_pandas().sort_values("doc_id")
    assert len(out) == n - 2
    assert 11 in set(out["doc_id"]) and 37 not in set(out["doc_id"])
    assert 202 in set(out["doc_id"]) and 399 not in set(out["doc_id"])
