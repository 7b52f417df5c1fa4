"""NB quality classifier + DSIR importance-resampling tests (sf0.001)."""

import math

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def _docs() -> pd.DataFrame:
    import pyarrow.parquet as pq

    return pq.read_table(f"{SF}/documents.parquet").to_pandas()


def test_nb_classify_oracle_exact():
    """Bitwise equality with the DuckDB oracle (the gate contract)."""
    import duckdb

    from docinsight_ray.functions.classify import ORACLE_SQL, q_nb_classify

    mine = (
        q_nb_classify(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = (
        con.sql(ORACLE_SQL["nb_classify"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)[mine.columns]
    )
    pd.testing.assert_frame_equal(mine, want, check_dtype=False)


def test_nb_classify_separates_seed_sources():
    """The classifier must score its own positive class higher on
    average — the smoke property a quality classifier exists for."""
    from docinsight_ray.functions.classify import NB_SEED_SOURCES, q_nb_classify

    scores = q_nb_classify(SF).to_pandas()
    docs = _docs()[["doc_id", "source"]]
    m = scores.merge(docs, on="doc_id")
    pos = m[m["source"].isin(NB_SEED_SOURCES)]["logodds_micro"]
    neg = m[~m["source"].isin(NB_SEED_SOURCES)]["logodds_micro"]
    assert len(pos) > 0 and len(neg) > 0
    assert pos.mean() > neg.mean()


def test_dsir_oracle_exact():
    import duckdb

    from docinsight_ray.functions.classify import ORACLE_SQL, q_dsir_weights

    mine = (
        q_dsir_weights(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = (
        con.sql(ORACLE_SQL["dsir_weights"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)[mine.columns]
    )
    pd.testing.assert_frame_equal(mine, want, check_dtype=False)


def test_dsir_keep_set_semantics():
    """kept = exactly ceil(frac·n_scored) docs, and every kept doc's
    per-token rate is >= every dropped (token-bearing) doc's rate
    (modulo the doc_id tie-break at the boundary)."""
    from docinsight_ray.functions.classify import DSIR_KEEP_FRAC, q_dsir_weights

    t = q_dsir_weights(SF).to_pandas()
    scored = t[t["n_tokens"] > 0].copy()
    assert int(t["kept"].sum()) == math.ceil(DSIR_KEEP_FRAC * len(scored))
    assert t.loc[t["n_tokens"] == 0, "kept"].eq(0).all()
    scored["rate"] = scored["dsir_micro"] / scored["n_tokens"]
    kept_min = scored.loc[scored["kept"] == 1, "rate"].min()
    drop_max = scored.loc[scored["kept"] == 0, "rate"].max()
    assert kept_min >= drop_max or np.isclose(kept_min, drop_max)


def test_dsir_bucket_matches_sql_hash():
    """The Python sha256-prefix bucket must equal DuckDB's expression
    term-for-term — the cross-engine contract the oracle rides on."""
    import duckdb

    from docinsight_ray.functions.classify import DSIR_BUCKETS, _dsir_bucket

    terms = ["the", "data", "stream", "zz9", "a0", "hash"]
    con = duckdb.connect()
    rows = con.sql(
        "SELECT t, (('0x' || substr(sha256(t), 1, 8))::UBIGINT % "
        f"{DSIR_BUCKETS})::BIGINT FROM (SELECT unnest(?) AS t)",
        params=[terms],
    ).fetchall()
    for term, bk in rows:
        assert _dsir_bucket(term) == bk


# ---- SemDeDup ---------------------------------------------------------------


def _greedy_reference(eps: float) -> dict[int, int]:
    """Brute-force greedy keep-first dedup over ALL vectors (the
    n_clusters=1 ground truth)."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/embeddings.parquet").to_pandas().sort_values("vec_id")
    X = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    ids = t["vec_id"].to_numpy()
    kept_idx: list[int] = []
    out = {}
    for i in range(len(ids)):
        dup = bool(kept_idx) and float(np.max(Xn[kept_idx] @ Xn[i])) >= eps
        out[int(ids[i])] = 0 if dup else 1
        if not dup:
            kept_idx.append(i)
    return out


def test_semdedup_single_cluster_equals_reference():
    from docinsight_ray.functions.knn import COS_DUP_T, q_semdedup

    got = q_semdedup(SF, n_clusters=1).to_pandas()
    want = _greedy_reference(COS_DUP_T)
    assert (got["cluster"] == 0).all()
    assert {int(v): int(k) for v, k in zip(got["vec_id"], got["kept"])} == want


def test_semdedup_partition_and_determinism():
    import pyarrow.parquet as pq

    from docinsight_ray.functions.knn import q_semdedup

    a = q_semdedup(SF).to_pandas()
    b = q_semdedup(SF).to_pandas()
    assert a.values.tolist() == b.values.tolist()
    all_ids = set(pq.read_table(f"{SF}/embeddings.parquet")["vec_id"].to_pylist())
    assert set(a["vec_id"]) == all_ids and a["vec_id"].is_unique
    assert set(a["kept"].unique()) <= {0, 1}
    # every dropped vector has a kept near-dup (>= eps) SOMEWHERE —
    # weaker than in-cluster truth but cluster-assignment independent
    from docinsight_ray.functions.knn import COS_DUP_T

    t = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    X = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    pos = {int(v): i for i, v in enumerate(t["vec_id"])}
    kept_rows = [pos[int(v)] for v in a.loc[a["kept"] == 1, "vec_id"]]
    for v in a.loc[a["kept"] == 0, "vec_id"]:
        assert float(np.max(Xn[kept_rows] @ Xn[pos[int(v)]])) >= COS_DUP_T


def test_semdedup_oversize_cluster_warns_and_keeps():
    import pandas as pd

    from docinsight_ray.functions.knn import SEM_MAX_CLUSTER, _SemDedupCluster
    import pytest as _pytest

    n = SEM_MAX_CLUSTER + 1
    rng = np.random.default_rng(0)
    g = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "cluster": np.zeros(n, dtype=np.int64),
            "embedding": list(rng.normal(size=(n, 4))),
        }
    )
    with _pytest.warns(UserWarning, match="SEM_MAX_CLUSTER"):
        out = _SemDedupCluster(0.4)(g)
    assert out["kept"].eq(1).all()


def test_nb_pr_curve_oracle_and_monotonicity():
    import duckdb

    from docinsight_ray.functions.classify import ORACLE_SQL, q_nb_pr_curve

    mine = q_nb_pr_curve(SF).to_pandas().sort_values("decile").reset_index(drop=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = (
        con.sql(ORACLE_SQL["nb_pr_curve"])
        .df()
        .sort_values("decile")
        .reset_index(drop=True)[mine.columns]
    )
    pd.testing.assert_frame_equal(mine, want, check_dtype=False)
    n = int(mine.iloc[0][["tp", "fp", "fn", "tn"]].sum())
    assert (mine[["tp", "fp", "fn", "tn"]].sum(axis=1) == n).all()
    # raising the threshold can only shrink the predicted-positive set
    assert mine["thr_micro"].is_monotonic_increasing
    assert (mine["tp"].diff().dropna() <= 0).all()
    assert (mine["fp"].diff().dropna() <= 0).all()
