"""Vector-statistics ops (centroids, distributed PCA) — sf0.001."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def _full_matrix():
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    return np.stack(t["embedding"].to_numpy()).astype(np.float64), t["label"].to_numpy()


def test_centroid_per_label_oracle_exact():
    import duckdb
    import pandas as pd

    from docinsight_ray.functions.vecstats import ORACLE_SQL, q_centroid_per_label

    mine = (
        q_centroid_per_label(SF)
        .to_pandas()
        .sort_values(["label", "dim"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    want = (
        con.sql(ORACLE_SQL["centroid_per_label"])
        .df()
        .sort_values(["label", "dim"])
        .reset_index(drop=True)[mine.columns]
    )
    pd.testing.assert_frame_equal(mine, want, check_dtype=False)


def test_centroid_matches_numpy():
    from docinsight_ray.functions.vecstats import q_centroid_per_label

    X, labels = _full_matrix()
    got = q_centroid_per_label(SF).to_pandas()
    for lb in np.unique(labels):
        want = X[labels == lb].mean(axis=0)
        g = got[got["label"] == lb].sort_values("dim")["centroid"].to_numpy()
        assert np.allclose(g, want, atol=1e-8)


def test_pca_matches_full_eigendecomposition():
    from docinsight_ray.functions.vecstats import PCA_TOP, pca_covariance, q_pca_eigs

    X, _ = _full_matrix()
    cov_want = np.cov(X, rowvar=False)
    cov_got, n = pca_covariance(SF)
    assert n == X.shape[0]
    assert np.allclose(cov_got, cov_want, atol=1e-9)
    w = np.linalg.eigvalsh(cov_want)[::-1][:PCA_TOP]
    got = q_pca_eigs(SF).to_pandas()
    assert np.allclose(got["eigenvalue"].to_numpy(), np.round(w, 9), atol=1e-8)
    assert (got["explained_frac"].to_numpy() >= 0).all()
    assert got["eigenvalue"].is_monotonic_decreasing
