"""Distributed statistics over the ``embeddings`` vector column.

Both ops reduce the data-sized input to CONSTANT-size per-batch
partials (the HLL/CMS/df-sidecar discipline — no shuffle wider than a
(d × d) matrix ever exists, regardless of corpus size):

- ``centroid_per_label``: per-class mean vector — (Σ vec, count) per
  label accumulated inside ``map_batches``, combined on the driver
  over a labels × d table (10 × 64 here). The building block of
  nearest-class-mean classifiers, IVF coarse quantizers and
  class-balance drift monitors. Full SQL oracle (positional unnest
  average).

- ``pca_eigs``: top principal components of the embedding cloud via
  the Gram-matrix combiner: per-batch partials (XᵀX, Σx, n) are d×d —
  constant — and the driver finishes with one d×d eigendecomposition.
  The classic two-pass-free distributed PCA; pytest asserts equality
  with numpy's exact eigendecomposition of the full covariance.
  Rows-only gate (iterative eigensolvers are not SQL-expressible).

Reference provenance: the reference's embedding stack is
SBERT + FAISS (model-managed, no vector analytics); these extend
SURVEY.md §2 toward embedding-column observability at 100 TB.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..collect import collect_table

PCA_TOP = 5  # eigenvalues reported


def _read(sf_dir: str, cols: list[str]) -> "ray.data.Dataset":
    return ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=cols
    )


def _centroid_partial(batch: pd.DataFrame) -> pd.DataFrame:
    X = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
    labels = batch["label"].to_numpy(dtype=np.int64)
    rows = []
    for lb in np.unique(labels):
        m = labels == lb
        s = X[m].sum(axis=0)
        rows.append((int(lb), int(m.sum()), s.tobytes()))
    return pd.DataFrame(rows, columns=["label", "n", "vsum"])


def q_centroid_per_label(sf_dir: str) -> pa.Table:
    """Per-label mean embedding, long format (label, dim, centroid) —
    see module docstring. Values rounded to 9 decimals so the float64
    sum's ulp-level order dependence cannot leak into the gate hash
    (the knn cosine rounding convention)."""
    empty = pa.schema([("label", pa.int64()), ("n", pa.int64()), ("vsum", pa.binary())])
    parts = collect_table(
        _read(sf_dir, ["embedding", "label"]).map_batches(
            _centroid_partial, batch_format="pandas", batch_size=1024
        ),
        empty,
    ).to_pandas()
    sums: dict[int, np.ndarray] = {}
    counts: dict[int, int] = {}
    for lb, n, blob in zip(parts["label"], parts["n"], parts["vsum"]):
        v = np.frombuffer(blob, dtype=np.float64)
        lb = int(lb)
        sums[lb] = sums.get(lb, 0) + v
        counts[lb] = counts.get(lb, 0) + int(n)
    labels = sorted(sums)
    d = sums[labels[0]].size
    out_l, out_d, out_c = [], [], []
    for lb in labels:
        c = sums[lb] / counts[lb]
        out_l.extend([lb] * d)
        out_d.extend(range(d))
        out_c.extend(np.round(c, 9).tolist())
    return pa.table(
        {
            "label": pa.array(out_l, type=pa.int64()),
            "dim": pa.array(out_d, type=pa.int64()),
            "centroid": pa.array(out_c, type=pa.float64()),
        }
    )


def _gram_partial(batch: pd.DataFrame) -> pd.DataFrame:
    X = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
    g = X.T @ X
    s = X.sum(axis=0)
    return pd.DataFrame(
        {
            "n": np.array([X.shape[0]], dtype=np.int64),
            "gram": [g.tobytes()],
            "vsum": [s.tobytes()],
            "d": np.array([X.shape[1]], dtype=np.int64),
        }
    )


def pca_covariance(sf_dir: str) -> tuple[np.ndarray, int]:
    """Exact covariance of the embedding cloud from distributed
    constant-size partials: cov = (ΣXᵀX − n·μμᵀ)/(n−1)."""
    empty = pa.schema(
        [("n", pa.int64()), ("gram", pa.binary()), ("vsum", pa.binary()), ("d", pa.int64())]
    )
    parts = collect_table(
        _read(sf_dir, ["embedding"]).map_batches(
            _gram_partial, batch_format="pandas", batch_size=1024
        ),
        empty,
    ).to_pandas()
    d = int(parts["d"].iloc[0])
    n = int(parts["n"].sum())
    G = np.zeros((d, d))
    s = np.zeros(d)
    for blob_g, blob_s in zip(parts["gram"], parts["vsum"]):
        G += np.frombuffer(blob_g, dtype=np.float64).reshape(d, d)
        s += np.frombuffer(blob_s, dtype=np.float64)
    mu = s / n
    cov = (G - n * np.outer(mu, mu)) / (n - 1)
    return cov, n


def q_pca_eigs(sf_dir: str) -> pa.Table:
    """Top-``PCA_TOP`` principal-component eigenvalues and explained-
    variance fractions of the embedding covariance — computed from
    d×d distributed partials (see module docstring)."""
    cov, _ = pca_covariance(sf_dir)
    w = np.linalg.eigvalsh(cov)[::-1]
    total = float(w.sum())
    top = w[:PCA_TOP]
    return pa.table(
        {
            "component": pa.array(np.arange(top.size, dtype=np.int64), type=pa.int64()),
            "eigenvalue": pa.array(np.round(top, 9), type=pa.float64()),
            "explained_frac": pa.array(np.round(top / total, 9), type=pa.float64()),
        }
    )


ORACLE_SQL = {
    "centroid_per_label": """
WITH e AS (
  SELECT label, embedding::DOUBLE[] AS v FROM embeddings
),
u AS (
  SELECT label, d.i - 1 AS dim, v[d.i] AS x
  FROM e, unnest(generate_series(1, len(v))) AS d(i)
)
SELECT label::BIGINT AS label, dim::BIGINT AS dim,
       round(sum(x) / count(*), 9) AS centroid
FROM u GROUP BY label, dim
""",
}

QUERIES = {
    "centroid_per_label": q_centroid_per_label,
    "pca_eigs": q_pca_eigs,
}
