"""Semi-structured JSON extraction ops (functions/semistruct.py) at sf0.001."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def _oracle(name: str) -> pd.DataFrame:
    from docinsight_ray.functions.semistruct import ORACLE_SQL

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    return con.sql(ORACLE_SQL[name]).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", ["props_extract", "props_agg"])
def test_sql_parity(name):
    from docinsight_ray.functions.semistruct import QUERIES

    got = _canon(QUERIES[name](SF).to_pandas())
    want = _canon(_oracle(name))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_extract_k_fallback_matches_polars():
    """The stdlib fallback and the polars path must agree, including on
    malformed / missing-key payloads."""
    import docinsight_ray.functions.semistruct as ss

    props = pd.Series(
        ['{"k": 87}', '{"k": 0}', "{}", '{"k": null}', "not json", '{"j": 3}']
    )
    via_polars = ss._extract_k(props) if ss._HAVE_POLARS else None
    orig = ss._HAVE_POLARS
    try:
        ss._HAVE_POLARS = False
        via_stdlib = ss._extract_k(props)
    finally:
        ss._HAVE_POLARS = orig
    expect = np.array([87, 0, -1, -1, -1, -1], dtype=np.int64)
    assert (via_stdlib == expect).all()
    if via_polars is not None:
        assert (via_polars == expect).all()


def test_props_agg_consistent_with_extract():
    from docinsight_ray.functions.semistruct import q_props_agg, q_props_extract

    ext = q_props_extract(SF).to_pandas()
    agg = q_props_agg(SF).to_pandas().set_index("event_type")
    ref = ext.groupby("event_type")["k"].agg(["size", "sum", "max"])
    for et, row in ref.iterrows():
        assert agg.loc[et, "n"] == row["size"]
        assert agg.loc[et, "sum_k"] == row["sum"]
        assert agg.loc[et, "max_k"] == row["max"]
