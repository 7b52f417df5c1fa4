"""Sketch ops (functions/sketches.py): accuracy vs exact answers."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"

TOK_SQL = "list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), t -> length(t) >= 2)"


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def _con():
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    return con


def test_hll_distinct_within_error_bound():
    from docinsight_ray.functions.sketches import q_distinct_terms_hll

    t = q_distinct_terms_hll(SF).to_pandas()
    con = _con()
    exact = con.sql(
        f"SELECT count(DISTINCT term) FROM (SELECT unnest({TOK_SQL}) AS term FROM documents)"
    ).fetchone()[0]
    est = int(t["n_distinct_est"].iloc[0])
    # 4096 registers -> ~1.6 % standard error; allow 3 sigma + slack
    assert abs(est - exact) <= max(3, 0.06 * exact)
    # deterministic
    t2 = q_distinct_terms_hll(SF).to_pandas()
    assert t.equals(t2)


def test_cms_heavy_hitters_one_sided_and_topk():
    from docinsight_ray.functions.sketches import q_heavy_hitters_cms

    t = q_heavy_hitters_cms(SF).to_pandas()
    con = _con()
    exact = con.sql(
        f"""SELECT term, count(*)::BIGINT AS tf
            FROM (SELECT unnest({TOK_SQL}) AS term FROM documents)
            GROUP BY term ORDER BY tf DESC, term ASC"""
    ).df()
    true_tf = dict(zip(exact["term"], exact["tf"]))
    n_tokens = int(exact["tf"].sum())

    # CMS guarantee: one-sided error, bounded overestimate
    for term, est in zip(t["term"], t["est_tf"]):
        assert est >= true_tf.get(term, 0)
        assert est - true_tf.get(term, 0) <= max(5, 0.001 * n_tokens)

    # the reported head recovers the true heavy hitters
    k = len(t)
    true_top = set(exact.head(k)["term"])
    assert len(set(t["term"]) & true_top) >= int(0.9 * k)
    # the very top of the distribution is exact
    assert list(t["term"].head(3)) == list(exact["term"].head(3))
