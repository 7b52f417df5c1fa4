"""Late session-12 ops: invariants beyond the SQL-oracle gates."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def test_knn_range_bounds_and_determinism():
    from docinsight_ray.functions.knn import RANGE_TAU, q_knn_range

    t = q_knn_range(SF).to_pandas()
    assert (t["cos"] >= RANGE_TAU).all()
    assert (t["cos"] <= 1.0).all()
    # no self matches; ranks contiguous per query
    assert (t["query_id"] != t["vec_id"]).all()
    for _qid, g in t.groupby("query_id"):
        assert list(g["rank"]) == list(range(len(g)))
        assert list(g["cos"]) == sorted(g["cos"], reverse=True)
    assert t.equals(q_knn_range(SF).to_pandas())


def test_span_corruption_invariants():
    from docinsight_ray.functions.corpusops import MASK_PCT, MASK_MOD, q_span_corruption

    t = q_span_corruption(SF).to_pandas()
    assert (t["n_masked"] <= t["n_tokens"]).all()
    assert (t["n_spans"] <= t["n_masked"]).all()
    # corpus-level density near the configured rate (15 %)
    density = t["n_masked"].sum() / t["n_tokens"].sum()
    want = MASK_PCT / MASK_MOD
    assert abs(density - want) < 0.02
    # deterministic
    assert t.equals(q_span_corruption(SF).to_pandas())


def test_pmi_and_spectrum_sanity():
    from docinsight_ray.functions.corpusops import (
        PMI_MIN_COUNT,
        q_pmi_collocations,
        q_term_freq_spectrum,
    )

    p = q_pmi_collocations(SF).to_pandas()
    assert (p["pair_count"] >= PMI_MIN_COUNT).all()
    assert list(p["pmi_micro"]) == sorted(p["pmi_micro"], reverse=True)
    s = q_term_freq_spectrum(SF).to_pandas()
    # spectrum buckets partition the vocabulary
    import duckdb

    con = duckdb.connect()
    vocab = con.execute(
        "SELECT count(DISTINCT term) FROM (SELECT unnest(list_filter("
        "regexp_extract_all(lower(text), '[a-z0-9]+'), x -> length(x) >= 2)) AS term "
        f"FROM read_parquet('{SF}/documents.parquet'))"
    ).fetchone()[0]
    assert int(s["n_terms"].sum()) == vocab


def test_jaccard_topk_brute_force():
    """Gate output equals a direct driver-side brute force."""
    import re

    import duckdb

    from docinsight_ray.functions.dedup import JAC_QUERY_DOC, JAC_TOPK, q_jaccard_topk

    got = q_jaccard_topk(SF).to_pandas()
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, lower(text) FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    sets = {int(d): set(re.findall(r"[a-z0-9]{2,}", t)) for d, t in rows}
    q = sets[JAC_QUERY_DOC]
    scored = sorted(
        (
            (-(len(q & s) * 1_000_000 // len(q | s)), d)
            for d, s in sets.items()
            if d != JAC_QUERY_DOC
        )
    )[:JAC_TOPK]
    want = [(d, -neg) for neg, d in scored]
    assert list(zip(got["doc_id"], got["jaccard_micro"])) == want
