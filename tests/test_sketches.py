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


def test_mrl_sketch_rank_error():
    """Sketch quantiles within 2% rank error of exact; deterministic."""
    import numpy as np
    import pyarrow.parquet as pq

    from docinsight_ray.functions.sketches import QSK_QS, q_value_quantiles_sketch

    a = q_value_quantiles_sketch(SF).to_pandas()
    b = q_value_quantiles_sketch(SF).to_pandas()
    assert a.values.tolist() == b.values.tolist()  # determinism
    vals = np.sort(
        pq.read_table(f"{SF}/events.parquet", columns=["value"])["value"].to_numpy()
    )
    n = vals.size
    for q, est in zip(a["q"], a["est"]):
        # rank of the estimate in the exact sorted data
        r = np.searchsorted(vals, est, side="left") / n
        assert abs(r - q) <= 0.02, f"q={q}: est rank {r:.4f}"


def test_mrl_sketch_unit_exactness_below_k():
    """With fewer than k values, the sketch is exact (level-0 only)."""
    import numpy as np

    from docinsight_ray.functions.sketches import MRLSketch

    rng = np.random.default_rng(1)
    x = rng.normal(size=200)
    sk = MRLSketch(k=256)
    sk.add(x)
    xs = np.sort(x)
    got = sk.query((0.5,))[0]
    # lower-quantile convention: element at ceil(q*n)-ish rank
    assert got in xs
    assert abs(np.searchsorted(xs, got) / 200 - 0.5) <= 0.0051


def test_terms_agg_error_bound_contract():
    """est <= true <= est + err_bound for every reported term, and the
    zero-bound head matches the exact ranking."""
    import re
    from collections import Counter

    import pyarrow.parquet as pq

    from docinsight_ray.functions.sketches import q_terms_agg_approx

    got = q_terms_agg_approx(SF).to_pandas()
    rx = re.compile(r"[a-z0-9]{2,}")
    true = Counter()
    for t in pq.read_table(f"{SF}/documents.parquet", columns=["text"])["text"].to_pylist():
        true.update(rx.findall(t.lower()))
    for _, row in got.iterrows():
        tf = true[row["term"]]
        assert row["est_tf"] <= tf <= row["est_tf"] + row["err_bound"], row["term"]
    # exact-head agreement: terms with bound 0 have exact counts
    zb = got[got["err_bound"] == 0]
    for _, row in zb.iterrows():
        assert row["est_tf"] == true[row["term"]]
    # the true global top term must be reported (it is a local top
    # in at least one shard by pigeonhole)
    top_term = max(true.items(), key=lambda kv: (kv[1], kv[0]))[0]
    assert top_term in set(got["term"])


def test_grouped_quantiles_rank_error():
    import numpy as np
    import pyarrow.parquet as pq

    from docinsight_ray.functions.sketches import q_value_quantiles_by_type

    got = q_value_quantiles_by_type(SF).to_pandas()
    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["event_type", "value"]
    ).to_pandas()
    assert set(got["event_type"]) == set(ev["event_type"])
    for et, sub in got.groupby("event_type"):
        vals = np.sort(ev.loc[ev["event_type"] == et, "value"].to_numpy())
        n = vals.size
        for q, est in zip(sub["q"], sub["est"]):
            r = np.searchsorted(vals, est, side="left") / n
            assert abs(r - q) <= 0.03, f"{et} q={q}: rank {r:.4f}"


def test_hll_per_lang_within_error_bound():
    from docinsight_ray.functions.sketches import q_distinct_terms_by_lang

    t = q_distinct_terms_by_lang(SF).to_pandas()
    con = _con()
    exact = dict(
        con.sql(
            f"SELECT lang, count(DISTINCT term) FROM "
            f"(SELECT lang, unnest({TOK_SQL}) AS term FROM documents) GROUP BY lang"
        ).fetchall()
    )
    assert sorted(t["lang"]) == sorted(exact)
    for lang, est in zip(t["lang"], t["n_distinct_est"]):
        assert abs(int(est) - exact[lang]) <= max(3, 0.06 * exact[lang]), lang
    # deterministic
    assert t.equals(q_distinct_terms_by_lang(SF).to_pandas())
