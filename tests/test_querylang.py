"""Structured query language: parser, include-set scorer plumbing,
composed gate vs its DuckDB oracle."""

import numpy as np
import pytest

from docinsight_ray.querylang import (
    StructuredQuery,
    parse_structured_query,
    structured_search,
)

SF = "/root/testdata/sf0.001"


def test_parser_grammar():
    sq = parse_structured_query('data stream -join lang:en,fr "key value" table')
    assert sq.terms == "data stream table"
    assert sq.exclude_terms == ("join",)
    assert sq.field_filter == ("lang", ("en", "fr"))
    assert sq.phrases == ("key value",)


def test_parser_edge_cases():
    # bare query: nothing but positive terms
    assert parse_structured_query("a bb ccc") == StructuredQuery(terms="a bb ccc")
    # repeated filters on one column merge (OR); distinct columns AND
    sq = parse_structured_query("x lang:en lang:fr")
    assert sq.field_filter == ("lang", ("en", "fr"))
    sq = parse_structured_query("x lang:en repo:r1,r2")
    assert sq.field_filters == (("lang", ("en",)), ("repo", ("r1", "r2")))
    # empty quotes ignored; lone '-' is a term, '-x' is an exclusion
    sq = parse_structured_query('x "" - -y')
    assert sq.phrases == () and sq.terms == "x -" and sq.exclude_terms == ("y",)
    # multiple phrases all collected
    assert parse_structured_query('"a b" x "c d"').phrases == ("a b", "c d")


@pytest.fixture(scope="module")
def doc_index(ray_session):
    from docinsight_ray.pipelines.documents import (
        SQL_PARITY_CONFIG,
        ensure_index,
        ensure_positional,
    )

    return ensure_index(SF), ensure_positional(SF), SQL_PARITY_CONFIG


def test_include_doc_ids_restricts_exactly(doc_index):
    """include_doc_ids: results are exactly the unrestricted ranking
    filtered to the include set (scores unchanged — corpus-global
    stats), for every pruning mode; empty include ⇒ empty result."""
    from docinsight_ray.scorer import BM25Scorer

    idx, _pos, cfg = doc_index
    base = BM25Scorer(idx, cfg, mode="maxscore")
    d_all, s_all = base.score_maxscore("data stream table", base.n_docs)
    include = d_all[::3].astype(np.uint64)  # every 3rd result doc
    want = [(int(d), float(s)) for d, s in zip(d_all, s_all) if d in set(include.tolist())]
    for mode, fn in (
        ("maxscore", "score_maxscore"),
        ("bmw", "score_bmw"),
        ("taat", "score_taat"),
    ):
        sc = BM25Scorer(idx, cfg, mode=mode, include_doc_ids=include)
        d, s = getattr(sc, fn)("data stream table", base.n_docs)
        assert [(int(x), float(y)) for x, y in zip(d, s)] == want, mode
    sc = BM25Scorer(idx, cfg, mode="maxscore", include_doc_ids=np.empty(0, dtype=np.uint64))
    d, s = sc.score_maxscore("data stream table", 10)
    assert d.size == 0 and s.size == 0


def test_structured_search_composition(doc_index):
    """structured_search equals the hand-composed plan: phrase
    candidates ∩ lang filter, negated docs removed, BM25 over the
    positive terms."""
    from docinsight_ray.pipelines.documents import STRUCTURED_QUERY
    from docinsight_ray.querylang import parse_structured_query, phrase_candidates
    from docinsight_ray.scorer import BM25Scorer

    idx, pos_dir, cfg = doc_index
    d, s = structured_search(STRUCTURED_QUERY, idx, cfg, k=10, pos_dir=pos_dir)
    assert d.size > 0
    sq = parse_structured_query(STRUCTURED_QUERY)
    include = phrase_candidates(sq.phrases, pos_dir, cfg)
    sc = BM25Scorer(
        idx, cfg, mode="maxscore", doc_filter=sq.field_filter,
        exclude_terms=sq.exclude_terms, include_doc_ids=include,
    )
    d2, s2 = sc.score_maxscore(sq.terms, 10)
    np.testing.assert_array_equal(d, d2)
    np.testing.assert_array_equal(s, s2)
    # phrase constraints without a positional index are refused
    with pytest.raises(ValueError, match="pos_dir"):
        structured_search(STRUCTURED_QUERY, idx, cfg, k=10)


def test_bm25_structured_gate_parity(doc_index):
    """bm25_structured gate equals its DuckDB oracle at sf0.001."""
    import duckdb
    import pandas as pd

    from docinsight_ray.pipelines.documents import ORACLE_SQL, q_bm25_structured

    got = q_bm25_structured(SF).to_pandas()
    assert len(got) > 0
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    want = con.sql(ORACLE_SQL["bm25_structured"]).df()
    cols = sorted(got.columns)
    pd.testing.assert_frame_equal(
        got[cols].sort_values("rank").reset_index(drop=True),
        want[cols].sort_values("rank").reset_index(drop=True),
        check_dtype=False,
    )


def test_parser_negated_phrases():
    sq = parse_structured_query('x "a b" -"c d" -e')
    assert sq.phrases == ("a b",) and sq.exclude_phrases == ("c d",)
    assert sq.exclude_terms == ("e",) and sq.terms == "x"


def test_negated_phrase_excludes_matching_docs(doc_index):
    """-"phrase" removes exactly the phrase's match set: results equal
    the unrestricted ranking minus phrase_candidates, scores
    unchanged."""
    from docinsight_ray.querylang import phrase_candidates
    from docinsight_ray.scorer import BM25Scorer

    idx, pos_dir, cfg = doc_index
    base = BM25Scorer(idx, cfg, mode="maxscore")
    d_all, s_all = base.score_maxscore("data stream table", base.n_docs)
    dead = set(phrase_candidates(("hash scan",), pos_dir, cfg).tolist())
    assert dead  # the phrase matches something
    want = [(int(d), float(s)) for d, s in zip(d_all, s_all) if int(d) not in dead]
    d, s = structured_search(
        'data stream table -"hash scan"', idx, cfg, k=base.n_docs, pos_dir=pos_dir
    )
    assert [(int(x), float(y)) for x, y in zip(d, s)] == want


def test_multi_column_filters_and_together(doc_index):
    """Filters on two registry columns AND together: results equal the
    lang-filtered ranking restricted to the repo-matching id set."""
    import os

    import pyarrow.parquet as pq_

    from docinsight_ray.scorer import BM25Scorer

    idx, _pos, cfg = doc_index
    reg = pq_.read_table(os.path.join(idx, "docs"), columns=["doc_id", "repo"]).to_pandas()
    repo_ids = np.sort(
        reg.loc[reg["repo"].isin(["src1", "src2"]), "doc_id"].to_numpy("uint64")
    )
    ref = BM25Scorer(
        idx, cfg, mode="maxscore", doc_filter=("lang", ("en", "fr")),
        include_doc_ids=repo_ids,
    )
    want_d, want_s = ref.score_maxscore("data stream table", 50)
    assert want_d.size > 0
    d, s = structured_search(
        "data stream table lang:en,fr repo:src1,src2", idx, cfg, k=50
    )
    np.testing.assert_array_equal(d, want_d)
    np.testing.assert_array_equal(s, want_s)


def test_parser_never_crashes_property():
    """Property: the parser accepts ARBITRARY text — never raises, and
    its output always satisfies the structural invariants (no empty
    exclusion tokens, phrases stripped and non-empty, filter values
    non-empty)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=80))
    def check(text):
        sq = parse_structured_query(text)
        assert all(t for t in sq.exclude_terms)
        assert all(p and p == p.strip() for p in sq.phrases + sq.exclude_phrases)
        for col, vals in sq.field_filters:
            assert col and all(vals)
        # parsing is deterministic
        assert parse_structured_query(text) == sq

    check()


def test_bm25_collapse_gate_parity(doc_index):
    """bm25_collapse (field collapsing): equals the DuckDB window
    oracle at sf0.001; per query, field values are unique and each
    winner outscores every other same-field doc."""
    import duckdb
    import pandas as pd

    from docinsight_ray.pipelines.documents import (
        COLLAPSE_FIELD,
        ORACLE_SQL,
        q_bm25_collapse,
    )

    got = q_bm25_collapse(SF).to_pandas()
    assert len(got) > 0
    for _qid, g in got.groupby("query_id"):
        assert g[COLLAPSE_FIELD].is_unique
        assert (g.sort_values("rank")["score"].diff().dropna() <= 0).all()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    want = con.sql(ORACLE_SQL["bm25_collapse"]).df()
    cols = sorted(got.columns)
    key = ["query_id", "rank"]
    pd.testing.assert_frame_equal(
        got[cols].sort_values(key).reset_index(drop=True),
        want[cols].sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )


def test_bm25_page2_search_after(doc_index):
    """bm25_page2 (search_after cursor): equals the DuckDB rank-window
    oracle at sf0.001, and page 2 never repeats a page-1 doc."""
    import duckdb
    import pandas as pd

    from docinsight_ray.pipelines.documents import (
        ORACLE_SQL,
        q_bm25_page2,
        q_bm25_topk,
    )

    page2 = q_bm25_page2(SF).to_pandas()
    page1 = q_bm25_topk(SF).to_pandas()
    assert len(page2) > 0
    for qid, g in page2.groupby("query_id"):
        p1 = set(page1.loc[page1.query_id == qid, "doc_id"])
        assert not (set(g["doc_id"]) & p1)
        assert g["rank"].min() >= 10
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    want = con.sql(ORACLE_SQL["bm25_page2"]).df()
    cols = sorted(page2.columns)
    key = ["query_id", "rank"]
    pd.testing.assert_frame_equal(
        page2[cols].sort_values(key).reset_index(drop=True),
        want[cols].sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )


def _gate_vs_oracle(gate_fn, oracle_key):
    import duckdb
    import pandas as pd

    from docinsight_ray.pipelines.documents import ORACLE_SQL

    got = gate_fn(SF).to_pandas()
    assert len(got) > 0
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    want = con.sql(ORACLE_SQL[oracle_key]).df()
    cols = sorted(got.columns)
    key = ["query_id", "rank"]
    pd.testing.assert_frame_equal(
        got[cols].sort_values(key).reset_index(drop=True),
        want[cols].sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )
    return got


def test_bm25_msm_gate_parity(doc_index):
    """bm25_msm equals its oracle, and every kept doc scores at least
    as well in the unrestricted ranking (scores unchanged by the
    match-count floor)."""
    from docinsight_ray.pipelines.documents import q_bm25_msm, q_bm25_topk

    got = _gate_vs_oracle(q_bm25_msm, "bm25_msm")
    base = q_bm25_topk(SF).to_pandas()
    merged = got.merge(base, on=["query_id", "doc_id"], suffixes=("_m", "_b"))
    assert (merged["score_m"] == merged["score_b"]).all()


def test_bm25_synonyms_gate_parity(doc_index):
    from docinsight_ray.pipelines.documents import q_bm25_synonyms

    _gate_vs_oracle(q_bm25_synonyms, "bm25_synonyms")


def test_bm25_boosted_gate_parity(doc_index):
    from docinsight_ray.pipelines.documents import q_bm25_boosted

    _gate_vs_oracle(q_bm25_boosted, "bm25_boosted")


def test_bm25_fielded_gate_parity(doc_index):
    """bm25_fielded equals its two-field weighted-fusion oracle, and a
    query with a field-only token surfaces docs whose CONTENT lacks
    every query term (the multi-field win)."""
    import pyarrow.parquet as pq_mod

    from docinsight_ray.pipelines.documents import FIELDED_QUERIES, q_bm25_fielded

    got = _gate_vs_oracle(q_bm25_fielded, "bm25_fielded")
    docs = pq_mod.read_table(f"{SF}/documents.parquet").to_pandas().set_index("doc_id")
    qtext = dict(FIELDED_QUERIES)
    # field influence: for at least one field-token query, a top-10 doc's
    # source matches a query token (the secondary field contributed)
    influenced = 0
    for _, row in got.iterrows():
        terms = set(qtext[row["query_id"]].lower().split())
        if docs.loc[row["doc_id"], "source"] in terms:
            influenced += 1
    assert influenced > 0


def test_parser_boost_syntax():
    sq = parse_structured_query("data^2.5 stream -join plain^3 lang:en a^b ^2")
    assert sq.terms == "data stream plain a^b ^2"
    assert sq.boosts == (("data", 2.5), ("plain", 3.0))
    assert sq.exclude_terms == ("join",)


def test_structured_boost_applies(doc_index):
    """`term^W` in a structured query scales that term's contribution:
    equals the scorer with an explicit boosts dict."""
    import numpy as np

    from docinsight_ray.config import SQL_PARITY_CONFIG
    from docinsight_ray.pipelines.documents import ensure_index
    from docinsight_ray.querylang import structured_search
    from docinsight_ray.scorer import BM25Scorer

    idx = ensure_index(SF)
    d1, s1 = structured_search("data^2 stream", idx, SQL_PARITY_CONFIG, k=10)
    sc = BM25Scorer(idx, SQL_PARITY_CONFIG, mode="maxscore", boosts={"data": 2.0})
    d2, s2 = sc.score_maxscore("data stream", 10)
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_array_equal(s1, s2)
    # and it differs from the unboosted ranking somewhere
    d0, s0 = BM25Scorer(idx, SQL_PARITY_CONFIG, mode="maxscore").score_maxscore(
        "data stream", 10
    )
    assert list(map(float, s1)) != list(map(float, s0))


def test_structured_msm_and_synonyms(doc_index):
    """structured_search msm/synonyms pass-throughs: msm auto-selects
    the exhaustive path and equals the scorer; synonyms expand."""
    from docinsight_ray.config import SQL_PARITY_CONFIG
    from docinsight_ray.pipelines.documents import ensure_index
    from docinsight_ray.scorer import BM25Scorer

    idx = ensure_index(SF)
    d1, s1 = structured_search("data stream table", idx, SQL_PARITY_CONFIG,
                               k=20, min_should_match=2)
    ref = BM25Scorer(idx, SQL_PARITY_CONFIG, min_should_match=2)
    d2, s2 = ref.score_taat("data stream table", 20)
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_array_equal(s1, s2)
    d3, _ = structured_search("data", idx, SQL_PARITY_CONFIG, k=20,
                              synonyms={"data": ("stream",)})
    ref2 = BM25Scorer(idx, SQL_PARITY_CONFIG, mode="maxscore")
    d4, _ = ref2.score_maxscore("data stream", 20)
    np.testing.assert_array_equal(d3, d4)


def test_must_clause_restricts_and_scores(doc_index):
    """+term (Lucene MUST): every result contains the required term;
    scores equal the unrestricted query's scores for those docs; a
    must term missing from the index yields empty, not an error."""
    from docinsight_ray.querylang import structured_search
    from docinsight_ray.scorer import BM25Scorer

    idx, _pos, cfg = doc_index
    d_must, s_must = structured_search("+data stream table", idx, cfg, k=1000)
    assert d_must.size > 0
    sc = BM25Scorer(idx, cfg, max_loaded_parts=2)
    req = set(sc._term_arrays("data")[0].tolist())
    assert all(int(x) in req for x in d_must)
    d_all, s_all = structured_search("data stream table", idx, cfg, k=10**6)
    base = {int(a): float(b) for a, b in zip(d_all, s_all)}
    for a, b in zip(d_must, s_must):
        assert base[int(a)] == float(b)  # must never changes the score
    d_none, _ = structured_search("+zzzmissing data", idx, cfg, k=10)
    assert d_none.size == 0


def test_bm25_rank_feature_gate_parity(doc_index):
    """bm25_rank_feature equals its additive-saturation oracle, and the
    boost is additive: every hit's score is >= the plain BM25 score of
    the same (query, doc) plus a positive bounded increment."""
    from docinsight_ray.pipelines.documents import (
        RANK_FEATURE_BOOST,
        q_bm25_rank_feature,
        q_bm25_topk,
    )

    got = _gate_vs_oracle(q_bm25_rank_feature, "bm25_rank_feature")
    base = q_bm25_topk(SF).to_pandas()
    merged = got.merge(base, on=["query_id", "doc_id"], suffixes=("_rf", "_b"))
    inc = merged["score_rf"] - merged["score_b"]
    assert (inc > 0).all() and (inc <= RANK_FEATURE_BOOST + 1e-6).all()


def test_event_retention_gate_parity(ray_session):
    """event_retention equals its cohort-triangle oracle; period-0 row
    exists for every cohort and counts every cohort member."""
    import duckdb
    import pandas as pd

    from docinsight_ray.functions.windows import ORACLE_SQL, q_event_retention

    got = q_event_retention(SF).to_pandas()
    assert len(got) > 0
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    want = con.sql(ORACLE_SQL["event_retention"]).df()
    cols = sorted(got.columns)
    key = ["cohort_day", "period"]
    pd.testing.assert_frame_equal(
        got[cols].sort_values(key).reset_index(drop=True),
        want[cols].sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )
    p0 = got[got.period == 0]
    cohorts = got["cohort_day"].unique()
    assert set(p0["cohort_day"]) == set(cohorts)
    # period-0 has every cohort member active (their first day)
    per_cohort_max = got.groupby("cohort_day")["n_users"].max()
    assert (p0.set_index("cohort_day")["n_users"] >= per_cohort_max).all()


def test_windowed_delta_gate_parity(ray_session):
    """windowed_delta equals its lag-window oracle; per type, deltas
    telescope back to last-minus-first bucket count."""
    import duckdb
    import pandas as pd

    from docinsight_ray.functions.windows import ORACLE_SQL, q_windowed_delta

    got = q_windowed_delta(SF).to_pandas()
    assert len(got) > 0
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    want = con.sql(ORACLE_SQL["windowed_delta"]).df()
    cols = sorted(got.columns)
    key = ["event_type", "window_start"]
    pd.testing.assert_frame_equal(
        got[cols].sort_values(key).reset_index(drop=True),
        want[cols].sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )
    # telescoping invariant against the tumbling aggregation itself
    from docinsight_ray.functions.windows import q_windowed_agg

    agg = q_windowed_agg(SF).to_pandas()
    for et, g in got.groupby("event_type"):
        a = agg[agg.event_type == et].sort_values("window_start")
        assert g["delta_n"].sum() == a["n"].iloc[-1] - a["n"].iloc[0]
