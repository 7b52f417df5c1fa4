"""Training-corpus preparation ops (functions/corpusops.py) at sf0.001."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def _oracle(name: str) -> pd.DataFrame:
    from docinsight_ray.functions.corpusops import ORACLE_SQL

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    return con.sql(ORACLE_SQL[name]).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = np.round(df[c].astype(np.float64), 9)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize(
    "name",
    [
        "dataset_split",
        "sequence_pack",
        "length_quantiles",
        "tfidf_top_terms",
        "decontaminate",
        "repetition_stats",
        "stratified_sample",
        "term_cooccurrence",
        "hot_ngrams",
        "hot_ngram_coverage",
        "mixture_sample",
        "budget_select",
        "bigram_surprisal",
        "winnow_fingerprints",
        "winnow_pairs",
    ],
)
def test_sql_parity(name):
    from docinsight_ray.functions.corpusops import QUERIES

    got = _canon(QUERIES[name](SF).to_pandas())
    want = _canon(_oracle(name))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_winnow_guarantees(tmp_path):
    """The two Schleimer-2003 winnowing guarantees: (1) every window
    of WIN_W consecutive grams contains a selected fingerprint (gap
    bound), at the expected ~2/(W+1) density; (2) two documents
    sharing a token run of ≥ WIN_K+WIN_W-1 tokens share at least one
    fingerprint HASH — the property plagiarism matching rests on."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docinsight_ray.functions.corpusops import (
        WIN_K,
        WIN_W,
        _TOK2_RE,
        q_winnow_fingerprints,
    )

    fp = q_winnow_fingerprints(SF).to_pandas()
    import duckdb as ddb

    docs = ddb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
    ).df()
    n_grams_total = 0
    for did, text in zip(docs["doc_id"], docs["text"]):
        n = len(_TOK2_RE.findall(text.lower())) - WIN_K + 1
        if n < WIN_W:
            assert did not in set(fp["doc_id"])
            continue
        n_grams_total += n
        pos = np.sort(fp.loc[fp.doc_id == did, "pos"].to_numpy())
        assert pos.size > 0
        assert pos[0] <= WIN_W - 1  # first window covered
        assert pos[-1] >= n - WIN_W  # last window covered
        assert (np.diff(pos) <= WIN_W).all()  # every window in between
    density = len(fp) / n_grams_total
    assert 0.5 * 2 / (WIN_W + 1) < density < 2.0 * 2 / (WIN_W + 1), density

    # shared-run guarantee on a controlled fixture
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 ≥ K+W-1=7
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2], type=pa.int64()),
                "text": pa.array(
                    [
                        "one two three four five six seven " + shared,
                        shared + " red blue green yellow pink black white",
                    ]
                ),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    f2 = q_winnow_fingerprints(str(tmp_path)).to_pandas()
    h1 = set(f2.loc[f2.doc_id == 1, "h"])
    h2 = set(f2.loc[f2.doc_id == 2, "h"])
    assert h1 & h2, "shared ≥(K+W-1)-token run must share a fingerprint"


def test_winnow_pairs_detects_planted_plagiarism(tmp_path):
    """winnow_pairs surfaces a planted long shared passage as a
    candidate pair (a<b, n_shared ≥ WIN_MIN_SHARED), and unrelated
    docs never pair."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docinsight_ray.functions.corpusops import WIN_MIN_SHARED, q_winnow_pairs

    shared = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], type=pa.int64()),
                "text": pa.array(
                    [
                        "one two three four five " + shared,
                        shared + " red blue green yellow pink",
                        "cat dog bird fish horse cow sheep goat duck hen "
                        "pig frog bee ant owl fox wolf bear lion tiger",
                    ]
                ),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    pairs = q_winnow_pairs(str(tmp_path)).to_pandas()
    assert (pairs["a_id"] < pairs["b_id"]).all()
    assert (pairs["n_shared"] >= WIN_MIN_SHARED).all()
    match = pairs[(pairs.a_id == 1) & (pairs.b_id == 2)]
    assert len(match) == 1 and int(match["n_shared"].iloc[0]) >= 2
    assert not ((pairs.a_id == 3) | (pairs.b_id == 3)).any()


def test_bigram_surprisal_model_semantics():
    """Stupid-backoff bigram LM: costs are positive micro-nats,
    n_backoff is bounded by the bigram count, the run is
    deterministic, and conditioning on the previous token reduces the
    corpus-mean per-token cost vs the unigram LM (the reason to run a
    higher-order model at all)."""
    from docinsight_ray.functions.corpusops import (
        q_bigram_surprisal,
        q_unigram_surprisal,
    )

    bg = q_bigram_surprisal(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert (bg["cost_micro"] > 0).all()
    assert (bg["n_backoff"] <= (bg["n_tokens"] - 1).clip(lower=0)).all()
    again = q_bigram_surprisal(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(bg, again)

    # the sf corpus draws tokens INDEPENDENTLY, so conditioning buys
    # nothing there — the bigram model must merely stay calibrated
    # (within 10% of the unigram per-token cost, the independence
    # limit where bc(prev,cur) ≈ tf(prev)·tf(cur)/total)
    uni = q_unigram_surprisal(SF).to_pandas()
    uni = uni[uni["n_tokens"] > 0]
    mean_uni = uni["cost_micro"].sum() / uni["n_tokens"].sum()
    mean_bg = bg["cost_micro"].sum() / bg["n_tokens"].sum()
    assert abs(mean_bg - mean_uni) / mean_uni < 0.10, (mean_bg, mean_uni)


def test_bigram_surprisal_conditioning_wins_on_structured_text(tmp_path):
    """On text with real sequential structure (strict token
    alternation) the bigram conditionals drive per-token cost far
    below the unigram model — the property that makes a higher-order
    LM worth running as a quality filter."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docinsight_ray.functions.corpusops import q_bigram_surprisal

    texts = [" ".join(["aa bb"] * 40)] * 10 + [" ".join(["cc dd"] * 40)] * 10
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    bg = q_bigram_surprisal(str(tmp_path)).to_pandas()
    # unigram baseline on this corpus: every token costs ln(4)·1e6
    # (four equiprobable symbols); the bigram chain is deterministic
    # after the first token, so per-token cost collapses toward 0
    per_tok = bg["cost_micro"].sum() / bg["n_tokens"].sum()
    assert per_tok < 0.2 * np.log(4) * 1e6, per_tok
    assert (bg["n_backoff"] == 0).all()  # every bigram is in the kept table


def test_budget_select_maximal_quality_prefix():
    """The kept set is the MAXIMAL (score desc, doc_id asc) prefix
    under the token budget: total kept tokens ≤ budget, the next doc
    in that ordering would overflow it, and no excluded doc outranks
    a kept one."""
    from docinsight_ray.functions.corpusops import (
        BUDGET_DEN,
        BUDGET_NUM,
        q_budget_select,
    )

    kept = q_budget_select(SF).to_pandas().sort_values("cum_tokens").reset_index(drop=True)
    # independently recompute every doc's (score, n_tokens) via the oracle CTE
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    tok = "list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), t -> length(t) >= 2)"
    allx = con.sql(
        f"""SELECT doc_id, len({tok})::BIGINT AS n_tokens,
                   ((len({tok})::BIGINT * 1000000) // greatest(n_chars, 1))::BIGINT AS score
            FROM documents"""
    ).df().sort_values(["score", "doc_id"], ascending=[False, True]).reset_index(drop=True)
    budget = int(allx["n_tokens"].sum()) * BUDGET_NUM // BUDGET_DEN

    assert int(kept["n_tokens"].sum()) <= budget
    # cum_tokens is a real prefix sum in selection order
    assert np.array_equal(kept["cum_tokens"].to_numpy(),
                          np.cumsum(kept["n_tokens"].to_numpy()))
    # kept == the first len(kept) rows of the global quality ordering
    n = len(kept)
    assert set(kept["doc_id"]) == set(allx["doc_id"].iloc[:n])
    # maximality: the next-ranked doc would overflow the budget
    if n < len(allx):
        assert int(kept["n_tokens"].sum()) + int(allx["n_tokens"].iloc[n]) > budget
    # determinism
    again = q_budget_select(SF).to_pandas().sort_values("cum_tokens").reset_index(drop=True)
    pd.testing.assert_frame_equal(kept, again)


def test_dataset_split_fractions_and_determinism():
    from docinsight_ray.functions.corpusops import q_dataset_split

    a = q_dataset_split(SF).to_pandas().set_index("doc_id").sort_index()
    b = q_dataset_split(SF).to_pandas().set_index("doc_id").sort_index()
    assert a.equals(b)  # pure function of content
    frac = a["split"].value_counts(normalize=True)
    assert 0.7 < frac.get("train", 0) < 0.9
    assert frac.get("val", 0) < 0.2 and frac.get("test", 0) < 0.2


def test_sequence_pack_is_contiguous_scan():
    from docinsight_ray.functions.corpusops import PACK_BUDGET, q_sequence_pack

    t = q_sequence_pack(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    start = t["start_token"].to_numpy()
    n = t["n_tokens"].to_numpy()
    # concatenation order: each doc starts where the previous ended
    assert start[0] == 0
    assert (start[1:] == start[:-1] + n[:-1]).all()
    assert (t["pack_id"].to_numpy() == start // PACK_BUDGET).all()


def test_length_quantiles_ordered():
    from docinsight_ray.functions.corpusops import q_length_quantiles

    t = q_length_quantiles(SF).to_pandas()
    assert len(t) >= 1 and t["n"].sum() > 0
    for _, r in t.iterrows():
        assert r["q25"] <= r["q50"] <= r["q75"] <= r["q95"]


def test_decontaminate_flags_bench_docs():
    from docinsight_ray.functions.corpusops import DECON_MOD, q_decontaminate

    t = q_decontaminate(SF).to_pandas().set_index("doc_id")
    # every eval-set doc overlaps its own prefix -> contaminated
    bench_ids = [d for d in t.index if d % DECON_MOD == 0]
    assert bench_ids and (t.loc[bench_ids, "contaminated"] == 1).all()
    # and decontamination actually fires beyond the eval set itself
    # (exact duplicates of bench docs exist in the fixture corpus)
    assert t["contaminated"].sum() > len(bench_ids)
    assert ((t["n_hits"] > 0) == (t["contaminated"] == 1)).all()


def test_repetition_stats_bounds():
    from docinsight_ray.functions.corpusops import q_repetition_stats

    t = q_repetition_stats(SF).to_pandas()
    assert (t["n_distinct"] <= t["n_tokens"]).all()
    assert (t["top_tf"] <= t["n_tokens"]).all()
    assert ((t["n_tokens"] == 0) | (t["top_tf"] >= 1)).all()
    # word-salad fixture docs repeat tokens: signal must be non-trivial
    assert (t["n_distinct"] < t["n_tokens"]).any()


def test_stratified_sample_balanced_and_deterministic():
    from docinsight_ray.functions.corpusops import STRAT_K, q_stratified_sample

    a = q_stratified_sample(SF).to_pandas()
    b = q_stratified_sample(SF).to_pandas()
    key = ["lang", "rank"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )
    sizes = a.groupby("lang").size()
    assert (sizes <= STRAT_K).all() and len(sizes) >= 2
    # hash order, not doc_id order: the sample isn't just a head()
    first = a.sort_values(["lang", "rank"]).groupby("lang").head(5)
    assert not first["doc_id"].is_monotonic_increasing


def test_term_cooccurrence_symmetric_counts():
    from docinsight_ray.functions.corpusops import cooccurrence_pmi, q_term_cooccurrence

    t = q_term_cooccurrence(SF).to_pandas()
    assert (t["term_a"] < t["term_b"]).all()
    assert (t["n_ab"] <= t[["n_a", "n_b"]].min(axis=1)).all()
    assert (t["n_ab"].to_numpy()[:-1] >= t["n_ab"].to_numpy()[1:]).all()
    pmi = cooccurrence_pmi(SF)
    assert np.isfinite(pmi["pmi"]).all()


def test_tfidf_topk_shape():
    from docinsight_ray.functions.corpusops import TFIDF_K, q_tfidf_top_terms

    t = q_tfidf_top_terms(SF).to_pandas()
    per_doc = t.groupby("doc_id")
    assert (per_doc["rank"].max() < TFIDF_K).all()
    # within each doc: ranks are 0..m-1 and scores non-increasing
    for _, g in per_doc:
        g = g.sort_values("rank")
        assert list(g["rank"]) == list(range(len(g)))
        assert (np.diff(g["tfidf"].to_numpy()) <= 1e-12).all()


def test_hot_ngrams_invariants():
    from docinsight_ray.functions.corpusops import (
        HOT_MIN_DOCS,
        HOT_TOPK,
        q_hot_ngram_coverage,
        q_hot_ngrams,
    )

    hot = q_hot_ngrams(SF).to_pandas()
    assert 0 < len(hot) <= HOT_TOPK
    assert (hot["n_docs"] >= HOT_MIN_DOCS).all()
    assert (hot["n_occ"] >= hot["n_docs"]).all()
    # ordering: (n_docs desc, n_occ desc, gram asc), rank dense 0..m-1
    key = list(zip(-hot["n_docs"], -hot["n_occ"], hot["gram"]))
    assert key == sorted(key)
    assert list(hot["rank"]) == list(range(len(hot)))

    cov = q_hot_ngram_coverage(SF).to_pandas()
    assert (cov["n_hot"] <= cov["n_grams"]).all()
    # hot passages exist in the fixture (dup docs) -> coverage fires
    assert cov["n_hot"].sum() > 0


def test_mixture_sample_rebalances_toward_uniform():
    from docinsight_ray.functions.corpusops import q_mixture_sample

    t = q_mixture_sample(SF).to_pandas()
    assert set(t["kept"].unique()) <= {0, 1}
    sizes = t.groupby("lang").size()
    kept = t.groupby("lang")["kept"].sum()
    # the smallest domain keeps everything (rate 1.0)
    lang_min = sizes.idxmin()
    assert kept[lang_min] == sizes[lang_min]
    # the largest domain is down-sampled
    lang_max = sizes.idxmax()
    assert kept[lang_max] < sizes[lang_max]
    # post-sample mixture is closer to uniform: max/min keep-count
    # ratio shrinks vs the input ratio
    assert kept.max() / max(kept.min(), 1) < sizes.max() / sizes.min()
    # deterministic
    assert t.equals(q_mixture_sample(SF).to_pandas())


def test_unigram_surprisal_semantics(ray_session):
    """unigram_surprisal: per-doc cost equals a brute-force LM built the
    same way (top-LM_VOCAB by tf, OOV fold), rare terms cost more than
    frequent ones, and the OOV path fires on the sf corpus."""
    import numpy as np
    import pandas as pd

    from docinsight_ray.functions.corpusops import (
        LM_VOCAB,
        _TOK2_RE,
        q_unigram_surprisal,
    )

    sf = "/root/testdata/sf0.001"
    got = q_unigram_surprisal(sf).to_pandas().set_index("doc_id").sort_index()

    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    toks = docs["text"].str.lower().str.findall(_TOK2_RE)
    tf: dict[str, int] = {}
    for ts in toks:
        for t in ts:
            tf[t] = tf.get(t, 0) + 1
    total = sum(tf.values())
    top = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:LM_VOCAB]
    oov_tf = max(total - sum(c for _, c in top), 1)
    cmap = {t: int(np.round(np.log(total / float(c)) * 1e6)) for t, c in top}
    oov_cost = int(np.round(np.log(total / float(oov_tf)) * 1e6))

    want_cost = toks.map(lambda ts: sum(cmap.get(t, oov_cost) for t in ts))
    want_oov = toks.map(lambda ts: sum(1 for t in ts if t not in cmap))
    assert (got["cost_micro"].to_numpy() == want_cost.to_numpy()[np.argsort(docs["doc_id"].to_numpy())]).all()
    assert int(got["n_oov"].sum()) == int(want_oov.sum()) and int(got["n_oov"].sum()) > 0
    # rarer vocab term → strictly higher per-token cost
    costs_by_tf = sorted(((c, cmap[t]) for t, c in top), key=lambda x: x[0])
    assert all(a[1] >= b[1] for a, b in zip(costs_by_tf, costs_by_tf[1:]))


def test_merge_cover_interval_union():
    import numpy as np

    from docinsight_ray.functions.corpusops import _merge_cover

    # empty / single / overlapping / touching / disjoint
    assert _merge_cover(np.array([], dtype=np.int64), 5) == (0, 0)
    assert _merge_cover(np.array([3]), 5) == (5, 1)
    assert _merge_cover(np.array([0, 2]), 5) == (7, 1)       # overlap
    assert _merge_cover(np.array([0, 5]), 5) == (10, 1)      # touching
    assert _merge_cover(np.array([0, 10]), 5) == (10, 2)     # disjoint
    assert _merge_cover(np.array([0, 2, 10, 11, 30]), 5) == (7 + 6 + 5, 3)


def test_dup_spans_oracle_exact():
    import duckdb
    import pandas as pd

    from docinsight_ray.functions.corpusops import ORACLE_SQL, q_dup_spans

    mine = q_dup_spans(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = (
        con.sql(ORACLE_SQL["dup_spans"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)[mine.columns]
    )
    pd.testing.assert_frame_equal(mine, want, check_dtype=False)
    # fixture sanity: the driver corpus injects exact duplicates, so
    # cross-doc duplicated spans must exist and coverage is bounded
    assert (mine["n_dup_positions"] > 0).any()
    assert (mine["n_dup_positions"] <= mine["n_tokens"]).all()


def test_corpus_report_oracle_exact():
    import duckdb
    import pandas as pd

    from docinsight_ray.functions.corpusops import ORACLE_SQL, q_corpus_report

    mine = q_corpus_report(SF).to_pandas().sort_values("metric").reset_index(drop=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = (
        con.sql(ORACLE_SQL["corpus_report"])
        .df()
        .sort_values("metric")
        .reset_index(drop=True)[mine.columns]
    )
    pd.testing.assert_frame_equal(mine, want, check_dtype=False)
    m = dict(zip(mine["metric"], mine["value"]))
    assert m["n_docs"] > 0 and m["total_tokens"] > 0
    assert 0 <= m["n_dup_docs"] < m["n_docs"]


def test_gram_hit_counts_matches_python_reference():
    """Parity pin for the columnar n-gram overlap kernel vs the per-doc
    set-algebra reference it replaced (distinct grams, row-boundary
    windows masked, duplicates deduped)."""
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from docinsight_ray.functions.corpusops import (
        DECON_N, _TOK2_RE, _grams, gram_hit_counts,
    )

    grams = frozenset({"aa bb cc", "bb cc aa", "dd ee ff", "xx yy zz"})

    def reference(texts):
        out = []
        for t in texts:
            toks = _TOK2_RE.findall(t.lower())
            out.append(len(_grams(toks, DECON_N) & grams))
        return out

    word = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff", "xx", "q", "The"])
    text = st.lists(word, max_size=12).map(" ".join)

    @settings(max_examples=50, deadline=None)
    @given(st.lists(text, max_size=6))
    def check(texts):
        got = gram_hit_counts(pd.Series(texts, dtype=object), grams, DECON_N)
        assert list(got) == reference(texts)

    check()
    # duplicate grams in one doc count once; short docs count zero
    got = gram_hit_counts(
        pd.Series(["aa bb cc aa bb cc", "aa bb", "", "dd ee ff xx yy zz"]), grams
    )
    assert list(got) == [2, 0, 0, 2]
