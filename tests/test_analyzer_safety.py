"""ADVICE-r3 regressions: term-hash canary, analyzer-normalized
must/exclude/boost terms, '+word^2.5' grammar, merge overwrite guard,
compact analyzer adoption."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from docinsight_ray.build import build_index
from docinsight_ray.config import EngineConfig
from docinsight_ray.ids import check_term_hash_canary, term_hash_canary
from docinsight_ray.querylang import parse_structured_query, structured_search
from docinsight_ray.scorer import BM25Scorer


def _mini_corpus() -> pa.Table:
    docs = [
        ("r", "t0.txt", "wooden tables are heavy and wooden chairs are light"),
        ("r", "t1.txt", "a single table stands near the window"),
        ("r", "t2.txt", "chairs and stools only in this room"),
        ("r", "t3.txt", "benches line the hallway walls"),
    ]
    return pa.table({
        "repo": pa.array([d[0] for d in docs], type=pa.string()),
        "path": pa.array([d[1] for d in docs], type=pa.string()),
        "commit": pa.array(["c0"] * len(docs), type=pa.string()),
        "lang": pa.array(["en"] * len(docs), type=pa.string()),
        "content": pa.array([d[2] for d in docs], type=pa.string()),
    })


STEM_CFG = EngineConfig(tokenizer="simple", stemmer="s", num_buckets=4)


@pytest.fixture(scope="module")
def stemmed_index(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("analyzer")
    idx = str(root / "idx")
    build_index(ray.data.from_arrow(_mini_corpus()), idx, STEM_CFG, fingerprint="stem")
    docs = pq.read_table(os.path.join(idx, "docs"), columns=["doc_id", "path"])
    by_path = dict(zip(docs["path"].to_pylist(), docs["doc_id"].to_pylist()))
    return idx, by_path


# ---- term-hash canary -----------------------------------------------------


def test_canary_recorded_and_checked(stemmed_index, tmp_path):
    idx, _ = stemmed_index
    stats = json.loads(open(os.path.join(idx, "corpus_stats.json")).read())
    assert stats["term_hash_canary"] == term_hash_canary()
    # a matching / absent canary passes silently
    check_term_hash_canary(stats, "here")
    check_term_hash_canary({}, "pre-canary stats")
    # a foreign canary (index built by a different ahash build) fails
    # LOUDLY at scorer construction instead of silently missing terms
    import shutil

    bad = str(tmp_path / "foreign")
    shutil.copytree(idx, bad)
    stats["term_hash_canary"] = "deadbeefdeadbeef"
    with open(os.path.join(bad, "corpus_stats.json"), "w") as f:
        json.dump(stats, f)
    with pytest.raises(RuntimeError, match="canary mismatch"):
        BM25Scorer(bad, STEM_CFG)
    # merge_indexes refuses a foreign-hash source for the same reason
    from docinsight_ray.pipelines.merge import merge_indexes

    with pytest.raises(RuntimeError, match="canary mismatch"):
        merge_indexes([bad], str(tmp_path / "m"), STEM_CFG)


# ---- analyzer-normalized clauses -------------------------------------------


def test_parser_must_with_boost():
    sq = parse_structured_query("+word^2.5 other")
    assert sq.must_terms == ("word",)
    assert sq.terms == "word other"
    assert sq.boosts == (("word", 2.5),)


def test_must_terms_follow_analyzer(stemmed_index):
    """'+tables' under stemmer='s' must match the indexed stem 'table'
    (pre-fix: the raw surface form missed and returned zero results)."""
    idx, by_path = stemmed_index
    d, s = structured_search("+tables wooden", idx, STEM_CFG, k=10)
    assert d.size > 0
    table_docs = {by_path["t0.txt"], by_path["t1.txt"]}
    assert set(d.tolist()) == table_docs


def test_exclude_terms_follow_analyzer(stemmed_index):
    idx, by_path = stemmed_index
    sc = BM25Scorer(idx, STEM_CFG, exclude_terms=("tables",))
    d, _ = sc.score_taat("wooden table chair bench", 10)
    assert d.size > 0
    banned = {by_path["t0.txt"], by_path["t1.txt"]}
    assert not (set(d.tolist()) & banned)
    # a stopword-analyzed exclusion is a no-op, not an error
    cfg_stop = EngineConfig(tokenizer="simple", stemmer="s",
                            stopwords=("the",), num_buckets=4)
    sc2 = BM25Scorer(idx, cfg_stop, exclude_terms=("the",))
    d2, _ = sc2.score_taat("wooden table chair bench", 10)
    assert d2.size > 0


def test_boost_keys_follow_analyzer(stemmed_index):
    """'tables^3' boosts the indexed stem 'table' — identical results
    to boosting the stem directly, and different from no boost."""
    idx, _ = stemmed_index
    a = BM25Scorer(idx, STEM_CFG, boosts={"tables": 3.0})
    b = BM25Scorer(idx, STEM_CFG, boosts={"table": 3.0})
    plain = BM25Scorer(idx, STEM_CFG)
    q = "wooden table chair"
    da, sa = a.score_taat(q, 10)
    db, sb = b.score_taat(q, 10)
    dp, sp = plain.score_taat(q, 10)
    np.testing.assert_array_equal(da, db)
    np.testing.assert_array_equal(sa, sb)
    assert not (da.tolist() == dp.tolist() and sa.tolist() == sp.tolist())


def test_exclude_strips_boost_suffix():
    """'-word^2' excludes 'word' (the ^boost is meaningless on an
    exclusion and is stripped, matching the '+word^2.5' grammar);
    pre-fix the analyzer split 'word^2' into ('word','2') and the
    exclusion required BOTH tokens."""
    sq = parse_structured_query("wooden -tables^2")
    assert sq.exclude_terms == ("tables",)
    assert sq.boosts == ()


def test_exclude_boost_end_to_end(stemmed_index):
    idx, by_path = stemmed_index
    d, _ = structured_search("wooden chair -tables^3", idx, STEM_CFG, k=10)
    banned = {by_path["t0.txt"], by_path["t1.txt"]}
    assert d.size > 0 and not (set(d.tolist()) & banned)


def test_boost_surface_collision_takes_max(stemmed_index):
    """Two surface forms that analyze to the same token combine via
    max, independent of dict insertion order (pre-fix: last-wins)."""
    idx, _ = stemmed_index
    ab = BM25Scorer(idx, STEM_CFG, boosts={"table": 2.0, "tables": 3.0})
    ba = BM25Scorer(idx, STEM_CFG, boosts={"tables": 3.0, "table": 2.0})
    want = BM25Scorer(idx, STEM_CFG, boosts={"table": 3.0})
    q = "wooden table chair"
    for sc in (ab, ba):
        d, s = sc.score_taat(q, 10)
        dw, sw = want.score_taat(q, 10)
        np.testing.assert_array_equal(d, dw)
        np.testing.assert_array_equal(s, sw)


def test_must_boost_combination_end_to_end(stemmed_index):
    """'+tables^2' requires the stem AND boosts it (pre-fix: the literal
    'tables^2.0' matched nothing and the query silently emptied)."""
    idx, by_path = stemmed_index
    d, s = structured_search("+tables^2 wooden", idx, STEM_CFG, k=10)
    assert set(d.tolist()) == {by_path["t0.txt"], by_path["t1.txt"]}


# ---- merge overwrite guard --------------------------------------------------


def test_merge_refuses_to_clobber_unrelated_index(ray_session, tmp_path):
    from docinsight_ray.fixtures import gen_corpus
    from docinsight_ray.pipelines.merge import merge_indexes

    cfg = EngineConfig(num_buckets=4)
    src, victim = str(tmp_path / "src"), str(tmp_path / "victim")
    build_index(ray.data.from_arrow(gen_corpus(40, seed=3)), src, cfg,
                fingerprint="src")
    build_index(ray.data.from_arrow(gen_corpus(30, seed=4)), victim, cfg,
                fingerprint="victim")
    with pytest.raises(ValueError, match="refusing to destroy"):
        merge_indexes([src], victim, cfg)
    # the victim is intact and still serves
    assert BM25Scorer(victim, cfg).n_docs > 0
    # explicit overwrite replaces it
    r = merge_indexes([src], victim, cfg, overwrite=True)
    assert r.n_docs > 0


# ---- compact adopts the windows' analyzer -----------------------------------


def test_cli_compact_adopts_window_tokenizer(ray_session, tmp_path, capsys):
    """compact with NO --tokenizer flag must adopt the windows'
    build-time analyzer (pre-fix: the 'code' default silently rebuilt
    simple-tokenized windows under the code tokenizer)."""
    from docinsight_ray.cli import main
    from docinsight_ray.pipelines.incremental import append_window

    cfg = EngineConfig(tokenizer="simple", num_buckets=4)
    root = str(tmp_path / "winroot")
    corpus = _mini_corpus()
    append_window(ray.data.from_arrow(corpus.slice(0, 2)), root, "a", cfg)
    append_window(ray.data.from_arrow(corpus.slice(2)), root, "b", cfg)
    rc = main(["compact", root, "--out-id", "all"])
    assert rc == 0
    capsys.readouterr()
    stats = json.load(open(os.path.join(root, "window=all", "corpus_stats.json")))
    assert stats["tokenizer"] == "simple"


def test_cli_validate_reports_canary_mismatch(stemmed_index, tmp_path, capsys):
    """CLI validate reports a term-hash canary mismatch as a problem
    (rc=1) instead of passing an index this host cannot serve."""
    import shutil

    from docinsight_ray.cli import main

    idx, _ = stemmed_index
    bad = str(tmp_path / "foreign_v")
    shutil.copytree(idx, bad)
    stats = json.loads(open(os.path.join(bad, "corpus_stats.json")).read())
    stats["term_hash_canary"] = "deadbeefdeadbeef"
    with open(os.path.join(bad, "corpus_stats.json"), "w") as f:
        json.dump(stats, f)
    rc = main(["validate", bad])
    out = json.loads(capsys.readouterr().out)
    assert rc == 1 and not out["ok"]
    assert any("canary mismatch" in p for p in out["problems"])
    # the untampered index still validates clean
    rc = main(["validate", idx])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0 and out["ok"]


def test_init_ray_cluster_address_branch(monkeypatch):
    """_init_ray passes num_cpus only when starting a LOCAL instance;
    a cluster address (e.g. 'auto' inside `ray job submit`) connects
    without per-driver resource args, which Ray rejects."""
    import ray

    from docinsight_ray import cli

    calls = []
    monkeypatch.setattr(ray, "is_initialized", lambda: False)
    monkeypatch.setattr(ray, "init", lambda **kw: calls.append(kw))
    monkeypatch.setenv("RAY_ADDRESS", "auto")
    cli._init_ray(8)
    assert calls[-1]["address"] == "auto" and "num_cpus" not in calls[-1]
    monkeypatch.setenv("RAY_ADDRESS", "local")
    cli._init_ray(8)
    assert calls[-1]["address"] == "local" and calls[-1]["num_cpus"] == 8
    monkeypatch.delenv("RAY_ADDRESS")
    cli._init_ray(None)
    assert calls[-1]["address"] == "local"


def test_cli_append_lifecycle(ray_session, tmp_path, capsys):
    """CLI append: fresh root gets window 000; a batch append assigns
    the next free ids, adopts the root's analyzer, and serving equals
    a single index over the concatenated corpora (same dedup)."""
    import numpy as np
    import pyarrow.parquet as pq_mod

    from docinsight_ray.cli import main
    from docinsight_ray.fixtures import gen_corpus
    from docinsight_ray.pipelines.incremental import query_windows
    from docinsight_ray.build import build_index

    corpus = gen_corpus(120, seed=91)
    c1, c2, c3 = (str(tmp_path / f"c{i}.parquet") for i in range(3))
    pq_mod.write_table(corpus.slice(0, 40), c1)
    pq_mod.write_table(corpus.slice(40, 40), c2)
    pq_mod.write_table(corpus.slice(80), c3)
    root = str(tmp_path / "root")

    assert main(["append", root, c1, "--tokenizer", "simple"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["appended"] == ["000"] and out["live_windows"] == ["window=000"]
    # batch append, analyzer adopted (no flag), ids continue
    assert main(["append", root, c2, c3]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["appended"] == ["001", "002"]
    stats = json.load(open(os.path.join(root, "window=001", "corpus_stats.json")))
    assert stats["tokenizer"] == "simple"
    # --window-id with multiple corpora is an error
    assert main(["append", root, c1, c2, "--window-id", "x"]) == 2
    capsys.readouterr()
    # re-using a committed window id is refused (pre-guard: build_index
    # saw a fingerprint mismatch and silently rebuilt over the window)
    assert main(["append", root, c1, "--window-id", "001"]) == 2
    assert "already committed" in capsys.readouterr().err
    stats_after = json.load(open(os.path.join(root, "window=001", "corpus_stats.json")))
    assert stats_after == stats  # untouched

    # serving equals one index over the union
    cfg = EngineConfig(tokenizer="simple")
    mono = str(tmp_path / "mono")
    build_index(ray.data.from_arrow(corpus), mono, cfg, fingerprint="mono")
    qtbl = pa.table({
        "query_id": pa.array([0], type=pa.int64()),
        "text": pa.array(["public static void"], type=pa.string()),
        "k": pa.array([10], type=pa.uint32()),
    })
    from docinsight_ray.scorer import query_index

    got = query_windows(ray.data.from_arrow(qtbl), root, cfg).to_pandas().sort_values("rank")
    want = query_index(ray.data.from_arrow(qtbl), mono, cfg).to_pandas().sort_values("rank")
    np.testing.assert_array_equal(got.doc_id.to_numpy(), want.doc_id.to_numpy())
    np.testing.assert_array_equal(got.score.to_numpy(), want.score.to_numpy())

    # --overwrite opts in to replacing a committed window (destructive,
    # so exercised after the serving-equality check above)
    assert main(["append", root, c3, "--window-id", "001", "--overwrite"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["appended"] == ["001"]
    replaced = json.load(open(os.path.join(root, "window=001", "corpus_stats.json")))
    assert replaced != stats  # genuinely rebuilt


def test_cli_stats_summary(stemmed_index, capsys):
    from docinsight_ray.cli import main

    idx, _ = stemmed_index
    assert main(["stats", idx]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["n_docs"] == 4 and out["tokenizer"] == "simple"
    assert out["postings_files"] > 0 and out["postings_bytes"] > 0
    assert "tokenize_docs" in out["stages"]
    assert main(["stats", "/nonexistent"]) == 2
