"""Persisted tokenizer artifacts: save → verify-load → identical
encoding; corruption fails loudly."""

import json
import os

import pytest

from docinsight_ray.functions.tokenizer_store import (
    TOK_STATS,
    VOCAB_FILE,
    load_tokenizer,
    save_tokenizer,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def test_bpe_roundtrip_identical_encoding(tmp_path):
    from docinsight_ray.functions.bpe import _merges_for, encode_word, merge_ranks

    d = str(tmp_path / "bpe")
    stats = save_tokenizer(SF, d, algo="bpe", fingerprint="t")
    assert stats["algo"] == "bpe" and stats["n_rows"] > 0
    algo, ranks = load_tokenizer(d)
    assert algo == "bpe"
    fresh = merge_ranks(_merges_for(SF))
    assert ranks == fresh
    for w in ("scanner", "windowsort", "tablestream"):
        assert encode_word(w, ranks) == encode_word(w, fresh)


def test_unigram_roundtrip_identical_encoding(tmp_path):
    from docinsight_ray.functions.unigram import _vocab_for, viterbi

    d = str(tmp_path / "uni")
    stats = save_tokenizer(SF, d, algo="unigram", fingerprint="t")
    assert stats["algo"] == "unigram"
    algo, vocab = load_tokenizer(d)
    assert algo == "unigram"
    fresh = _vocab_for(SF)
    assert [p for p, _ in vocab] == [p for p, _ in fresh]
    lp_loaded, lp_fresh = dict(vocab), dict(fresh)
    for w in ("scanner", "windowsort", "tablestream"):
        assert viterbi(w, lp_loaded) == viterbi(w, lp_fresh)


def test_corruption_and_missing_fail_loudly(tmp_path):
    d = str(tmp_path / "bpe2")
    save_tokenizer(SF, d, algo="bpe")
    # truncate the vocab file behind the sidecar's back
    p = os.path.join(d, VOCAB_FILE)
    import pyarrow.parquet as pq

    t = pq.read_table(p)
    pq.write_table(t.slice(0, t.num_rows - 1), p)
    with pytest.raises(ValueError, match="checksum"):
        load_tokenizer(d)
    with pytest.raises(FileNotFoundError):
        load_tokenizer(str(tmp_path / "nothere"))
    with pytest.raises(ValueError, match="algo"):
        save_tokenizer(SF, str(tmp_path / "x"), algo="wordpiece")


def test_cli_tokbuild(tmp_path, capsys):
    from docinsight_ray.cli import main

    d = str(tmp_path / "cli_tok")
    assert main(["tokbuild", SF, d, "--algo", "unigram"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["algo"] == "unigram" and out["n_rows"] > 0
    assert os.path.exists(os.path.join(d, TOK_STATS))


def test_cli_validate_tokenizer_dir(tmp_path, capsys):
    from docinsight_ray.cli import main

    d = str(tmp_path / "vtok")
    save_tokenizer(SF, d, algo="bpe")
    assert main(["validate", d]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["ok"] and rep["algo"] == "bpe"
    # corrupt → rc 1 naming the problem
    import pyarrow.parquet as pq

    p = os.path.join(d, VOCAB_FILE)
    t = pq.read_table(p)
    pq.write_table(t.slice(0, t.num_rows - 1), p)
    assert main(["validate", d]) == 1
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert not rep["ok"] and "checksum" in rep["error"]
