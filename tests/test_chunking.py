import pytest

SF = "/root/testdata/sf0.001"


def test_chunk_windows_cover_text(ray_session):
    from docinsight_ray.functions.chunking import CHUNK_SIZE, CHUNK_STRIDE, q_chunk_docs

    t = q_chunk_docs(SF).to_pandas()
    assert (t["char_count"] <= CHUNK_SIZE).all()
    # ordinals dense from 0 per doc
    for did, g in t.groupby("doc_id"):
        assert sorted(g["ordinal"]) == list(range(len(g)))


def test_word_boundary_chunking(ray_session):
    from docinsight_ray.functions.chunking import CHUNK_SIZE, chunk_docs_word_boundary

    t = chunk_docs_word_boundary(SF).to_pandas()
    assert (t["char_count"] <= CHUNK_SIZE).all()
    # word-boundary: chunks that were shortened end cleanly (no split words
    # except when no space was available); reconstruction covers the text
    import pyarrow.parquet as pq

    texts = dict(
        zip(*[pq.read_table(f"{SF}/documents.parquet").to_pandas()[c] for c in ["doc_id", "text"]])
    )
    for did, g in t.groupby("doc_id"):
        joined = "".join(g.sort_values("ordinal")["chunk_text"])
        assert texts[int(did)].startswith(joined[:50])


def test_source_registry(ray_session):
    from docinsight_ray.sources.registry import open_source

    ds = open_source("parquet", f"{SF}/documents.parquet")
    assert ds.count() == 500
    ds2 = open_source("synthetic", "", n_docs=50, with_cases=False)
    assert ds2.count() == 50
    with pytest.raises(ValueError, match="unknown source format"):
        open_source("avro", "x")
