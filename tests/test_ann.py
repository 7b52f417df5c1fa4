"""Persisted IVF ANN index lifecycle tests."""

import os

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


@pytest.fixture(scope="module")
def ann_root(tmp_path_factory):
    import ray.data

    from docinsight_ray.pipelines.ann import build_ann_index

    root = str(tmp_path_factory.mktemp("ann")) + "/idx"
    ds = ray.data.read_parquet(os.path.join(SF, "embeddings.parquet"))
    stats = build_ann_index(ds, root, n_centroids=4)
    assert stats["n_vectors"] > 0 and stats["n_centroids"] == 4
    return root


def test_exhaustive_probe_equals_brute_force(ann_root):
    """nprobe = n_centroids must reproduce the exact brute-force kNN
    gate output byte-for-byte (same ranking, same round-6 cosines)."""
    import pyarrow.parquet as pq

    from docinsight_ray.functions.knn import KNN_K, N_QUERIES, q_knn_cosine
    from docinsight_ray.pipelines.ann import AnnIndex

    exact = q_knn_cosine(SF).to_pandas()

    t = pq.read_table(os.path.join(SF, "embeddings.parquet"))
    vids = t["vec_id"].to_numpy()
    mask = vids < N_QUERIES
    Q = np.stack(t["embedding"].to_numpy(zero_copy_only=False)[mask])
    idx = AnnIndex(ann_root, nprobe=4)
    got = (
        idx.topk(vids[mask].astype(np.int64), Q, KNN_K)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    exact = exact.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert got[["query_id", "rank", "vec_id"]].equals(
        exact[["query_id", "rank", "vec_id"]].astype("int64")
    )
    assert np.allclose(got["cos"], exact["cos"], atol=0)


def test_pruned_probe_recall_and_partition_prune(ann_root):
    """nprobe=2 of 4: recall above the scan-fraction floor AND the
    serving handle must load at most the probed lists (partition
    prune), never the whole index."""
    import pyarrow.parquet as pq

    from docinsight_ray.functions.knn import KNN_K, N_QUERIES, q_knn_cosine
    from docinsight_ray.pipelines.ann import AnnIndex

    t = pq.read_table(os.path.join(SF, "embeddings.parquet"))
    vids = t["vec_id"].to_numpy()
    mask = vids < N_QUERIES
    Q = np.stack(t["embedding"].to_numpy(zero_copy_only=False)[mask])

    idx = AnnIndex(ann_root, nprobe=2)
    got = idx.topk(vids[mask].astype(np.int64), Q, KNN_K).to_pandas()
    assert idx.lists_loaded <= 4  # ≤ union of probed lists, cached after
    exact = q_knn_cosine(SF).to_pandas()
    recalls = []
    for qid in exact["query_id"].unique():
        e = set(exact[exact.query_id == qid]["vec_id"])
        a = set(got[got.query_id == qid]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.3, f"IVF recall below scan floor: {recalls}"

    # single-query prune: a fresh handle touches exactly nprobe lists
    idx2 = AnnIndex(ann_root, nprobe=2)
    idx2.topk(np.array([int(vids[mask][0])]), Q[:1], KNN_K)
    assert idx2.lists_loaded == 2


def test_unbuilt_dir_raises_filenotfound(tmp_path):
    from docinsight_ray.pipelines.ann import AnnIndex

    with pytest.raises(FileNotFoundError, match="not a built ANN index"):
        AnnIndex(str(tmp_path / "nope"))


def test_rebuild_overwrites_and_uri_roundtrip(tmp_path):
    """Building twice into the same root works (overwrite semantics),
    and a file:// URI root serves identically to the plain path."""
    import ray.data

    from docinsight_ray.functions.knn import KNN_K, N_QUERIES
    from docinsight_ray.pipelines.ann import AnnIndex, build_ann_index

    ds = ray.data.read_parquet(os.path.join(SF, "embeddings.parquet"))
    root = str(tmp_path / "idx")
    build_ann_index(ds, root, n_centroids=4)
    build_ann_index(ds, root, n_centroids=4)  # overwrite, not append
    uri_root = "file://" + str(tmp_path / "idx_uri")
    build_ann_index(ds, uri_root, n_centroids=4)

    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(SF, "embeddings.parquet"))
    vids = t["vec_id"].to_numpy()
    mask = vids < N_QUERIES
    Q = np.stack(t["embedding"].to_numpy(zero_copy_only=False)[mask])
    a = AnnIndex(root, nprobe=4).topk(vids[mask].astype(np.int64), Q, KNN_K).to_pandas()
    b = AnnIndex(uri_root, nprobe=4).topk(vids[mask].astype(np.int64), Q, KNN_K).to_pandas()
    assert a.equals(b)
    # rebuild did not double rows: n_vectors lists hold each vec once
    n_served = a[a.query_id == a.query_id.iloc[0]]["vec_id"].nunique()
    assert n_served == KNN_K


def test_filtered_serving_and_unknown_column(ann_root):
    """In-list metadata filter: only allowed labels returned, equal to
    the brute-force filtered gate; filtering on a column the index
    doesn't store raises KeyError."""
    import pyarrow.parquet as pq

    from docinsight_ray.functions.knn import (
        KNN_FILTER_LABELS,
        KNN_K,
        N_QUERIES,
        q_knn_cosine_filtered,
    )
    from docinsight_ray.pipelines.ann import AnnIndex

    t = pq.read_table(os.path.join(SF, "embeddings.parquet"))
    vids = t["vec_id"].to_numpy()
    labels = dict(zip(vids.astype(int), t["label"].to_numpy().astype(int)))
    mask = vids < N_QUERIES
    Q = np.stack(t["embedding"].to_numpy(zero_copy_only=False)[mask])

    idx = AnnIndex(ann_root, nprobe=4)
    got = (
        idx.topk(vids[mask].astype(np.int64), Q, KNN_K,
                 vec_filter=("label", KNN_FILTER_LABELS))
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert all(labels[v] in KNN_FILTER_LABELS for v in got["vec_id"])
    exact = (
        q_knn_cosine_filtered(SF)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert got[["query_id", "rank", "vec_id"]].equals(
        exact[["query_id", "rank", "vec_id"]].astype("int64")
    )

    with pytest.raises(KeyError, match="not stored"):
        idx.topk(vids[mask].astype(np.int64), Q, KNN_K, vec_filter=("nope", (1,)))


def test_validate_ann_clean_and_corrupted(ann_root, tmp_path):
    """validate_ann_index passes on a clean index and names the
    violated invariant on a tampered one (row moved to a wrong list)."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from docinsight_ray.pipelines.ann import validate_ann_index

    rep = validate_ann_index(ann_root)
    assert rep["ok"] and rep["n_vectors"] == 500

    bad = str(tmp_path / "bad")
    shutil.copytree(ann_root, bad)
    # move the first row of list 0 into list 1 → misrouted + still
    # unique, so the routing check must fire
    import glob as g

    f0 = sorted(g.glob(os.path.join(bad, "lists", "cid=0", "*.parquet")))[0]
    f1 = sorted(g.glob(os.path.join(bad, "lists", "cid=1", "*.parquet")))[0]
    t0, t1 = pq.read_table(f0), pq.read_table(f1)
    pq.write_table(t0.slice(1), f0)
    pq.write_table(pa.concat_tables([t1, t0.slice(0, 1)]), f1)
    with pytest.raises(ValueError, match="non-argmax"):
        validate_ann_index(bad)

    # CLI hook: rc=1 + ok:false JSON on the corrupted root
    from docinsight_ray.cli import main

    assert main(["validate", bad]) == 1
    assert main(["validate", ann_root]) == 0


def test_append_then_exhaustive_equals_full_build(tmp_path):
    """Build on the first half, append the second: exhaustive serving
    must equal the exact brute force over the WHOLE table (appends use
    stored centroids; exhaustive probing is routing-independent), and
    validate passes with the summed n_vectors."""
    import ray.data

    from docinsight_ray.functions.knn import KNN_K, N_QUERIES, q_knn_cosine
    from docinsight_ray.pipelines.ann import (
        AnnIndex,
        append_ann_index,
        build_ann_index,
        validate_ann_index,
    )

    emb = os.path.join(SF, "embeddings.parquet")
    root = str(tmp_path / "inc")
    full = ray.data.read_parquet(emb)
    n = full.count()
    first = full.filter(expr=f"vec_id < {n // 2}")
    second = full.filter(expr=f"vec_id >= {n // 2}")
    build_ann_index(first, root, n_centroids=4)
    stats = append_ann_index(second, root)
    assert stats["n_vectors"] == n
    assert validate_ann_index(root)["n_vectors"] == n

    import pyarrow.parquet as pq

    t = pq.read_table(emb)
    vids = t["vec_id"].to_numpy()
    mask = vids < N_QUERIES
    Q = np.stack(t["embedding"].to_numpy(zero_copy_only=False)[mask])
    got = (
        AnnIndex(root, nprobe=4)
        .topk(vids[mask].astype(np.int64), Q, KNN_K)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    exact = q_knn_cosine(SF).to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert got[["query_id", "rank", "vec_id"]].equals(
        exact[["query_id", "rank", "vec_id"]].astype("int64")
    )


def test_serve_time_exclusion(ann_root):
    """exclude_vec_ids drops exactly the tombstoned vectors; survivors
    keep their relative order (scores unchanged)."""
    import pyarrow.parquet as pq

    from docinsight_ray.functions.knn import KNN_K, N_QUERIES
    from docinsight_ray.pipelines.ann import AnnIndex

    t = pq.read_table(os.path.join(SF, "embeddings.parquet"))
    vids = t["vec_id"].to_numpy()
    mask = vids < N_QUERIES
    Q = np.stack(t["embedding"].to_numpy(zero_copy_only=False)[mask])
    idx = AnnIndex(ann_root, nprobe=4)
    base = idx.topk(vids[mask].astype(np.int64), Q, KNN_K).to_pandas()
    # tombstone each query's current top hit
    dead = base[base["rank"] == 0]["vec_id"].to_numpy()
    got = idx.topk(
        vids[mask].astype(np.int64), Q, KNN_K, exclude_vec_ids=dead
    ).to_pandas()
    assert not set(dead) & set(got["vec_id"])
    for qid in base["query_id"].unique():
        b = base[(base.query_id == qid) & (~base.vec_id.isin(dead))]
        g = got[got.query_id == qid]
        m = min(len(b), len(g))
        assert b["vec_id"].head(m).tolist() == g["vec_id"].head(m).tolist()


# ---- IVF-PQ (code lists + ADC serving) -------------------------------------


@pytest.fixture(scope="module")
def ivfpq_root(tmp_path_factory):
    import ray.data

    from docinsight_ray.pipelines.ann import build_ivfpq_index

    root = str(tmp_path_factory.mktemp("ivfpq")) + "/idx"
    ds = ray.data.read_parquet(os.path.join(SF, "embeddings.parquet"))
    stats = build_ivfpq_index(ds, root, n_centroids=4, pq_m=8, pq_ks=32)
    assert stats["kind"] == "ivfpq" and stats["n_vectors"] > 0
    return root


def test_ivfpq_exhaustive_full_fetch_equals_brute_force(ivfpq_root):
    """nprobe = n_centroids + fetch_k = n_vectors: the exact rescore
    sees every vector, so the full lifecycle (train → encode →
    partitioned write → lazy ADC serving → rescore) must reproduce
    the exact kNN gate byte-for-byte (this identity is the gate
    ann_ivfpq_topk's full SQL oracle)."""
    from docinsight_ray.functions.knn import q_knn_cosine
    from docinsight_ray.pipelines.ann import ivfpq_search

    exact = (
        q_knn_cosine(SF)
        .to_pandas()[["query_id", "rank", "vec_id", "cos"]]
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
        .astype({"query_id": "int64", "rank": "int64", "vec_id": "int64"})
    )
    got = (
        ivfpq_search(SF, ivfpq_root, nprobe=4, fetch_k=10**9)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert got.equals(exact)


def test_ivfpq_pruned_recall_and_partition_prune(ivfpq_root):
    """Pruned config (nprobe=2/4, fetch_k=5k): candidate recall above
    the scan floor; list loads bounded by the probed union; the
    rescored sliver's scores are exact (subset of the exact gate)."""
    from docinsight_ray.functions.knn import KNN_K, q_knn_cosine
    from docinsight_ray.pipelines.ann import IvfPqIndex, ivfpq_search

    got = ivfpq_search(SF, ivfpq_root, nprobe=2, fetch_k=5 * KNN_K).to_pandas()
    exact = q_knn_cosine(SF).to_pandas()
    recalls = []
    for qid in exact["query_id"].unique():
        e = set(exact[exact.query_id == qid]["vec_id"])
        a = set(got[got.query_id == qid]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.3, f"IVF-PQ recall below scan floor: {recalls}"
    # surviving candidates carry EXACT scores
    merged = got.merge(exact, on=["query_id", "vec_id"], suffixes=("", "_e"))
    assert np.allclose(merged["cos"], merged["cos_e"], atol=0)
    # partition prune on the handle itself
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(SF, "embeddings.parquet"))
    vids = t["vec_id"].to_numpy()
    mask = vids < 5
    Q = np.stack(t["embedding"].to_numpy(zero_copy_only=False)[mask])
    idx = IvfPqIndex(ivfpq_root, nprobe=2)
    idx.candidates(vids[mask].astype(np.int64), Q, 50)
    assert idx.lists_loaded <= 4


def test_ivfpq_validate_and_kind_guards(ivfpq_root, ann_root):
    """validate dispatches on kind; serving handles reject the wrong
    index kind loudly."""
    from docinsight_ray.pipelines.ann import AnnIndex, IvfPqIndex, validate_ann_index

    v = validate_ann_index(ivfpq_root)
    assert v["ok"] and v["kind"] == "ivfpq" and v["pq_m"] == 8
    with pytest.raises(ValueError, match="IVF-PQ"):
        AnnIndex(ivfpq_root)
    with pytest.raises(ValueError, match="not an IVF-PQ"):
        IvfPqIndex(ann_root)


def test_ivfpq_filtered_candidates(ivfpq_root):
    """Metadata passthrough: an in-list label predicate restricts the
    candidate universe exactly (every returned vec_id has an allowed
    label), same contract as the float-list filtered serving."""
    import pyarrow.parquet as pq

    from docinsight_ray.functions.knn import KNN_FILTER_LABELS
    from docinsight_ray.pipelines.ann import ivfpq_search

    got = ivfpq_search(
        SF, ivfpq_root, nprobe=4, fetch_k=10**9,
        vec_filter=("label", KNN_FILTER_LABELS),
    ).to_pandas()
    t = pq.read_table(os.path.join(SF, "embeddings.parquet"), columns=["vec_id", "label"])
    lbl = dict(zip(t["vec_id"].to_pylist(), t["label"].to_pylist()))
    assert got.shape[0] > 0
    assert all(lbl[v] in KNN_FILTER_LABELS for v in got["vec_id"])


def test_ivfpq_append_then_exhaustive_equals_brute_force(tmp_path):
    """IVF-PQ append: build on the first half, append the second with
    the STORED centroids + codebooks; exhaustive full-fetch serving
    (rescore sees every vector) must equal the exact kNN gate, and
    the ivfpq validator passes with the summed n_vectors."""
    import ray.data

    from docinsight_ray.functions.knn import q_knn_cosine
    from docinsight_ray.pipelines.ann import (
        append_ann_index,
        build_ivfpq_index,
        ivfpq_search,
        validate_ann_index,
    )

    emb = os.path.join(SF, "embeddings.parquet")
    root = str(tmp_path / "incpq")
    full = ray.data.read_parquet(emb)
    n = full.count()
    build_ivfpq_index(full.filter(expr=f"vec_id < {n // 2}"), root, n_centroids=4)
    stats = append_ann_index(full.filter(expr=f"vec_id >= {n // 2}"), root)
    assert stats["kind"] == "ivfpq" and stats["n_vectors"] == n
    assert validate_ann_index(root)["n_vectors"] == n

    got = (
        ivfpq_search(SF, root, nprobe=4, fetch_k=10**9)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    exact = (
        q_knn_cosine(SF).to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    assert got[["query_id", "rank", "vec_id"]].equals(
        exact[["query_id", "rank", "vec_id"]].astype("int64")
    )


def test_ivfpq_serve_time_exclusion(ivfpq_root):
    """exclude_vec_ids drops exactly the tombstoned vectors from the
    ADC candidate stream; no excluded id ever surfaces."""
    import pyarrow.parquet as pq

    from docinsight_ray.pipelines.ann import IvfPqIndex

    t = pq.read_table(os.path.join(SF, "embeddings.parquet"))
    vids = t["vec_id"].to_numpy()
    mask = vids < 5
    Q = np.stack(t["embedding"].to_numpy(zero_copy_only=False)[mask])
    idx = IvfPqIndex(ivfpq_root, nprobe=4)
    base = idx.candidates(vids[mask].astype(np.int64), Q, 20).to_pandas()
    dead = base["vec_id"].to_numpy()[:8]
    got = idx.candidates(
        vids[mask].astype(np.int64), Q, 20, exclude_vec_ids=dead
    ).to_pandas()
    assert not set(got["vec_id"]) & set(dead)
    # survivors keep their approximate scores (exclusion only filters)
    m = base[~base.vec_id.isin(dead)].merge(got, on=["query_id", "vec_id"])
    assert np.allclose(m["acos_x"], m["acos_y"], atol=0)
