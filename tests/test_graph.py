"""Connected-components (alternating star contraction) tests."""

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def _uf_labels(n_nodes: list[int], edges: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find reference: node -> component min."""
    parent = {v: v for v in n_nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    return {v: find(v) for v in n_nodes}


def _cc_labels(edges: list[tuple[int, int]]) -> dict[int, int]:
    import ray.data

    from docinsight_ray.functions.graph import _checked_uv, _edge_table, connected_components

    u = np.array([a for a, _ in edges], dtype=np.int64)
    v = np.array([b for _, b in edges], dtype=np.int64)
    ds = ray.data.from_arrow(_edge_table(u, v))
    stars = connected_components(ds)
    from docinsight_ray.collect import collect_table

    t = collect_table(stars)
    if t.num_rows == 0:
        return {}
    su, sv = _checked_uv(t)
    return dict(zip(su.tolist(), sv.tolist()))


def test_cc_matches_union_find_random_graph():
    """Random sparse graph (plus chains, a cycle, isolated pairs):
    star labels equal union-find component minima for every non-root
    node, and no root appears as a source."""
    rng = np.random.default_rng(7)
    nodes = list(range(0, 400, 3))  # sparse ids, not contiguous
    edges = set()
    for _ in range(150):
        a, b = rng.choice(nodes, size=2, replace=False)
        edges.add((int(a), int(b)))
    # a long chain forces multi-round contraction
    chain = list(range(1000, 1030))
    edges |= {(chain[i], chain[i + 1]) for i in range(len(chain) - 1)}
    # an explicit cycle
    edges |= {(2000, 2001), (2001, 2002), (2002, 2000)}
    edges = sorted(edges)

    touched = sorted({x for e in edges for x in e})
    ref = _uf_labels(touched, edges)
    got = _cc_labels(edges)

    for v in touched:
        root = ref[v]
        if v == root:
            assert v not in got, f"root {v} must not be relabeled"
        else:
            assert got.get(v) == root, f"node {v}: got {got.get(v)}, want {root}"


def test_cc_empty_and_single_edge():
    assert _cc_labels([]) == {}
    assert _cc_labels([(5, 9)]) == {9: 5}


def test_edge_provenance_check_fires():
    """A re-paired (u, v) row must be detected by the ck column."""
    from docinsight_ray.functions.graph import _checked_uv, _edge_table

    t = _edge_table(np.array([1, 2], dtype=np.int64), np.array([3, 4], dtype=np.int64))
    # simulate transport re-pairing: swap the v column rows
    bad = pa.table({"u": t["u"], "v": t["v"].take([1, 0]), "ck": t["ck"]})
    with pytest.raises(AssertionError, match="re-paired"):
        _checked_uv(bad)
    # the clean table passes
    u, v = _checked_uv(t)
    assert u.tolist() == [1, 2] and v.tolist() == [3, 4]


def test_dup_clusters_consistent_with_near_dup_pairs():
    """Gate-level invariants on the fixture: every near-dup pair lands
    in one cluster; every cluster id is the min of its members; rows
    cover the whole embeddings table exactly once."""
    import os

    import pyarrow.parquet as pq

    from docinsight_ray.functions.graph import q_dup_clusters
    from docinsight_ray.functions.knn import q_embedding_near_dup

    labels = q_dup_clusters(SF, tile_rows=64).to_pandas()
    pairs = q_embedding_near_dup(SF, tile_rows=64).to_pandas()

    n = pq.read_metadata(os.path.join(SF, "embeddings.parquet")).num_rows
    assert len(labels) == n
    assert labels["vec_id"].is_unique

    lab = dict(zip(labels["vec_id"], labels["cluster_id"]))
    for a, b in pairs[["a_id", "b_id"]].itertuples(index=False):
        assert lab[a] == lab[b], f"near-dup pair ({a},{b}) split across clusters"
    by_cluster = labels.groupby("cluster_id")["vec_id"].min()
    assert (by_cluster.index == by_cluster.values).all()


def test_distributed_cc_matches_driver_union_find_on_text_pairs():
    """The distributed star contraction and dedup.py's driver-side
    union-find must agree on the text near-dup pair graph — same
    cluster id (component min) for every clustered doc."""
    import ray.data

    from docinsight_ray.collect import collect_table
    from docinsight_ray.functions.dedup import q_dup_clusters as q_text_clusters
    from docinsight_ray.functions.dedup import q_ngram_jaccard_pairs
    from docinsight_ray.functions.graph import _checked_uv, _edge_table, connected_components

    pairs = q_ngram_jaccard_pairs(SF).to_pandas()
    ref = q_text_clusters(SF).to_pandas()

    edges = ray.data.from_arrow(
        _edge_table(
            pairs["a_id"].to_numpy(dtype=np.int64), pairs["b_id"].to_numpy(dtype=np.int64)
        )
    )
    t = collect_table(connected_components(edges))
    su, sv = _checked_uv(t) if t.num_rows else (np.array([], dtype=np.int64),) * 2
    got = dict(zip(su.tolist(), sv.tolist()))

    clustered = ref[ref["cluster_id"] != ref["doc_id"]]
    assert len(got) == len(clustered)
    for d, c in clustered[["doc_id", "cluster_id"]].itertuples(index=False):
        assert got.get(int(d)) == int(c)


def test_dup_clusters_distributed_path_identical(monkeypatch):
    """Forcing the distributed-CC labeling (pair limit 0) must give the
    byte-identical dup_clusters gate output as the driver union-find."""
    import docinsight_ray.functions.dedup as dd

    ref = dd.q_dup_clusters(SF).to_pandas()
    monkeypatch.setattr(dd, "CC_DRIVER_PAIR_LIMIT", -1)
    got = dd.q_dup_clusters(SF).to_pandas()
    assert ref.equals(got)
