"""Round-2 WIP: minimal repro harness for the Ray 2.49 row re-pairing
(ROADMAP.md §6b). Run as a pytest file from any dir with
PYTHONPATH=/root/repo (ray_session fixture from tests/conftest.py):

    cp scripts/repro_row_repair.py /tmp/r/test_repair.py
    cp tests/conftest.py /tmp/r/conftest.py
    cd /tmp/r && for i in $(seq 8); do PYTHONPATH=/root/repo python -m pytest test_repair.py -q | tail -1; done

Round-1 status: does NOT yet reproduce (5 configurations x 6-8 runs all
clean) even though the original two-test recipe failed 40-100% of runs
before mitigation. Configurations tried: synthetic groupby warmup; real
dedup-pipeline warmup; failing-era materialize()-and-drop warmup;
victim = exact pre-fix simhash body; victim collected via collect_table
AND via failing-era iter_batches+concat. Something about the original
test module (import set? fixture interplay? accumulated session state
from earlier test files?) is still missing. Next lever: bisect the
REAL tests/test_functions.py by deleting code until the flake stops.
"""

import sys

import numpy as np
import pandas as pd
import pyarrow as pa

sys.path.insert(0, "/root/repo")
SF = "/root/testdata/sf0.001"
TRUTH = {}


import re
_TOKEN_RE = re.compile(r"[a-z0-9]+")


def _hashes(batch: pa.Table) -> pa.Table:
    # exact pre-fix simhash body (2 fixed-width output columns)
    out = np.empty(batch.num_rows, dtype=np.uint64)
    for i, text in enumerate(batch["text"].to_pylist()):
        toks = _TOKEN_RE.findall(text.lower())
        if not toks:
            out[i] = 0
            continue
        uniq, tf = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        h = pd.util.hash_array(uniq)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
        acc = ((2 * bits - 1) * tf[:, None].astype(np.int64)).sum(axis=0)
        out[i] = np.bitwise_or.reduce((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64))
    return pa.table(
        {"doc_id": pa.array(batch["doc_id"], type=pa.int64()),
         "val": pa.array(out, type=pa.uint64())}
    )


def _run():
    import ray.data

    # failing-era collection: zero-copy batches concatenated
    return pa.concat_tables(list(
        ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(_hashes, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    )).to_pandas()


def test_a_warmup(ray_session):
    # the exact churn the real failures followed
    import ray.data
    from ray.data.aggregate import Count

    from docinsight_ray.functions.dedup import _shingle_rows, q_minhash_lsh_pairs

    # failing-era ngram pipeline shape: shingle explode MATERIALIZED
    # (pinned in plasma), consumed twice, then dropped for async GC
    ds = (ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
          .map_batches(_shingle_rows, batch_format="pyarrow").materialize())
    ds.groupby("shingle").aggregate(Count(alias_name="n")).to_pandas()
    ds.groupby("doc_id").aggregate(Count(alias_name="n")).to_pandas()
    del ds
    q_minhash_lsh_pairs(SF)
    df = _run()
    for d, v in zip(df["doc_id"], df["val"]):
        TRUTH[int(d)] = int(v)


def test_b_check(ray_session):
    df = _run()
    bad = [int(d) for d, v in zip(df["doc_id"], df["val"]) if TRUTH[int(d)] != int(v)]
    assert not bad, f"ROW-REPAIR: {len(bad)} rows re-paired, e.g. {bad[:6]}"
