"""WORKING repro for the Ray 2.49 row re-pairing hazard (ROADMAP.md §6b).

Reproduces intermittently (observed 10-60% per invocation depending on
machine state; always with the row re-pairing signature):

    cp scripts/repro_row_repair.py /tmp/r/test_repair.py
    cp tests/conftest.py /tmp/r/conftest.py
    cd /tmp/r && for i in $(seq 8); do PYTHONPATH=/root/repo python -m pytest test_repair.py -q | tail -1; done

Structure: test 1 runs the exact-ngram AND minhash-LSH dedup pipelines
(BOTH required — either alone is 6/6 clean); test 2 then runs a
map_batches job whose output has exactly two fixed-width columns
(int64 doc_id, uint64 simhash) twice and compares. Failing runs return
rows re-paired: each wrong value is another row's correct value
(verified earlier by reverse lookup). Adding any variable-width column
to the victim's output suppresses the bug (production mitigation).

Bisection so far: victim collection path irrelevant (collect_table and
iter_batches both affected); nothing needs to run between the two
victim executions; the simplified single-pipeline warmups in the git
history of this file do NOT trigger it.
"""
import sys

import numpy as np
import pandas as pd
import pyarrow as pa

sys.path.insert(0, "/root/repo")
SF = "/root/testdata/sf0.001"


def q_simhash_2col(sf_dir):
    """Current q_simhash64 minus the provenance column."""
    import ray.data

    from docinsight_ray.collect import collect_table
    from docinsight_ray.functions.dedup import _TOKEN_RE, _read_documents

    def simhash(batch: pa.Table) -> pa.Table:
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
             "simhash": pa.array(out, type=pa.uint64())}
        )

    return collect_table(_read_documents(sf_dir).map_batches(simhash, batch_format="pyarrow"))


def test_minhash_like(ray_session):
    # BOTH pipelines required — either alone leaves 6/6 clean
    from docinsight_ray.functions.dedup import q_minhash_lsh_pairs, q_ngram_jaccard_pairs

    exact = q_ngram_jaccard_pairs(SF).to_pandas()
    lsh = q_minhash_lsh_pairs(SF).to_pandas()


def test_simhash_like(ray_session):
    from docinsight_ray.functions.dedup import q_ngram_jaccard_pairs
    from docinsight_ray.fixtures import gen_corpus

    sh = dict(zip(*[q_simhash_2col(SF).to_pandas()[c] for c in ["doc_id", "simhash"]]))
    sh2 = dict(zip(*[q_simhash_2col(SF).to_pandas()[c] for c in ["doc_id", "simhash"]]))
    diff = [k for k in sh if sh[k] != sh2[k]]
    assert not diff, f"REPAIRED ROWS: {len(diff)}, e.g. {diff[:6]}"
