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

Round-3 bisection results (REPRO=min warmup below):
- The two-pipeline warmup can be replaced by a much smaller one: ONE
  actor-pool ``map_batches`` stage (``concurrency=2``, 3 fixed-width
  output columns) followed by ONE downstream task ``map_batches``,
  consumed via ``to_pandas`` — fires 7-8/8 against the repo victim,
  STRONGER than the original two-pipeline warmup (~6/8).
- A pure task-map warmup (no actor pool) or the actor stage alone
  without a downstream task map fires rarely or not at all; the
  persistent actor worker processes + one task hop are the key
  warmup ingredients.
- The VICTIM resists standalone reduction: a repo-free clone matching
  the repo victim's tokenizer (_TOKEN_RE), read projection
  (columns=["doc_id","text"]), collection (to_arrow_refs + IPC
  deep-copy), and output schema ran 8/8 CLEAN across four variants
  (/tmp/r6b/test_min2..5 in round 3) while the in-repo victim kept
  firing under the same warmup. The remaining untested delta is that
  the repo victim's lambda closes over the installed package (workers
  import docinsight_ray), i.e. worker import/allocation timing —
  consistent with a timing/layout-sensitive transport bug, not an
  input-data or hashing issue.
- Production mitigation unchanged and sufficient: every 2-fixed-width
  column result carries a variable-width provenance column
  (content_sha8), which suppresses the re-pairing completely, plus
  collect_table()'s deep-copy collection.

Run the minimized variant with REPRO=min:
    REPRO=min python -m pytest test_repair.py -q
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


class _MinWarmupActor:
    """Minimal actor-pool stage (round-3 minimized warmup)."""

    def __init__(self):
        self.perm = np.random.default_rng(7).integers(1, 2**61, size=8, dtype=np.uint64)

    def __call__(self, t: pa.Table) -> pa.Table:
        out_id, out_band, out_key = [], [], []
        for d, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            ws = list({w for w in x.lower().split()})
            h = pd.util.hash_array(np.asarray(ws, dtype=object)) if ws else np.array([0], dtype=np.uint64)
            mins = np.minimum.reduce([(h * p) % np.uint64(2**61 - 1) for p in self.perm])
            for b in range(4):
                out_id.append(d)
                out_band.append(b)
                out_key.append(int(mins.min()) & ((1 << 58) - 1))
        return pa.table(
            {"doc_id": pa.array(out_id, type=pa.int64()),
             "band_id": pa.array(out_band, type=pa.uint64()),
             "band_key": pa.array(out_key, type=pa.uint64())}
        )


def _min_warmup_tail(t: pa.Table) -> pa.Table:
    bid = t["band_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
    bkey = t["band_key"].to_numpy(zero_copy_only=False).astype(np.uint64)
    key = (bkey << np.uint64(6)) | bid
    return pa.table(
        {"key": pa.array(key, type=pa.uint64()),
         "doc_id": t["doc_id"],
         "bucket": pa.array((key % np.uint64(16)).astype(np.int32), type=pa.int32())}
    )


def test_minhash_like(ray_session):
    import os

    if os.environ.get("REPRO") == "min":
        # Round-3 minimized warmup: one actor-pool stage + one task map.
        import ray.data

        (ray.data.read_parquet(SF + "/documents.parquet")
            .map_batches(_MinWarmupActor, batch_format="pyarrow", concurrency=2)
            .map_batches(_min_warmup_tail, batch_format="pyarrow")
            .to_pandas())
        return
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
