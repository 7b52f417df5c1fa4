"""Safe driver-side collection of a Dataset into one Arrow table.

``pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))``
keeps ZERO-COPY references into Ray object-store (plasma) memory; once
iteration finishes the backing objects can be unpinned/evicted and the
table silently reads reused memory — observed as nondeterministic
value corruption under object-store churn (the simhash flake hunted in
round 1). ``collect_table`` deep-copies every batch through an Arrow
IPC round-trip while the iterator still pins it, so the returned table
owns fresh heap buffers with the exact original schema.

Only for result-sized datasets (the driver-gate outputs); large data
should flow through write_parquet, never the driver.
"""

from __future__ import annotations

import pyarrow as pa


def deep_copy_table(t: pa.Table) -> pa.Table:
    """Copy an Arrow table into freshly allocated buffers (exact schema)."""
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, t.schema) as w:
        w.write_table(t)
    return pa.ipc.open_stream(sink.getvalue()).read_all()


def collect_table(ds, empty_schema: pa.Schema | None = None) -> pa.Table:
    """Materialize a (small) Dataset as one driver-owned Arrow table.

    Fetches whole BLOCKS via ``to_arrow_refs`` rather than going
    through ``iter_batches``: in round 1 the batcher path intermittently
    permuted one column's chunks relative to the others under
    object-store churn (rows silently re-paired — caught by a flaky
    simhash determinism test). Blocks are deep-copied while their refs
    are in scope."""
    import ray

    tables = [deep_copy_table(t) for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    if not tables:
        return empty_schema.empty_table() if empty_schema is not None else pa.table({})
    return pa.concat_tables(tables)
