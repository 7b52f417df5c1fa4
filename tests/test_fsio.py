"""state/fsio.py unit behavior: atomicity artifacts, URI/plain parity."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from docinsight_ray.state.fsio import (
    exists,
    glob_parquet,
    listdir_count,
    listdir_names,
    makedirs,
    read_bytes,
    read_parquet_files,
    remove_path,
    rmtree,
    write_bytes_atomic,
    write_parquet_atomic,
)

TBL = pa.table({"a": pa.array([1, 2, 3], type=pa.int64()), "b": ["x", "y", "z"]})


def _roundtrip(root: str):
    makedirs(os.path.join(root, "d"))
    n = write_parquet_atomic(TBL, os.path.join(root, "d", "t.parquet"))
    assert n > 0
    write_bytes_atomic(os.path.join(root, "d", "m.json"), b'{"k": 1}')
    assert read_bytes(os.path.join(root, "d", "m.json")) == b'{"k": 1}'
    assert read_bytes(os.path.join(root, "d", "missing.json")) is None
    assert exists(os.path.join(root, "d", "t.parquet"))
    assert not exists(os.path.join(root, "nope"))
    files = read_parquet_files(os.path.join(root, "d"))
    assert len(files) == 1 and files[0].endswith("t.parquet")
    assert glob_parquet(root) == files
    assert listdir_count(os.path.join(root, "d")) == 2
    assert set(listdir_names(os.path.join(root, "d"))) == {"t.parquet", "m.json"}
    got = pq.read_table(files[0])
    assert got.equals(TBL)
    remove_path(os.path.join(root, "d", "m.json"))
    assert not exists(os.path.join(root, "d", "m.json"))
    rmtree(os.path.join(root, "d"))
    assert listdir_count(os.path.join(root, "d")) == 0


def test_plain_path_roundtrip(tmp_path):
    _roundtrip(str(tmp_path / "plain"))


def test_file_uri_roundtrip(tmp_path):
    _roundtrip(f"file://{tmp_path}/uri")


def test_crash_leftovers_invisible_to_dataset_discovery(tmp_path):
    """A writer's tmp file (simulated crash leftover) must be ignored
    by pyarrow dataset reads of the directory — the dot prefix is the
    contract."""
    d = str(tmp_path / "frag")
    makedirs(d)
    write_parquet_atomic(TBL, os.path.join(d, "good.parquet"))
    # simulate the crash: a half-written tmp with the atomic writers'
    # naming scheme next to the good file
    with open(os.path.join(d, ".good.parquet.deadbeef.tmp"), "wb") as f:
        f.write(b"NOT A PARQUET FILE")
    got = pq.read_table(d)  # directory-level dataset read
    assert got.num_rows == TBL.num_rows
    # and the explicit listings skip it too
    assert all(".tmp" not in f for f in read_parquet_files(d))
    assert all(".tmp" not in f for f in glob_parquet(d))


def test_write_is_atomic_under_reader(tmp_path):
    """After write_parquet_atomic returns, the destination is complete;
    before it returns, the destination either doesn't exist or is the
    previous complete version (no torn intermediate with the final
    name)."""
    d = str(tmp_path / "atomic")
    makedirs(d)
    dest = os.path.join(d, "t.parquet")
    write_parquet_atomic(TBL, dest)
    v1 = pq.read_table(dest)
    bigger = pa.concat_tables([TBL] * 100)
    write_parquet_atomic(bigger, dest)
    v2 = pq.read_table(dest)
    assert v1.num_rows == 3 and v2.num_rows == 300
    # no stray tmp files remain
    assert listdir_names(d) == ["t.parquet"]


def test_incremental_snapshot_skips_unchanged_and_gcs_stale(tmp_path):
    """Second snapshot into the same repository re-uploads only changed
    files (ES incremental semantics), GCs files dropped from the
    source, and restore reproduces the CURRENT tree exactly."""
    import json
    import os

    from docinsight_ray.state.snapshot import (
        restore_index,
        snapshot_index,
        verify_snapshot,
    )

    src = tmp_path / "tree"
    src.mkdir()
    (src / "a.bin").write_bytes(b"alpha" * 100)
    (src / "b.bin").write_bytes(b"bravo" * 100)
    (src / "sub").mkdir()
    (src / "sub" / "c.bin").write_bytes(b"charlie")
    repo = str(tmp_path / "repo")
    m1 = snapshot_index(str(src), repo)
    assert m1["n_files"] == 3 and m1["n_skipped_unchanged"] == 0

    (src / "b.bin").write_bytes(b"BRAVO2")          # changed
    os.remove(src / "sub" / "c.bin")                 # dropped
    (src / "d.bin").write_bytes(b"delta")            # new
    m2 = snapshot_index(str(src), repo)
    assert m2["n_files"] == 3 and m2["n_skipped_unchanged"] == 1  # only a.bin
    assert not os.path.exists(os.path.join(repo, "sub", "c.bin"))  # GC'd
    assert verify_snapshot(repo)["ok"]

    dest = str(tmp_path / "restored")
    r = restore_index(repo, dest)
    assert r["ok"] and r["n_files"] == 3
    assert open(os.path.join(dest, "b.bin"), "rb").read() == b"BRAVO2"
    assert open(os.path.join(dest, "d.bin"), "rb").read() == b"delta"
    assert not os.path.exists(os.path.join(dest, "sub", "c.bin"))

    # incremental=False forces a full re-upload
    m3 = snapshot_index(str(src), repo, incremental=False)
    assert m3["n_skipped_unchanged"] == 0 and verify_snapshot(repo)["ok"]


def test_incremental_snapshot_heals_externally_deleted_repo_file(tmp_path):
    """A repo file deleted behind the manifest's back is re-uploaded on
    the next incremental snapshot (not skipped on manifest evidence
    alone), so the snapshot verifies clean without --verify."""
    import os

    from docinsight_ray.state.snapshot import snapshot_index, verify_snapshot

    src = tmp_path / "tree"
    src.mkdir()
    (src / "a.bin").write_bytes(b"alpha" * 50)
    (src / "b.bin").write_bytes(b"bravo" * 50)
    repo = str(tmp_path / "repo")
    snapshot_index(str(src), repo)
    os.remove(os.path.join(repo, "a.bin"))  # external corruption
    m = snapshot_index(str(src), repo)
    assert m["n_skipped_unchanged"] == 1  # only the intact b.bin
    assert os.path.exists(os.path.join(repo, "a.bin"))
    assert verify_snapshot(repo)["ok"]


def test_incremental_snapshot_property(tmp_path):
    """Property: after ANY sequence of tree mutations, an incremental
    snapshot verifies clean and restores exactly the current tree."""
    import os

    from hypothesis import given, settings, strategies as st

    from docinsight_ray.state.snapshot import (
        restore_index,
        snapshot_index,
        verify_snapshot,
    )

    names = st.sampled_from(["a", "b", "sub/c", "sub/d", "e"])
    ops = st.lists(
        st.tuples(names, st.one_of(st.none(), st.binary(min_size=0, max_size=64))),
        min_size=1, max_size=6,
    )
    counter = [0]

    @settings(max_examples=15, deadline=None)
    @given(steps=st.lists(ops, min_size=1, max_size=3))
    def run(steps):
        counter[0] += 1
        root = tmp_path / f"case{counter[0]}"
        src, repo = root / "src", str(root / "repo")
        src.mkdir(parents=True)
        (src / "seed").write_bytes(b"seed")
        for batch in steps:
            for rel, data in batch:
                p = src / rel
                if data is None:
                    if p.exists():
                        os.remove(p)
                else:
                    p.parent.mkdir(parents=True, exist_ok=True)
                    p.write_bytes(data)
            if not any(f.is_file() for f in src.rglob("*")):
                (src / "seed").write_bytes(b"seed")  # never empty
            snapshot_index(str(src), repo)
            assert verify_snapshot(repo)["ok"]
        dest = root / "restored"
        restore_index(repo, str(dest))
        want = {
            str(f.relative_to(src)): f.read_bytes()
            for f in src.rglob("*") if f.is_file()
        }
        got = {
            str(f.relative_to(dest)): f.read_bytes()
            for f in dest.rglob("*") if f.is_file()
        }
        assert got == want

    run()
