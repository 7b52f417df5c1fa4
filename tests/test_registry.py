"""Driver-contract registry invariants (no Ray needed)."""


def test_no_query_key_collisions_across_modules():
    """queries() merges per-module dicts with update(): a duplicate key
    silently replaces another module's gate. Assert global uniqueness."""
    import importlib

    mods = [
        "pipelines.documents", "functions.textstats", "functions.dedup",
        "functions.knn", "functions.windows", "functions.multimodal",
        "functions.chunking", "pipelines.relational", "functions.corpusops",
        "functions.semistruct", "functions.sketches", "pipelines.prepare",
        "functions.bpe", "functions.classify", "functions.vecstats",
        "functions.graph", "pipelines.ann",
    ]
    seen: dict[str, str] = {}
    for m in mods:
        mod = importlib.import_module(f"docinsight_ray.{m}")
        for k in getattr(mod, "QUERIES", {}):
            assert k not in seen, f"gate {k!r} defined in both {seen[k]} and {m}"
            seen[k] = m
        for k in getattr(mod, "ORACLE_SQL", {}):
            assert k in getattr(mod, "QUERIES", {}) or any(
                k in getattr(importlib.import_module(f"docinsight_ray.{m2}"), "QUERIES", {})
                for m2 in mods
            ), f"oracle {k!r} has no query entry"


def test_entry_module_registries_consistent():
    """Every oracle_sql() key resolves to a queries() entry."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    q = e.queries()
    s = e.oracle_sql()
    missing = sorted(set(s) - set(q))
    assert not missing, f"oracle keys without queries: {missing}"
