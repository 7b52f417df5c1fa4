"""Python-oracle channel (docinsight_ray/pyoracle.py): the independent
single-process twins that check_parity.py uses for the no-SQL gates.

The full 22-gate sweep runs via ``scripts/check_parity.py``; here a
representative subset (one per oracle family: per-doc hash, sketch,
sharded-agg merge, vector, closed-form multimodal) runs in-suite so a
regression in either side fails pytest, not just the offline sweep."""

import pytest

SF = "/root/testdata/sf0.001"

CASES = [
    "simhash64",
    "doc_fingerprint",
    "distinct_terms_by_lang",
    "terms_agg_approx",
    "knn_cosine_ivf",
    "multimodal_real",
]


@pytest.mark.parametrize("name", CASES)
def test_py_oracle_agrees(ray_session, name):
    import __ray_entry__ as e
    from docinsight_ray.pyoracle import PY_ORACLES

    got = e.queries()[name](SF).to_pandas()
    ok, msg = PY_ORACLES[name](SF, got)
    assert ok, f"{name}: {msg}"


def test_py_oracle_registry_covers_no_sql_gates():
    """Every rows-only gate except reference_topk (covered by the
    conformance suite) has a python oracle."""
    import __ray_entry__ as e
    from docinsight_ray.pyoracle import PY_ORACLES

    no_sql = set(e.queries()) - set(e.oracle_sql()) - {"reference_topk"}
    assert no_sql == set(PY_ORACLES), (
        f"missing: {no_sql - set(PY_ORACLES)}; stale: {set(PY_ORACLES) - no_sql}"
    )
