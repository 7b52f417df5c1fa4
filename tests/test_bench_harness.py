"""Tests for the bench.py harness plumbing (no Ray session needed).

VERDICT r3, What's wrong #1: the embedded strong-scaling sub-run built its
environment with ``dict(os.environ, BENCH_PIPELINES="core", **extra_env)``,
which raises TypeError whenever ``extra_env`` also carries BENCH_PIPELINES —
and the except-clause degraded silently, so BENCH_r03.json shipped an error
string instead of the scaling numbers. These tests pin the fixed contract.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_sub_env_default_core_fast():
    env = bench.sub_env({})
    assert env["BENCH_PIPELINES"] == "core"
    assert env["BENCH_FAST"] == "1"
    # inherits the parent environment
    assert env.get("PATH") == os.environ.get("PATH")


def test_sub_env_override_does_not_raise():
    # the exact call shape that crashed in r3: extra_env overrides a default
    env = bench.sub_env({
        "RAY_GRAFT_CPUS": "8",
        "BENCH_PIPELINES": "scaling",
        "BENCH_DOCS": "100000",
        "BENCH_QUERIES": "2000",
    })
    assert env["BENCH_PIPELINES"] == "scaling"
    assert env["BENCH_FAST"] == "1"
    assert env["RAY_GRAFT_CPUS"] == "8"


def test_sub_env_does_not_mutate_os_environ():
    before = dict(os.environ)
    bench.sub_env({"BENCH_PIPELINES": "scaling"})
    assert dict(os.environ) == before
