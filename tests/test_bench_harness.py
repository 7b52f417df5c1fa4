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


def test_bench_ray_init_cluster_dry_run(monkeypatch):
    """RUNBOOK.md dry run: BENCH_RAY_ADDRESS routes bench's ray.init to
    the cluster-connect path (address passed through, no num_cpus —
    the cluster's node count is the parallelism under test); unset, it
    stays local with the explicit CPU cap."""
    import ray

    calls = []
    monkeypatch.setattr(ray, "init", lambda **kw: calls.append(kw))

    monkeypatch.setenv("BENCH_RAY_ADDRESS", "auto")
    bench._bench_ray_init(8)
    assert calls[-1]["address"] == "auto" and "num_cpus" not in calls[-1]

    monkeypatch.delenv("BENCH_RAY_ADDRESS")
    bench._bench_ray_init(8)
    assert calls[-1]["address"] == "local" and calls[-1]["num_cpus"] == 8


def test_cli_init_ray_cluster_dry_run(monkeypatch, capsys):
    """RUNBOOK.md dry run for the CLI path: RAY_ADDRESS set by `ray job
    submit` connects (no num_cpus, warning when one was passed);
    local/unset starts a capped local instance."""
    import ray

    from docinsight_ray.cli import _init_ray

    calls = []
    monkeypatch.setattr(ray, "init", lambda **kw: calls.append(kw))
    monkeypatch.setattr(ray, "is_initialized", lambda: False)

    monkeypatch.setenv("RAY_ADDRESS", "ray://head:10001")
    _init_ray(16)
    assert calls[-1]["address"] == "ray://head:10001"
    assert "num_cpus" not in calls[-1]
    assert "--num-cpus=16 ignored" in capsys.readouterr().err

    monkeypatch.setenv("RAY_ADDRESS", "local")
    _init_ray(4)
    assert calls[-1]["address"] == "local" and calls[-1]["num_cpus"] == 4
    assert capsys.readouterr().err == ""
