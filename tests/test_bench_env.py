"""Unit tests for the self-describing bench conditions (VERDICT r4 #3)."""

import json

from perceptor_tpu.utils.bench_env import (
    bench_env,
    cache_snapshot,
    classify_cache,
    other_python_procs,
)


def test_bench_env_shape():
    env = bench_env()
    assert set(env) >= {"timestamp", "loadavg", "other_python_procs"}
    assert len(env["loadavg"]) == 3
    assert env["other_python_procs"] >= 0
    json.dumps(env)  # must be JSON-serializable as-is


def test_cache_classification(tmp_path):
    d = str(tmp_path)
    before = cache_snapshot(d)
    assert classify_cache(before, cache_snapshot(d), d) == "hit"
    (tmp_path / "entry0").write_bytes(b"x")
    assert classify_cache(before, cache_snapshot(d), d) == "miss"
    assert classify_cache(before, cache_snapshot(d), "") == "off"


def test_warmup_field_round():
    env = bench_env(set(), set(), warmup_readback_s=12.345)
    assert env["warmup_readback_s"] == 12.3
    assert env["cache"] in ("hit", "miss", "off")


def test_other_python_procs_excludes_self():
    # at minimum it must not count this pytest process
    n_all = sum(1 for _ in __import__(
        "perceptor_tpu.utils.bench_env", fromlist=["x"]
    )._iter_python_procs())
    assert other_python_procs() < n_all
