"""Unit coverage for tools/bench_compare.py — the canary-normalized
triage math (VERDICT r12 "Next round" #2). Pure Python, no Spark."""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys

TOOL = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools",
    "bench_compare.py",
)


def _run(prev: dict, cur: dict, tmp_path, *args):
    p1, p2 = str(tmp_path / "prev.json"), str(tmp_path / "cur.json")
    json.dump(prev, open(p1, "w"))
    json.dump(cur, open(p2, "w"))
    out = subprocess.run(
        [sys.executable, TOOL, p1, p2, *args],
        capture_output=True,
        text=True,
        check=True,
    )
    return json.loads(out.stdout)


def test_host_drift_is_normalized_away(tmp_path):
    """A uniform 1.5x slowdown that the canaries also show must flag
    NOTHING — that is the r12 false-flag storm this tool exists to
    kill."""
    prev = {
        "queries": {"a": 2.0, "b": 4.0, "c": 10.0},
        "canary": {"median_level": 4.0, "samples": {"k1": [1.0], "k2": [3.0]}},
    }
    cur = {
        "queries": {"a": 3.0, "b": 6.0, "c": 15.0},
        "canary": {"median_level": 6.0, "samples": {"k1": [1.5], "k2": [4.5]}},
    }
    d = _run(prev, cur, tmp_path)
    assert d["raw_total_ratio"] == 1.5
    assert d["canary_ratio"] == 1.5
    assert d["normalized_total_ratio"] == 1.0
    assert d["n_flags"] == 0


def test_real_regression_survives_normalization(tmp_path):
    """A single query 3x slower on a flat host must flag exactly that
    query, with raw == normalized ratio."""
    prev = {
        "queries": {"a": 2.0, "b": 4.0},
        "canary": {"median_level": 4.0, "samples": {"k": [1.0]}},
    }
    cur = {
        "queries": {"a": 6.0, "b": 4.0},
        "canary": {"median_level": 4.0, "samples": {"k": [1.0]}},
    }
    d = _run(prev, cur, tmp_path)
    assert list(d["flags"]) == ["a"]
    assert d["flags"]["a"]["raw_ratio"] == 3.0
    assert d["flags"]["a"]["normalized_ratio"] == 3.0


def test_subsecond_walls_never_flag(tmp_path):
    """Sub-second current walls are scheduling noise at any ratio."""
    prev = {"queries": {"a": 0.1},
            "canary": {"median_level": 1.0, "samples": {"k": [1.0]}}}
    cur = {"queries": {"a": 0.9},
           "canary": {"median_level": 1.0, "samples": {"k": [1.0]}}}
    d = _run(prev, cur, tmp_path)
    assert d["n_flags"] == 0


def test_missing_canary_falls_back_to_raw_and_says_so(tmp_path):
    """Pre-r13 artifacts have no canary section: the compare must fall
    back to raw ratios and label the canary_ratio unavailable rather
    than silently normalizing by 1.0 as if measured."""
    prev = {"queries": {"a": 2.0}}
    cur = {"queries": {"a": 3.0}, "canary": {"median_level": 9.9}}
    d = _run(prev, cur, tmp_path)
    assert d["canary_ratio"] == "unavailable (raw triage)"
    assert d["flags"]["a"]["normalized_ratio"] == 1.5


def test_threshold_argument_is_respected(tmp_path):
    prev = {"queries": {"a": 2.0},
            "canary": {"median_level": 1.0, "samples": {"k": [1.0]}}}
    cur = {"queries": {"a": 2.5},
           "canary": {"median_level": 1.0, "samples": {"k": [1.0]}}}
    assert _run(prev, cur, tmp_path)["n_flags"] == 0  # 1.25 < 1.3
    assert _run(prev, cur, tmp_path, "1.2")["n_flags"] == 1


def test_tool_importable():
    spec = importlib.util.spec_from_file_location("bench_compare", TOOL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert callable(mod.main)


def test_mismatched_canary_sets_fall_back_to_raw(tmp_path):
    """(r13 review) A short/interrupted run that sampled only a SUBSET
    of the canaries yields a median_level summed over different queries
    — structurally incomparable. The compare must fall back to labelled
    raw triage instead of skewing every normalized ratio."""
    prev = {
        "queries": {"a": 2.0},
        "canary": {"median_level": 4.0,
                   "samples": {"k1": [1.0], "k2": [3.0]}},
    }
    cur = {
        "queries": {"a": 3.0},
        "canary": {"median_level": 1.0, "samples": {"k1": [1.0]}},
    }
    d = _run(prev, cur, tmp_path)
    assert d["canary_ratio"] == "unavailable (raw triage)"
    assert d["flags"]["a"]["normalized_ratio"] == 1.5


def test_zero_median_level_is_missing_not_infinite(tmp_path):
    """(r13 review) A 0.0 median_level is a broken sample, not a
    measured level — explicit None checks, never truthiness (the old
    `if (pc and cc)` silently treated 0.0 as absent on one side but a
    division by it on the other path would blow up)."""
    prev = {
        "queries": {"a": 2.0},
        "canary": {"median_level": 0.0, "samples": {"k": [0.0]}},
    }
    cur = {
        "queries": {"a": 3.0},
        "canary": {"median_level": 2.0, "samples": {"k": [2.0]}},
    }
    d = _run(prev, cur, tmp_path)
    assert d["canary_ratio"] == "unavailable (raw triage)"
    assert d["flags"]["a"]["normalized_ratio"] == 1.5
