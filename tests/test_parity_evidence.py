"""Committed parity evidence must stay coherent (VERDICT r4 directives 1+2).

Round 4's failure mode was evidence drift: results.json rows predating the
harness retune, VALIDATION.md quoting numbers no committed artifact carried,
and reference_parity.json holding one of three experiments.  These tests
make the committed artifacts themselves the contract: a regen that flips a
row out of band, drops an experiment, or loses a column fails CI.
"""

import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    path = os.path.join(ROOT, "benchmarks", name)
    assert os.path.exists(path), f"committed evidence missing: {name}"
    with open(path) as f:
        return json.load(f)


def test_iters_rows_all_in_band():
    rows = _load("results.json").get("iters", [])
    assert rows, "results.json carries no iters rows"
    scenes = {(r["solver"], r["scene"]) for r in rows}
    # both scenes, all four solvers (the violent rows are the non-vacuous
    # parity check — reference tolerance contract dfsph.py:160, iisph.py:135,
    # pcisph.py:153)
    for solver in ("dfsph", "sesph", "pcisph", "iisph"):
        for scene in ("canonical", "violent"):
            assert (solver, scene) in scenes, f"missing row {solver}/{scene}"
    bad = [f"{r['solver']}/{r['scene']}" for r in rows if not r["in_band"]]
    assert not bad, f"iters rows out of band: {bad}"


def test_throughput_rows_overflow_free_and_budgeted():
    rows = _load("results.json").get("throughput", [])
    assert rows, "results.json carries no throughput rows"
    for r in rows:
        assert r["overflow"] == 0, (
            f"{r['solver']} @ {r['n_liquid']}: overflow {r['overflow']}")


def test_results_md_current():
    """RESULTS.md must be the render of the committed results.json (the
    'one command regenerates' invariant VERDICT r4 weak #1 found broken)."""
    import sys

    sys.path.insert(0, ROOT)
    from benchmarks.harness import to_markdown

    with open(os.path.join(ROOT, "benchmarks", "RESULTS.md")) as f:
        committed = f.read()
    assert committed == to_markdown(_load("results.json")), (
        "benchmarks/RESULTS.md is stale — regenerate with "
        "python benchmarks/harness.py")


def test_reference_parity_complete():
    """All three published reference figures need a framework-side result
    (README.md:38-40: visc CG-vs-PCG iterations, pressure iterations,
    max stable dt)."""
    res = _load("reference_parity.json")
    for key in ("visc", "pressure", "max_dt"):
        assert key in res, f"reference_parity.json missing experiment {key}"
    assert set(res["visc"]) >= {"cg", "pcg"}
    assert set(res["pressure"]) >= {"pcisph", "iisph"}
    assert set(res["max_dt"]) >= {"iisph", "pcisph", "sesph"}
    # PCG must beat plain CG at every factor (the reference's headline
    # claim, image/average_iter_num.png)
    for factor, cg in res["visc"]["cg"].items():
        pcg = res["visc"]["pcg"][factor]
        assert pcg["mean_active"] <= cg["mean_active"] + 1e-6, (
            f"PCG not better than CG at factor {factor}")
