"""Multi-seed aggregation of the parity A/B (benchmarks/parity_ab.py
merge_seeds): per-seed curves fold into mean/std, the matches-or-beats
verdict only holds if it holds at EVERY seed, and the wall-clock ratio uses
the least-contended (minimum) reference sec/step."""

import importlib.util
import json
import os

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_module():
    spec = importlib.util.spec_from_file_location(
        "parity_ab_test_mod",
        os.path.join(REPO_ROOT, "benchmarks", "parity_ab.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _seed_file(seed, ref_cer, ours_cer, ref_sps, ours_sps):
    return {
        "reference": {"cer": ref_cer, "sec_per_step": ref_sps,
                      "device": "cpu"},
        "ours": {"cer": ours_cer, "sec_per_step": ours_sps,
                 "device": "fake-tpu"},
        "config": {"seed": seed, "batch": 8, "decode": "greedy"},
    }


def _run_merge(tmp_path, files):
    mod = _load_module()
    bench = tmp_path / "benchmarks"
    bench.mkdir()
    for seed, payload in files.items():
        with open(bench / f"parity_ab_seed{seed}.json", "w") as f:
            json.dump(payload, f)
    mod.REPO = str(tmp_path)
    mod.AGGREGATE = str(bench / "parity_ab.json")
    mod.merge_seeds()
    with open(mod.AGGREGATE) as f:
        return json.load(f)


def test_merge_aggregates_and_verdict_requires_every_seed(tmp_path):
    files = {
        0: _seed_file(0, {"200": 1.0, "400": 0.9}, {"200": 0.95, "400": 0.85},
                      ref_sps=2.0, ours_sps=0.1),
        1: _seed_file(1, {"200": 0.98, "400": 0.92},
                      {"200": 0.97, "400": 0.90}, ref_sps=3.0, ours_sps=0.2),
    }
    out = _run_merge(tmp_path, files)
    assert out["n_seeds"] == 2 and out["seeds"] == [0, 1]
    # mean over both seeds at step 200: (1.0 + 0.98) / 2
    assert abs(out["reference"]["cer_mean"]["200"] - 0.99) < 1e-9
    assert out["reference"]["n_seeds_at_step"]["400"] == 2
    # min reference sec/step (least contended), median ours
    assert out["reference"]["sec_per_step"] == 2.0
    assert out["summary"]["ours_matches_or_beats_at_every_checkpoint_every_seed"]
    assert out["per_seed"]["0"]["matched_step"] == 400
    assert all(r > 0 for r in
               out["summary"]["time_to_matched_cer_ratio"]["per_seed"])


def test_merge_verdict_fails_if_any_seed_loses(tmp_path):
    files = {
        0: _seed_file(0, {"200": 1.0}, {"200": 0.9}, 2.0, 0.1),
        1: _seed_file(1, {"200": 0.8}, {"200": 0.95}, 2.0, 0.1),  # loses
    }
    out = _run_merge(tmp_path, files)
    assert not out["summary"][
        "ours_matches_or_beats_at_every_checkpoint_every_seed"]


def test_merge_handles_uneven_grids_and_skips_incomplete(tmp_path):
    files = {
        0: _seed_file(0, {"200": 1.0, "400": 0.9, "800": 0.85},
                      {"200": 0.9, "400": 0.8, "800": 0.7}, 2.0, 0.1),
        1: _seed_file(1, {"200": 1.0}, {"200": 0.9}, 2.5, 0.1),
        2: {"ours": {"cer": {"200": 0.5}, "sec_per_step": 0.1}},  # no ref side
    }
    out = _run_merge(tmp_path, files)
    assert out["n_seeds"] == 2                      # seed 2 skipped
    assert out["reference"]["n_seeds_at_step"]["800"] == 1
    assert out["per_seed"]["1"]["matched_step"] == 200
