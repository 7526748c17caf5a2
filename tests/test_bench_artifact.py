"""Unit tests for the root bench.py artifact plumbing (no device work):
merge_arch_record must refresh exactly one arch row of a --model all
artifact and keep the headline fields tracking densenet121."""

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "root_bench", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_merge_arch_record(tmp_path):
    bench = _load_bench()
    artifact = {
        "metric": "m", "value": 943.0, "vs_baseline": 5.3,
        "best_batch": 128, "mfu": 0.17,
        "archs": {
            "densenet121": {"value": 943.0, "best_batch": 128, "mfu": 0.17},
            "efficientnet-b4": {"value": 538.0, "best_batch": 128, "mfu": 0.08},
        },
    }
    path = tmp_path / "bench_all.json"
    path.write_text(json.dumps(artifact))

    # non-headline arch: only its row changes
    rec = {"value": 601.0, "best_batch": 128, "mfu": 0.09, "vs_baseline": 2.8}
    merged = bench.merge_arch_record(str(path), "efficientnet-b4", rec)
    assert merged["archs"]["efficientnet-b4"]["value"] == 601.0
    assert merged["value"] == 943.0 and merged["best_batch"] == 128
    assert json.loads(path.read_text()) == merged

    # headline arch: top-level fields follow
    rec = {"value": 1001.0, "best_batch": 128, "mfu": 0.18, "vs_baseline": 5.6}
    merged = bench.merge_arch_record(str(path), "densenet121", rec)
    assert merged["value"] == 1001.0 and merged["mfu"] == 0.18
    assert merged["vs_baseline"] == 5.6
    assert merged["archs"]["efficientnet-b4"]["value"] == 601.0


def test_merge_arch_record_infer_subkey(tmp_path):
    """--infer --merge-into attaches under the arch row's 'infer' key and
    must not clobber the train-row fields (or the headline)."""
    bench = _load_bench()
    artifact = {
        "metric": "m", "value": 943.0, "vs_baseline": 5.3,
        "best_batch": 128, "mfu": 0.17,
        "archs": {
            "densenet121": {"value": 943.0, "best_batch": 128, "mfu": 0.17},
        },
    }
    path = tmp_path / "bench_all.json"
    path.write_text(json.dumps(artifact))
    infer_rec = {"model": "densenet121", "value": 3000.0, "best_batch": 256,
                 "latency_ms_b1": 9.1}
    bench.merge_arch_record(str(path), "densenet121", infer_rec, subkey="infer")
    got = json.loads(path.read_text())
    row = got["archs"]["densenet121"]
    assert row["value"] == 943.0 and row["infer"]["value"] == 3000.0
    assert got["value"] == 943.0  # headline untouched by an infer merge
    # arch not yet in the table gets a stub row holding only the subkey
    bench.merge_arch_record(str(path), "efficientnet-b7",
                            {"value": 700.0}, subkey="infer")
    got = json.loads(path.read_text())
    assert got["archs"]["efficientnet-b7"]["infer"]["value"] == 700.0


def test_render_tolerates_oom_and_stub_rows(tmp_path):
    """gen_perf_table.render must not crash on 'oom' sweep points, mfu=None,
    missing vs_baseline, or infer-only stub rows (all legitimate artifact
    contents written by bench.py)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "gen_perf_table", os.path.join(REPO, "scripts", "gen_perf_table.py"))
    gpt = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gpt)
    artifact = {
        "archs": {
            "densenet121": {
                "model": "densenet121", "image_size": 320, "value": 943.0,
                "best_batch": 128, "spread_pct": 0.1, "mfu": None,
                "sweep": {"128": 943.0, "256": "oom"},
                "sweep_spread_pct": {"128": 0.1},
                "infer": {"value": 3146.0, "latency_ms_b1": 2.1},
            },
            "newarch": {"model": "newarch",
                        "infer": {"value": 700.0, "image_size": 320}},
        },
    }
    p = tmp_path / "a.json"
    p.write_text(json.dumps(artifact))
    table = gpt.render(str(p))
    assert "256→oom" in table and "— | — |" in table
    assert "**3,146** (b1: 2.1 ms)" in table
    assert "newarch @ 320²" in table and "**700**" in table


def test_merge_train_record_preserves_infer(tmp_path):
    """A train-record refresh of an arch row must carry over the row's
    existing 'infer' subrecord and measured torch-CPU floor instead of
    dropping them (the artifact is the only versioned home of both)."""
    bench = _load_bench()
    artifact = {
        "metric": "m", "value": 943.0, "vs_baseline": 5.3,
        "best_batch": 128, "mfu": 0.17,
        "archs": {
            "densenet121": {"value": 943.0, "best_batch": 128, "mfu": 0.17},
            "aadensenet121": {
                "value": 751.0, "best_batch": 128, "mfu": 0.16,
                "measured_torch_cpu_img_s": 0.68,
                "infer": {"value": 2620.7, "best_batch": 128},
            },
        },
    }
    path = tmp_path / "bench_all.json"
    path.write_text(json.dumps(artifact))
    rec = {"value": 760.0, "best_batch": 128, "mfu": 0.163, "vs_baseline": 5.1}
    merged = bench.merge_arch_record(str(path), "aadensenet121", rec)
    row = merged["archs"]["aadensenet121"]
    assert row["value"] == 760.0
    assert row["infer"]["value"] == 2620.7
    assert row["measured_torch_cpu_img_s"] == 0.68
