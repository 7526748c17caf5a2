"""The scripted acceptance gate (scripts/acceptance.py) runs hermetically in
tiny mode and actually gates: PASS on the planted-signal fixture, FAIL (rc=1)
when the AUC floor is unreachable."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


@pytest.mark.slow
def test_acceptance_tiny_gate(tmp_path, capsys):
    import acceptance

    workdir = str(tmp_path / "acc")
    rc = acceptance.main(["--tiny", "--workdir", workdir])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert '"acceptance": "PASS"' in out

    # an impossible AUC floor must fail the gate (nonzero exit); --skip-train
    # re-gates the run above without retraining
    rc = acceptance.main(
        ["--tiny", "--workdir", workdir, "--skip-train", "--auc-floor", "1.01"]
    )
    out = capsys.readouterr().out
    assert rc == 1, out
    assert '"acceptance": "FAIL"' in out


def test_arch_throughput_floor_resolution():
    """Per-arch floors default to ~80% of the recorded steady-state (round-2
    verdict: a blanket 250 img/s floor let 2-3x regressions pass); explicit
    --throughput-floor still wins; unrecorded archs keep the fallback."""
    import acceptance

    assert acceptance.arch_throughput_floor("densenet121", None) >= 500.0
    assert acceptance.arch_throughput_floor("densenet121", 100.0) == 100.0
    assert acceptance.arch_throughput_floor("never-recorded", None) == 250.0


def test_acceptance_out_merges_per_arch(tmp_path):
    """--out accumulates one record per arch; top-level PASS iff all pass."""
    import json

    import acceptance

    out = str(tmp_path / "ACCEPTANCE.json")
    json.dump({"archs": {"resnet152": {"acceptance": "PASS", "arch": "resnet152"}}},
              open(out, "w"))
    acceptance.merge_arch_result(out, {"acceptance": "FAIL", "arch": "densenet121"})
    final = json.load(open(out))
    assert set(final["archs"]) == {"resnet152", "densenet121"}
    assert final["acceptance"] == "FAIL"
    acceptance.merge_arch_result(out, {"acceptance": "PASS", "arch": "densenet121"})
    assert json.load(open(out))["acceptance"] == "PASS"
    # legacy single-arch schema (pre-r3) is replaced, not corrupted
    json.dump({"acceptance": "PASS", "arch": "densenet121"}, open(out, "w"))
    acceptance.merge_arch_result(out, {"acceptance": "PASS", "arch": "resnet152"})
    assert set(json.load(open(out))["archs"]) == {"resnet152"}


def test_arch_gate_defaults_and_einsum_sabotage_guard():
    """Arch-aware gate defaults exist for the archs that need them, and the
    einsum floor-proof refuses non-attention archs up front."""
    import acceptance

    assert acceptance.ARCH_GATE_LR["aadensenet121"] == "3e-2"
    assert acceptance.ARCH_GATE_EPOCHS["efficientnet-b7"] == 10
    assert acceptance.ARCH_GATE_BATCH["efficientnet-b7"] == 16
    # every README-table arch has a throughput floor and an AUC band row
    for arch in ("densenet121", "resnet152", "aadensenet121", "aaresnet152",
                 "efficientnet-b0", "efficientnet-b4", "efficientnet-b7"):
        assert arch in acceptance.ARCH_THROUGHPUT_FLOORS, arch
        assert arch in acceptance.ARCH_AUC_BANDS, arch
    with pytest.raises(AssertionError, match="attention arch"):
        acceptance.main(["--arch", "densenet121", "--sabotage", "einsum",
                         "--workdir", "/tmp/nonexistent_gate"])


def test_eval_series_ordering(tmp_path):
    import json

    import acceptance

    for step, aucs in [(32, 0.7), (16, 0.6), (48, 0.8)]:
        json.dump({"aucs": {"0": aucs}, "loss": {}},
                  open(tmp_path / f"eval_results_step_{step}.json", "w"))
    series = acceptance._eval_series(str(tmp_path))
    assert [s for s, _ in series] == [16, 32, 48]
    assert abs(series[0][1] - 0.6) < 1e-9
