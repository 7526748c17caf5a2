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
