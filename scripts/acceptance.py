"""Scripted model-quality acceptance proxy.

The reference's acceptance record is its validation AUCROC table
(/root/reference/readme.md:53-61) — unreachable here (zero egress, no real
CheXpert). This script is the stand-in gate: it trains the production config
on the planted-signal synthetic fixture at 320x320, then asserts

  1. best single-checkpoint mean validation AUC >= --auc-floor (default 0.95)
  2. best-K checkpoint ENSEMBLE mean AUC >= --auc-floor  (the reference's
     headline mode: mean of outputs over tracked checkpoints)
  3. steady-state training throughput >= --throughput-floor img/s
     (default 250 on an accelerator; skipped on CPU — the dev host's
     tunneled H2D link caps end-to-end input at ~45 MB/s, so the floor is
     deliberately below the compute-bound rate)

Exit code is nonzero on any regression, so this is CI-able:

    python scripts/acceptance.py            # real TPU, densenet121 @ 320^2 bf16
    python scripts/acceptance.py --tiny     # hermetic CPU smoke (densenet-tiny @ 32^2)

Referenced from REPRODUCE.md; the real-data recipe there replaces this gate
on a networked host.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys

# Per-arch throughput floors: ~80% of the recorded steady-state END-TO-END
# rate on the tunneled v5e dev chip (the tunnel's ~45 MB/s H2D cap binds e2e
# below the compute-only rate; see README "Known gaps"). A floor this close
# to reality fails the gate on a ~25% pipeline regression instead of only
# catastrophic ones (round-2 verdict: a 250 img/s floor let 2-3x slips pass).
# Archs without a recorded run fall back to --throughput-floor.
ARCH_THROUGHPUT_FLOORS = {
    "densenet121": 595.0,  # recorded 745.7 img/s e2e (ACCEPTANCE r2)
}


def arch_throughput_floor(arch: str, explicit: "float | None",
                          fallback: float = 250.0) -> float:
    if explicit is not None:
        return explicit
    return ARCH_THROUGHPUT_FLOORS.get(arch, fallback)


def _mean_auc(metrics: dict) -> float:
    import numpy as np

    return float(np.nanmean([v for v in metrics["aucs"].values()]))


def _best_single_auc(output_dir: str) -> float:
    """Best mean AUC over the run's eval snapshots — the model one would
    deploy (exactly what the best-checkpoints tracker keeps)."""
    paths = glob.glob(os.path.join(output_dir, "eval_results_step_*.json"))
    assert paths, f"no eval_results_step_*.json under {output_dir}"
    return max(_mean_auc(json.load(open(p))) for p in paths)


def _max_throughput(output_dir: str) -> float:
    best = 0.0
    with open(os.path.join(output_dir, "scalars.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("tag") == "images_per_sec":
                best = max(best, float(rec["value"]))
    return best


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--tiny", action="store_true",
                   help="hermetic CPU smoke: densenet-tiny @ 32^2, float32")
    p.add_argument("--workdir", default="")
    p.add_argument("--auc-floor", type=float, default=None,
                   help="default: 0.95 production, 0.9 tiny")
    p.add_argument("--throughput-floor", type=float, default=None,
                   help="default: the per-arch recorded floor "
                        "(ARCH_THROUGHPUT_FLOORS), else 250")
    p.add_argument("--fresh", action="store_true", help="rebuild fixture + run dir")
    p.add_argument("--skip-train", action="store_true",
                   help="re-gate an existing run dir (iterating on floors)")
    p.add_argument("--out", default="",
                   help="also write the result JSON to this path")
    p.add_argument("--arch", default="densenet121",
                   help="production-mode architecture to gate")
    p.add_argument("--lr", default="1e-4",
                   help="production-mode learning rate (SGD archs like "
                        "aadensenet121 need ~3e-2 to converge in the gate's "
                        "~100 steps; their production schedule assumes 60k+)")
    p.add_argument("--epochs", type=int, default=3,
                   help="production-mode epochs; efficientnet archs need ~10 "
                        "(their reference-faithful BN momentum of 0.01 moves "
                        "running stats on a ~100-step timescale, so eval "
                        "diverges from train until a few hundred steps in)")
    p.add_argument("--lr_decay_factor", default="0.97",
                   help="exponential-schedule gamma (efficientnet archs): the "
                        "reference default 0.97/step decays lr to ~0 within "
                        "~150 steps — fine on 1700-step CheXpert epochs, but "
                        "the gate's 32-step epochs need ~0.999 to keep "
                        "learning through the run")
    p.add_argument("--attn_impl", default="pallas", choices=["pallas", "einsum"],
                   help="attention implementation for AA archs; the einsum "
                        "fallback deliberately halves throughput — used to "
                        "prove the per-arch floors actually gate")
    args = p.parse_args(argv)

    if args.tiny:
        import jax

        if jax.config.jax_platforms in (None, "", "axon"):
            jax.config.update("jax_platforms", "cpu")

    from chexpert_tpu.cli.chexpert import main as chexpert_main
    from chexpert_tpu.data import make_synthetic_dataset

    workdir = args.workdir or (
        "/tmp/chexpert_acceptance_tiny" if args.tiny else "/tmp/chexpert_acceptance"
    )
    if args.fresh and os.path.isdir(workdir):
        shutil.rmtree(workdir)
    run_dir = os.path.join(workdir, "run")
    if os.path.isdir(run_dir) and not args.skip_train:
        shutil.rmtree(run_dir)  # fixture is reusable; the run is not

    if args.tiny:
        fixture = dict(n_train=48, n_valid=24, image_size=32)
        train_flags = [
            "--model", "densenet-tiny", "--image_size", "32",
            "--batch_size", "8", "--n_epochs", "16", "--lr", "2e-2",
            "--compute_dtype", "float32", "--log_interval", "4",
            "--eval_interval", "12", "--data_workers", "2",
        ]
        auc_floor, tp_floor = (args.auc_floor if args.auc_floor is not None else 0.9), 0.0
    else:
        fixture = dict(n_train=2048, n_valid=128, image_size=320)
        train_flags = [
            "--model", args.arch, "--image_size", "320",
            "--batch_size", "64", "--n_epochs", str(args.epochs), "--lr", args.lr,
            "--lr_decay_factor", args.lr_decay_factor,
            "--compute_dtype", "bfloat16", "--log_interval", "8",
            "--eval_interval", "16", "--packed_cache",
            "--attn_impl", args.attn_impl,
        ]
        auc_floor = args.auc_floor if args.auc_floor is not None else 0.95
        tp_floor = arch_throughput_floor(args.arch, args.throughput_floor)

    marker = os.path.join(workdir, "fixture.json")
    if not (os.path.exists(marker) and json.load(open(marker)) == fixture):
        if os.path.isdir(workdir):
            shutil.rmtree(workdir)
        os.makedirs(workdir)
        print(f"[acceptance] building fixture {fixture} under {workdir}")
        make_synthetic_dataset(workdir, **fixture)
        json.dump(fixture, open(marker, "w"))

    base = ["--data_path", workdir, "--output_dir", run_dir]
    if not (args.skip_train and os.path.isdir(run_dir)):
        print("[acceptance] training...")
        rc = chexpert_main(base + ["--train", "--evaluate_single_model"] + train_flags)
        assert rc in (0, None), f"train exited {rc}"

    single = _best_single_auc(run_dir)

    if not (args.skip_train and
            os.path.exists(os.path.join(run_dir, "eval_results_ensemble.json"))):
        print("[acceptance] ensemble-evaluating tracked best checkpoints...")
        rc = chexpert_main(
            base + ["--evaluate_ensemble",
                    "--restore", os.path.join(run_dir, "best_checkpoints")]
            + train_flags
        )
        assert rc in (0, None), f"ensemble eval exited {rc}"
    ensemble = _mean_auc(json.load(open(os.path.join(run_dir, "eval_results_ensemble.json"))))

    import jax

    on_cpu = jax.devices()[0].platform == "cpu"
    throughput = _max_throughput(run_dir)

    checks = {
        "single_model_mean_auc": (single, auc_floor, single >= auc_floor),
        "ensemble_mean_auc": (ensemble, auc_floor, ensemble >= auc_floor),
        "train_images_per_sec": (
            throughput, 0.0 if on_cpu else tp_floor,
            on_cpu or throughput >= tp_floor,
        ),
    }
    ok = all(passed for _, _, passed in checks.values())
    result = {
        "acceptance": "PASS" if ok else "FAIL",
        "mode": "tiny" if args.tiny else "production",
        "arch": "densenet-tiny" if args.tiny else args.arch,
        "device": str(jax.devices()[0]),
        **{k: {"value": round(v, 4), "floor": f, "ok": passed}
           for k, (v, f, passed) in checks.items()},
    }
    print(json.dumps(result))
    if args.out:
        merge_arch_result(args.out, result)
    return 0 if ok else 1


def merge_arch_result(out_path: str, result: dict) -> dict:
    """One committed artifact accumulates every arch's gate record:
    {"acceptance": PASS iff all archs pass, "archs": {arch: result}}."""
    merged = {"archs": {}}
    if os.path.exists(out_path):
        try:
            prev = json.load(open(out_path))
            if isinstance(prev.get("archs"), dict):
                merged = prev
        except (ValueError, OSError):
            pass
    merged["archs"][result["arch"]] = result
    merged["acceptance"] = (
        "PASS" if all(r.get("acceptance") == "PASS"
                      for r in merged["archs"].values()) else "FAIL"
    )
    json.dump(merged, open(out_path, "w"), indent=2)
    return merged


if __name__ == "__main__":
    sys.exit(main())
