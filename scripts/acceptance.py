"""Scripted model-quality acceptance proxy.

The reference's acceptance record is its validation AUCROC table
(/root/reference/readme.md:53-61) — unreachable here (zero egress, no real
CheXpert). This script is the stand-in gate: it trains the production config
on the CALIBRATED-difficulty synthetic fixture at 320x320 (label noise caps a
perfect model's observed AUC at 1-rho; weak-amplitude uncertain positives
make the U-Ones policy AUC-load-bearing — data/synthetic.py), then asserts

  1. best single-checkpoint mean validation AUC inside the per-arch BAND
     [floor, ceiling] — a band, not a one-sided floor: values at 1.0 mean
     the fixture saturated and the gate can't see regressions (round-3
     verdict); values below floor mean a quality regression.
  2. best-K checkpoint ENSEMBLE mean AUC >= floor AND >= best single minus
     a small tolerance (the reference's headline mode and its core claim:
     mean of outputs over tracked checkpoints beats the single model,
     readme.md:49-51)
  3. steady-state training throughput >= min(per-arch recorded floor,
     80% of what the H2D link can feed, probed at gate time). End-to-end
     input on this dev host rides a tunneled H2D link whose bandwidth
     DRIFTS across sessions (measured 43-76 MB/s); at 320^2 uint8 that
     link alone bounds e2e at ~420-760 img/s, below some archs' compute
     rate. Gating raw e2e against a fixed floor therefore fails on slow-
     tunnel days with zero code regression (round-4 densenet121: 423 vs
     floor 595 while the probe showed the link capped at ~440). The probed
     bound keeps the check meaningful either way: a pipeline regression
     (f32 H2D = 4x bytes, broken prefetch, host-decode stall) still drops
     throughput far below 80% of link capability. Skipped on CPU.

Exit code is nonzero on any regression, so this is CI-able:

    python scripts/acceptance.py            # real TPU, densenet121 @ 320^2 bf16
    python scripts/acceptance.py --tiny     # hermetic CPU smoke (densenet-tiny @ 32^2)
    python scripts/acceptance.py --sabotage uzeros   # discriminability proof:
        trains with the WRONG uncertainty mapping and exits 0 iff the gate
        FAILS (a gate a deliberate bug can pass is not a gate)

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
    "densenet121": 595.0,       # recorded 745.7 img/s e2e (ACCEPTANCE r2)
    "resnet152": 425.0,         # recorded 530 img/s e2e (ACCEPTANCE r3)
    "efficientnet-b0": 760.0,   # recorded 951 img/s e2e (ACCEPTANCE r3)
    "aadensenet121": 414.0,     # recorded 517 img/s e2e (ACCEPTANCE r3)
    "aaresnet152": 97.0,        # recorded 122 img/s e2e (ACCEPTANCE r4) —
                                # compute-bound at ~150 img/s, so e2e sits
                                # well below the other archs by design
    "efficientnet-b4": 480.0,   # recorded 601.8 img/s e2e (ACCEPTANCE r4)
}

# Per-arch mean-AUC bands on the calibrated fixture (label_noise=0.08 caps a
# perfect model at 0.92 observed; weak positives push converged models a bit
# lower). Calibrated from on-chip round-4 runs; archs without a record use
# the fallback band. Ceiling < 1.0 by construction — a value AT the ceiling
# says the fixture saturated (or leaked), itself a gate failure.
FALLBACK_AUC_BAND = (0.82, 0.97)
# Floors sit ~0.05 under the recorded single-model value (ACCEPTANCE.json,
# round 4) — wide enough for seed/session noise on a 512-image valid set
# (~1% AUC std), tight enough that the sabotage run (-0.15, densenet121
# 0.919 -> 0.770) and any real quality regression land below them. The
# strong archs converge at ~0.92 = the fixture's label-noise cap; the
# 0.97 ceiling still flags saturation/leakage.
ARCH_AUC_BANDS = {
    "densenet121": (0.87, 0.97),      # recorded 0.9190 single / 0.9192 ens
    "resnet152": (0.86, 0.97),        # recorded 0.9136 / 0.9044
    "aadensenet121": (0.87, 0.97),    # recorded 0.9216 / 0.9203
    "aaresnet152": (0.77, 0.97),      # recorded 0.8213 / 0.8290 (slow
                                      # converger in the gate's ~100 steps)
    "efficientnet-b0": (0.78, 0.97),  # recorded 0.8370 / 0.8276
    "efficientnet-b4": (0.75, 0.97),  # recorded 0.7987 / 0.7818 (slowest
                                      # converger: BN momentum 0.01 +
                                      # 17.3M params vs the gate's ~320
                                      # steps; REPRODUCE.md's real-data
                                      # recipe runs 60k+ steps)
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


def _probe_h2d_img_s(image_size: int, batch: int = 128, reps: int = 4) -> float:
    """H2D link capability, in images/sec of uint8 single-channel frames
    (the pipeline's H2D format — train/steps.py::prepare_image normalizes
    on device). Best-of-reps: we want the link's capability, not its
    average contention. Synced with a value fetch, not block_until_ready
    (which can return early on the axon platform)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    buf = np.zeros((batch, image_size, image_size), np.uint8)
    dev = jax.devices()[0]
    fetch = jax.jit(jnp.sum, device=dev)
    float(fetch(jax.device_put(buf, dev)))  # warm both transfers + compile
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fetch(jax.device_put(buf, dev)))
        dt = time.perf_counter() - t0
        best = max(best, batch / dt)
    return best


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
                   help="default: the per-arch band floor (tiny: 0.9)")
    p.add_argument("--auc-ceiling", type=float, default=None,
                   help="default: the per-arch band ceiling (tiny: none)")
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
    p.add_argument("--sabotage", default="", choices=["", "uzeros"],
                   help="inject a deliberate bug and invert the verdict: "
                        "exit 0 iff the AUC gate FAILS. 'uzeros' trains with "
                        "the wrong uncertainty mapping (U-Zeros instead of "
                        "U-Ones) — the fixture's weak uncertain positives "
                        "make that measurably crater validation AUC")
    args = p.parse_args(argv)

    if args.tiny:
        import jax

        # the axon sitecustomize pins jax_platforms to "axon,cpu" (not just
        # "axon"), so match on substring or the tiny smoke silently runs on
        # the real chip — and contends with any on-chip queue
        if not jax.config.jax_platforms or "axon" in jax.config.jax_platforms:
            jax.config.update("jax_platforms", "cpu")

    from chexpert_tpu.cli.chexpert import main as chexpert_main
    from chexpert_tpu.data import make_synthetic_dataset

    workdir = args.workdir or (
        "/tmp/chexpert_acceptance_tiny" if args.tiny else "/tmp/chexpert_acceptance"
    )
    if args.fresh and os.path.isdir(workdir):
        shutil.rmtree(workdir)
    # per-arch run dirs: a failed arch can be re-gated with --skip-train
    # after a band tweak without retraining the other archs
    run_name = "run_" + ("tiny" if args.tiny else args.arch)
    if args.sabotage:
        run_name += "_sabotage_" + args.sabotage
    run_dir = os.path.join(workdir, run_name)
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
        auc_floor = args.auc_floor if args.auc_floor is not None else 0.9
        auc_ceiling, tp_floor = (args.auc_ceiling if args.auc_ceiling is not None
                                 else 1.0), 0.0
        # 24 validation images -> per-class AUC std of several percent; the
        # production tolerance would fail on pure noise here
        ens_tol = 0.05
    else:
        # calibrated-difficulty gate fixture (see module docstring):
        # label_noise=0.08 -> perfect-model observed-AUC cap = 0.92;
        # weak_frac=0.3 + uncertain_frac=1.0 -> every weak train positive is
        # stored as -1, so the uncertainty policy decides whether the model
        # learns 'faint band = positive' (U-Ones, correct) or '= negative'
        # (U-Zeros, sabotage). n_valid=512 keeps the AUC estimate's own
        # noise ~1%.
        fixture = dict(n_train=2048, n_valid=512, image_size=320,
                       label_noise=0.08, weak_frac=0.3, uncertain_frac=1.0)
        train_flags = [
            "--model", args.arch, "--image_size", "320",
            "--batch_size", "64", "--n_epochs", str(args.epochs), "--lr", args.lr,
            "--lr_decay_factor", args.lr_decay_factor,
            "--compute_dtype", "bfloat16", "--log_interval", "8",
            "--eval_interval", "16", "--packed_cache",
            "--attn_impl", args.attn_impl,
            "--uncertain_policy", "zeros" if args.sabotage == "uzeros" else "ones",
        ]
        band = ARCH_AUC_BANDS.get(args.arch, FALLBACK_AUC_BAND)
        auc_floor = args.auc_floor if args.auc_floor is not None else band[0]
        auc_ceiling = args.auc_ceiling if args.auc_ceiling is not None else band[1]
        tp_floor = arch_throughput_floor(args.arch, args.throughput_floor)
        ens_tol = 0.02

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
    link_img_s = None
    if not on_cpu and tp_floor > 0:
        link_img_s = _probe_h2d_img_s(320 if not args.tiny else 32)
        # the gate cannot demand more than the session's link can feed;
        # 0.8 x link = same margin the arch floors carry vs their records
        tp_floor = round(min(tp_floor, 0.8 * link_img_s), 1)

    checks = {
        "single_model_mean_auc": (
            single, (auc_floor, auc_ceiling), auc_floor <= single <= auc_ceiling,
        ),
        "ensemble_mean_auc": (
            ensemble, (auc_floor, auc_ceiling), auc_floor <= ensemble <= auc_ceiling,
        ),
        # the reference's core claim (readme.md:49-51): the checkpoint
        # ensemble is the headline number. Tolerance: mean-of-scores is not
        # mathematically guaranteed above the best member on AUC, and the
        # gate's ~100-step runs track 6 checkpoints including early weak
        # ones (the reference ensembles top-10 over 60k steps) — so gate
        # the failure mode, not the noise: a BROKEN ensemble (mismatched
        # params, wrong averaging axis) craters to ~0.5 AUC, a 0.4 drop,
        # far past any tolerance here.
        "ensemble_vs_single": (
            ensemble - single, (-ens_tol, None), ensemble >= single - ens_tol,
        ),
        "train_images_per_sec": (
            throughput, (0.0 if on_cpu else tp_floor, None),
            on_cpu or throughput >= tp_floor,
        ),
    }
    ok = all(passed for _, _, passed in checks.values())
    result = {
        "acceptance": "PASS" if ok else "FAIL",
        "mode": "tiny" if args.tiny else "production",
        "arch": "densenet-tiny" if args.tiny else args.arch,
        "device": str(jax.devices()[0]),
        **{k: {"value": round(v, 4), "bounds": b, "ok": passed}
           for k, (v, b, passed) in checks.items()},
    }
    if link_img_s is not None:
        result["train_images_per_sec"]["h2d_link_img_s"] = round(link_img_s, 1)
    if args.sabotage:
        # inverted verdict: the gate must CATCH the injected bug via the AUC
        # checks specifically (throughput is unaffected by sabotage)
        auc_ok = (checks["single_model_mean_auc"][2]
                  and checks["ensemble_mean_auc"][2])
        result["sabotage"] = args.sabotage
        result["acceptance"] = "PASS" if not auc_ok else "FAIL"
        result["arch"] = result["arch"] + f"+sabotage_{args.sabotage}"
        print(json.dumps(result))
        if args.out:
            merge_arch_result(args.out, result)
        return 0 if not auc_ok else 1
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
