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
    "efficientnet-b7": 190.0,   # recorded 239.3 img/s e2e (ACCEPTANCE r5;
                                # compute-bound arch — same-session compute
                                # probe 262.0 vs the BENCH row's 262.8)
}

# Compute-only (synthetic device-resident batch) floors back the e2e check:
# when a slow tunnel relaxes the e2e floor to 0.8x the probed link rate, a
# pure-compute regression could hide behind it (round-4 verdict #5). The
# floor is 0.8x the committed BENCH_all artifact row, probed at that row's
# recorded batch/image size — link-independent by construction.
COMPUTE_FLOOR_FRACTION = 0.8


def _artifact_compute_row(arch: str):
    """(img_s, batch, image_size) from the newest BENCH_all_r*.json row."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = sorted(glob.glob(os.path.join(repo, "BENCH_all_r*.json")))
    if not paths:
        return None
    rec = json.load(open(paths[-1])).get("archs", {}).get(arch)
    if not rec:
        return None
    return float(rec["value"]), int(rec["best_batch"]), int(rec.get("image_size", 320))

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
    "efficientnet-b7": (0.87, 0.97),  # recorded 0.9232 / 0.9219 (r5; b7
                                      # at gate batch 16 sees 1280 steps —
                                      # 4x b4's — so its BN timescale is
                                      # actually covered and it converges
                                      # like the strong archs)
}

# Arch-aware gate defaults, applied when the flag is not given explicitly:
# the r4 chip queue had to remember per-arch overrides by hand (SGD archs'
# gate lr, efficientnet epochs) — an operator-error surface the script can
# own (r4 verdict: gates are records; a mis-flagged record mis-calibrates
# every later band).
ARCH_GATE_LR = {"aadensenet121": "3e-2"}       # SGD+Nesterov needs ~3e-2 to
                                               # converge in ~100 gate steps
ARCH_GATE_EPOCHS = {"efficientnet-b0": 10, "efficientnet-b4": 10,
                    "efficientnet-b7": 10}     # BN momentum 0.01 timescale
ARCH_GATE_BATCH = {"efficientnet-b7": 16}      # b7 @320^2 OOMs at batch 64
                                               # (BENCH sweeps 8/16 only)
ARCH_GATE_EVAL = {"efficientnet-b7": 128}      # b7 trains at batch 16 ->
                                               # 128 steps/epoch; the default
                                               # 16-step cadence would write
                                               # its ~1 GB of checkpoints
                                               # (253 MB model + 503 MB optim
                                               # + best-copy) 80 times, ~4 min
                                               # of host I/O per eval (r5: the
                                               # first b7 gate paced to ~12 h).
                                               # One eval per epoch keeps 10
                                               # tracked checkpoints like b4.
ARCH_GATE_DECAY = {"efficientnet-b0": "0.999", "efficientnet-b4": "0.999",
                   "efficientnet-b7": "0.999"}  # the reference 0.97/step
                                               # decays lr to ~0 within ~150
                                               # steps — fine on 1700-step
                                               # CheXpert epochs, fatal on
                                               # the gate's 32-step epochs


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


def _probe_compute_img_s(arch: str, batch: int, image_size: int,
                         steps: int = 16) -> float:
    """Synthetic device-resident-batch train rate (bench.py's number):
    link-independent, so it gates pure-compute regressions even when the
    drifting tunnel relaxes the e2e floor. Probed at the committed artifact
    row's batch/image size so the floor compares like with like. Median-free
    single window — the 20% floor margin absorbs session noise."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.insert(0, repo)
    from bench import _measure, _setup_arch

    train_step, _, state, make_batch = _setup_arch(arch, image_size)
    b = make_batch(batch)
    for _ in range(5):  # compile + warm
        state, loss = train_step(state, b)
    float(loss)
    state, _, dt = _measure(train_step, state, b, steps)
    return batch * steps / dt


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
    p.add_argument("--lr", default=None,
                   help="production-mode learning rate; default is the "
                        "arch-aware ARCH_GATE_LR entry (SGD archs like "
                        "aadensenet121 need ~3e-2 to converge in the gate's "
                        "~100 steps; their production schedule assumes 60k+)")
    p.add_argument("--epochs", type=int, default=None,
                   help="production-mode epochs; default is the arch-aware "
                        "ARCH_GATE_EPOCHS entry — efficientnet archs get 10 "
                        "(their reference-faithful BN momentum of 0.01 moves "
                        "running stats on a ~100-step timescale, so eval "
                        "diverges from train until a few hundred steps in)")
    p.add_argument("--batch_size", type=int, default=None,
                   help="production-mode batch; default 64 or the arch-aware "
                        "ARCH_GATE_BATCH entry (efficientnet-b7 needs 16)")
    p.add_argument("--ensemble-top-k", type=int, default=3,
                   help="production mode ensembles only the top-K tracked "
                        "checkpoints (by tracker AvgAUC). The reference "
                        "ensembles its top-10 of a 60k-step run — all late, "
                        "all good (readme.md:49-51); the gate's ~100-300 "
                        "steps track early weak checkpoints too, which made "
                        "the ensemble_vs_single margin knife-edge for slow "
                        "convergers (round-4 efficientnet-b4: -0.0169 vs "
                        "tolerance -0.02). 0 = all tracked checkpoints.")
    p.add_argument("--pretrained-proof", action="store_true",
                   help="also prove the --pretrained path end-to-end: "
                        "pretrain on a differently-seeded synthetic dataset, "
                        "export to a torchvision-format .pth, re-train the "
                        "gate arch from the imported weights, and record the "
                        "first-eval convergence delta vs the scratch run "
                        "(the actual point of --pretrained, reference "
                        "chexpert.py:461-466)")
    p.add_argument("--lr_decay_factor", default=None,
                   help="exponential-schedule gamma (efficientnet archs): the "
                        "reference default 0.97/step decays lr to ~0 within "
                        "~150 steps — fine on 1700-step CheXpert epochs, but "
                        "the gate's 32-step epochs need ~0.999 to keep "
                        "learning through the run")
    p.add_argument("--attn_impl", default="pallas", choices=["pallas", "einsum"],
                   help="attention implementation for AA archs; the einsum "
                        "fallback deliberately halves throughput — used to "
                        "prove the per-arch floors actually gate")
    p.add_argument("--sabotage", default="", choices=["", "uzeros", "einsum"],
                   help="inject a deliberate regression and invert the "
                        "verdict: exit 0 iff the gate FAILS. 'uzeros' trains "
                        "with the wrong uncertainty mapping (U-Zeros instead "
                        "of U-Ones) — the fixture's weak uncertain positives "
                        "make that measurably crater validation AUC (AUC "
                        "checks must fail). 'einsum' (AA archs) swaps the "
                        "Pallas attention kernel for the einsum fallback — "
                        "the per-arch THROUGHPUT floor must fail, proving it "
                        "actually gates compute regressions")
    args = p.parse_args(argv)

    # validate BEFORE any chip time is spent (same rule as bench.py's
    # --merge-into): a refused proof after the multi-hour gate run wastes it
    if args.pretrained_proof and not args.tiny:
        assert args.arch in ("densenet121", "resnet152"), (
            "--pretrained-proof covers the torchvision-importable archs "
            "(densenet121, resnet152)")

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
        lr = args.lr if args.lr is not None else ARCH_GATE_LR.get(args.arch, "1e-4")
        epochs = (args.epochs if args.epochs is not None
                  else ARCH_GATE_EPOCHS.get(args.arch, 3))
        batch = (args.batch_size if args.batch_size is not None
                 else ARCH_GATE_BATCH.get(args.arch, 64))
        decay = (args.lr_decay_factor if args.lr_decay_factor is not None
                 else ARCH_GATE_DECAY.get(args.arch, "0.97"))
        attn_impl = args.attn_impl
        if args.sabotage == "einsum":
            assert args.arch.startswith("aa"), (
                "--sabotage einsum needs an attention arch (the regression "
                "it injects is the einsum attention fallback)")
            attn_impl = "einsum"
            # the einsum path materializes the (B, nh, HW, HW) f32 logits
            # plus softmax autodiff residuals — ~10 GB at batch 64, HW=1600;
            # batch 16 fits. The floor proof is unaffected: the check is
            # that the recorded floor FAILS the halved-throughput run.
            batch = min(batch, 16)
        eval_interval = ARCH_GATE_EVAL.get(args.arch, 16)
        train_flags = [
            "--model", args.arch, "--image_size", "320",
            "--batch_size", str(batch), "--n_epochs", str(epochs), "--lr", lr,
            "--lr_decay_factor", decay,
            "--compute_dtype", "bfloat16", "--log_interval", "8",
            "--eval_interval", str(eval_interval), "--packed_cache",
            "--attn_impl", attn_impl,
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

    ensemble_dir = os.path.join(run_dir, "best_checkpoints")
    top_k = 0 if args.tiny else args.ensemble_top_k
    if top_k:
        # ensemble only the top-K tracker rows (sorted descending by AvgAUC,
        # checkpoint/tracker.py) — the reference's top-10-of-60k-steps are
        # all late/good checkpoints; the gate's short runs also track early
        # weak ones, which dragged ensemble_vs_single to its tolerance edge
        import numpy as np

        rows = np.atleast_2d(np.loadtxt(
            os.path.join(run_dir, "checkpoints_tracker.csv"), skiprows=1))
        ids = [int(i) for i in rows[:top_k, 0]]
        pruned = os.path.join(run_dir, f"best_top{top_k}")
        os.makedirs(pruned, exist_ok=True)
        for i in ids:
            shutil.copy2(
                os.path.join(ensemble_dir, f"checkpoint_{i}.msgpack"),
                os.path.join(pruned, f"checkpoint_{i}.msgpack"))
        ensemble_dir = pruned
    if not (args.skip_train and
            os.path.exists(os.path.join(run_dir, "eval_results_ensemble.json"))):
        print(f"[acceptance] ensemble-evaluating {ensemble_dir}...")
        rc = chexpert_main(
            base + ["--evaluate_ensemble", "--restore", ensemble_dir]
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

    compute_rate = compute_floor = None
    if not (on_cpu or args.tiny or args.sabotage):
        row = _artifact_compute_row(args.arch)
        if row:
            art_img_s, art_batch, art_hw = row
            compute_floor = round(COMPUTE_FLOOR_FRACTION * art_img_s, 1)
            print(f"[acceptance] compute-only probe at batch {art_batch} "
                  f"@ {art_hw}^2 (artifact row {art_img_s} img/s)...")
            compute_rate = _probe_compute_img_s(args.arch, art_batch, art_hw)

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
    if compute_rate is not None:
        checks["compute_images_per_sec"] = (
            compute_rate, (compute_floor, None), compute_rate >= compute_floor,
        )
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
        # inverted verdict: the gate must CATCH the injected regression via
        # the checks that regression targets — 'uzeros' craters AUC
        # (throughput unaffected), 'einsum' halves attention-arch
        # throughput (numerics unaffected)
        if args.sabotage == "einsum":
            caught = not checks["train_images_per_sec"][2]
        else:
            caught = not (checks["single_model_mean_auc"][2]
                          and checks["ensemble_mean_auc"][2])
        result["sabotage"] = args.sabotage
        if args.sabotage == "einsum":
            result["sabotage_note"] = (
                f"einsum run at batch {batch} (its (B,nh,HW,HW) f32 logits "
                "+ softmax residuals OOM at the gate's default batch); the "
                "floor failure is attributable to einsum, not the batch — "
                "the same-session batch-16 pallas COMPUTE rate is 144.8 "
                "img/s (BENCH r5 A/B) vs the 97 img/s floor, and the probed "
                "link feeds well above it")
        result["acceptance"] = "PASS" if caught else "FAIL"
        result["arch"] = result["arch"] + f"+sabotage_{args.sabotage}"
        print(json.dumps(result))
        if args.out:
            merge_arch_result(args.out, result)
        return 0 if caught else 1
    print(json.dumps(result))
    if args.out:
        merge_arch_result(args.out, result)
    if args.pretrained_proof and not args.tiny:
        proof = run_pretrained_proof(
            args, workdir, fixture, train_flags, run_dir,
            (auc_floor, auc_ceiling))
        print(json.dumps(proof))
        if args.out:
            merge_arch_result(args.out, proof)
        ok = ok and proof["acceptance"] == "PASS"
    return 0 if ok else 1


def _eval_series(output_dir: str):
    """[(step, mean_auc)] over the run's eval snapshots, step-ascending."""
    paths = glob.glob(os.path.join(output_dir, "eval_results_step_*.json"))
    assert paths, f"no eval_results_step_*.json under {output_dir}"

    def step(p):
        return int(os.path.basename(p).rsplit("_", 1)[1].split(".")[0])

    return sorted((step(p), _mean_auc(json.load(open(p)))) for p in paths)


def run_pretrained_proof(args, workdir: str, fixture: dict, train_flags,
                         scratch_run_dir: str, band) -> dict:
    """End-to-end --pretrained proof (round-4 verdict #7).

    The importer is format-proven (tests/test_pretrained_real_format.py);
    this proves the POINT of --pretrained (reference chexpert.py:461-466):
    pretrain on a DIFFERENTLY-SEEDED synthetic dataset (same generative
    process — the transfer analogue of ImageNet->CheXpert), export through
    the torchvision .pth format, re-enter via the production import path,
    and show better first-eval AUC than the scratch gate run on the same
    fixture."""
    from chexpert_tpu.cli.chexpert import main as chexpert_main

    assert args.arch in ("densenet121", "resnet152"), (
        "--pretrained-proof covers the torchvision-importable archs")

    # 1. differently-seeded pretraining dataset (same difficulty)
    pre_data = os.path.join(workdir, "pretrain_data")
    marker = os.path.join(pre_data, "fixture.json")
    pre_fixture = dict(fixture, seed=7)
    if not (os.path.exists(marker) and json.load(open(marker)) == pre_fixture):
        if os.path.isdir(pre_data):
            shutil.rmtree(pre_data)
        os.makedirs(pre_data)
        print(f"[acceptance] building pretrain fixture under {pre_data}")
        from chexpert_tpu.data import make_synthetic_dataset

        make_synthetic_dataset(pre_data, **pre_fixture)
        json.dump(pre_fixture, open(marker, "w"))

    # 2. pretrain in THIS framework
    pre_run = os.path.join(workdir, f"run_pretrain_src_{args.arch}")
    if not os.path.exists(os.path.join(pre_run, "checkpoint_latest.msgpack")):
        print("[acceptance] pretraining on the seed-7 dataset...")
        rc = chexpert_main(["--data_path", pre_data, "--output_dir", pre_run,
                            "--train"] + train_flags)
        assert rc in (0, None), f"pretrain exited {rc}"

    # 3. export the pretrained weights through the torchvision .pth format
    import jax as _jax
    import jax.numpy as jnp

    from chexpert_tpu.checkpoint import load_model_checkpoint
    from chexpert_tpu.models import build_model
    from chexpert_tpu.models.pretrained import export_torch_state_dict
    from chexpert_tpu.train import init_model

    model, _ = build_model(args.arch, image_size=320, dtype=jnp.bfloat16)
    params, stats = init_model(model, _jax.random.PRNGKey(0), (1, 320, 320, 3))
    ck = load_model_checkpoint(
        os.path.join(pre_run, "checkpoint_latest.msgpack"), params, stats)
    pth_dir = os.path.join(workdir, "pth")
    os.makedirs(pth_dir, exist_ok=True)
    n = export_torch_state_dict(
        ck["params"], ck["batch_stats"], args.arch,
        os.path.join(pth_dir, f"{args.arch}.pth"))
    print(f"[acceptance] exported {n} tensors to {pth_dir}/{args.arch}.pth")

    # 4. gate-fixture run FROM the imported weights (production import path)
    pt_run = os.path.join(workdir, f"run_{args.arch}_pretrained")
    if os.path.isdir(pt_run) and not args.skip_train:
        shutil.rmtree(pt_run)
    os.environ[  # the CLI's load_pretrained reads this
        "CHEXPERT_TPU_PRETRAINED_DIR"] = pth_dir
    if not args.skip_train or not os.path.isdir(pt_run):
        print("[acceptance] training from imported pretrained weights...")
        rc = chexpert_main(["--data_path", workdir, "--output_dir", pt_run,
                            "--train", "--evaluate_single_model",
                            "--pretrained"] + train_flags)
        assert rc in (0, None), f"pretrained train exited {rc}"

    # 5. convergence comparison vs the scratch gate run
    scratch = _eval_series(scratch_run_dir)
    pre = _eval_series(pt_run)
    delta_first = pre[0][1] - scratch[0][1]
    best = max(a for _, a in pre)
    auc_floor, auc_ceiling = band
    checks = {
        "single_model_mean_auc": (
            best, (auc_floor, auc_ceiling), auc_floor <= best <= auc_ceiling),
        # the point of --pretrained: materially faster convergence. The
        # fixture's ~1% AUC noise sets the 2x-noise margin (r4 verdict #4).
        "convergence_delta_first_eval": (
            delta_first, (0.02, None), delta_first >= 0.02),
    }
    ok = all(passed for _, _, passed in checks.values())
    import jax

    return {
        "acceptance": "PASS" if ok else "FAIL",
        "mode": "production",
        "arch": f"{args.arch}_pretrained",
        "device": str(jax.devices()[0]),
        "first_eval_auc": {"scratch": round(scratch[0][1], 4),
                           "pretrained": round(pre[0][1], 4),
                           "at_step": scratch[0][0]},
        **{k: {"value": round(v, 4), "bounds": b, "ok": passed}
           for k, (v, b, passed) in checks.items()},
    }


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
