"""chexpert CLI — train / evaluate / ensemble / visualize / plot ROC.

Flag surface mirrors the reference driver (/root/reference/chexpert.py:29-57,
433-573):
    python -m chexpert_tpu.cli.chexpert --train --data_path DIR ...
    python -m chexpert_tpu.cli.chexpert --evaluate_single_model --restore CKPT ...
    python -m chexpert_tpu.cli.chexpert --evaluate_ensemble --restore DIR ...
    python -m chexpert_tpu.cli.chexpert --visualize --restore CKPT ...
    python -m chexpert_tpu.cli.chexpert --plot_roc --output_dir DIR
"""

from __future__ import annotations

import argparse
import os
import pprint

import jax
import numpy as np

from chexpert_tpu.checkpoint import (
    load_model_checkpoint,
    load_optim_checkpoint,
)
from chexpert_tpu.configs import Config, resolve_output_dir, setup_output_dir
from chexpert_tpu.data import (
    Batches,
    ChexpertIndex,
    denormalize,
    extract_patient_ids,
)
from chexpert_tpu.eval.ensemble import evaluate_ensemble, list_checkpoints
from chexpert_tpu.interpret import grad_cam, plot_roc, save_attn_maps, save_vis_grids
from chexpert_tpu.interpret.capture import capture_attention_weights
from chexpert_tpu.models import build_model
from chexpert_tpu.parallel.mesh import create_mesh
from chexpert_tpu.train import TrainState, init_model, jit_steps, make_optimizer
from chexpert_tpu.train.loop import evaluate_single_model, train_and_evaluate
from chexpert_tpu.utils import MetricsWriter, load_json, save_json


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    # action (reference chexpert.py:31-37)
    p.add_argument("--load_config", type=str, help="Path to config.json to load args from.")
    p.add_argument("--train", action="store_true", help="Train model.")
    p.add_argument("--evaluate_single_model", action="store_true")
    p.add_argument("--evaluate_ensemble", action="store_true")
    p.add_argument("--visualize", action="store_true", help="Visualize Grad-CAM.")
    p.add_argument("--plot_roc", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    # paths
    p.add_argument("--data_path", default="")
    p.add_argument("--output_dir", default="")
    p.add_argument("--restore", type=str, default="")
    # model
    p.add_argument("--model", default="densenet121")
    # data
    p.add_argument("--mini_data", type=int, default=None)
    p.add_argument("--resize", type=int, default=None)
    p.add_argument("--data_filter", type=str, default="",
                   help='JSON row filter, e.g. \'{"Frontal/Lateral": "Frontal"}\''
                        " (reference dataset.py:144-151).")
    # training
    p.add_argument("--pretrained", action="store_true")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--n_epochs", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--lr_warmup_steps", type=int, default=0)
    p.add_argument("--lr_decay_factor", type=float, default=0.97)
    p.add_argument("--log_interval", type=int, default=50)
    p.add_argument("--eval_interval", type=int, default=300)
    # TPU-native knobs
    p.add_argument("--uncertain_policy", default="ones",
                   choices=["ones", "zeros", "ignore"])
    p.add_argument("--profile", action="store_true",
                   help="Capture a jax.profiler trace of the first train steps.")
    p.add_argument("--auto_resume", action="store_true",
                   help="Resume from output_dir/checkpoint_latest.msgpack if present.")
    p.add_argument("--compute_dtype", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--data_parallel", type=int, default=0)
    p.add_argument("--model_parallel", type=int, default=1)
    p.add_argument("--multihost", action="store_true",
                   help="Multi-process (TPU pod) mode: jax.distributed init, "
                        "host-contiguous hybrid mesh, per-host batch slices. "
                        "Run the same command on every host; batch_size stays "
                        "the GLOBAL batch size.")
    p.add_argument("--attn_impl", default="pallas", choices=["pallas", "pallas-fusedpack", "pallas-bd", "einsum"])
    p.add_argument("--data_workers", type=int, default=8)
    p.add_argument("--prefetch", type=int, default=2)
    p.add_argument("--ensemble_member_chunk", type=int, default=0,
                   help="members per stacked-vmap ensemble pass; 0 = all at "
                        "once with auto-halving on device OOM")
    p.add_argument("--image_size", type=int, default=320)
    p.add_argument("--data_aug", action="store_true")
    p.add_argument("--packed_cache", action="store_true",
                   help="Decode-once uint8 cache for the input pipeline.")
    p.add_argument("--device_aug", action="store_true",
                   help="Run crop/flip augmentation on device (default: host; "
                        "host-side crops measured faster on v5e).")
    return p


def config_from_args(argv=None) -> Config:
    args = build_parser().parse_args(argv)
    raw = vars(args)
    load_config = raw.pop("load_config", None)
    cfg = Config.from_dict(raw)
    if load_config:  # config overlay (reference chexpert.py:437)
        overlay = load_json(load_config)
        cfg = cfg.replace(**{k: v for k, v in overlay.items()
                             if k in Config.__dataclass_fields__})
    return cfg


class Runner:
    """Holds the live objects: mesh, model, optimizer, state, pipelines."""

    def __init__(self, cfg: Config):
        self.cfg = cfg
        if cfg.multihost:
            from chexpert_tpu.parallel import multihost

            multihost.initialize()
            assert cfg.batch_size % max(jax.process_count(), 1) == 0, (
                f"global batch_size {cfg.batch_size} must divide over "
                f"{jax.process_count()} processes"
            )
            self.mesh = multihost.create_hybrid_mesh(
                cfg.data_parallel, cfg.model_parallel
            )
            # each process loads only its contiguous shard of the global
            # batch, derived from (and validated against) the mesh layout
            self.host_slice = multihost.host_batch_slice_from_mesh(
                self.mesh, cfg.batch_size
            )
        else:
            self.mesh = create_mesh(cfg.data_parallel, cfg.model_parallel)
            self.host_slice = None
        n_data = self.mesh.shape["data"]
        assert cfg.batch_size % n_data == 0, (
            f"batch_size {cfg.batch_size} must divide over data axis {n_data}"
        )

        import jax.numpy as jnp

        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        self.model, self.opt_spec = build_model(
            cfg.model, image_size=cfg.resize or cfg.image_size,
            dtype=dtype, attn_impl=cfg.attn_impl,
        )
        # --lr_decay_factor overrides the arch spec's exponential gamma
        # (reference chexpert.py:54,500 — the flag feeds ExponentialLR)
        import dataclasses

        self.opt_spec = dataclasses.replace(
            self.opt_spec, decay_factor=cfg.lr_decay_factor
        )
        self.tx, self.schedule = make_optimizer(
            self.opt_spec, cfg.lr, cfg.lr_warmup_steps, "hold",
        )

        hw = cfg.resize or cfg.image_size
        rng = jax.random.PRNGKey(cfg.seed)
        params, batch_stats = init_model(self.model, rng, (1, hw, hw, 3))
        # --pretrained only matters for FRESH initialization: when a full
        # checkpoint restore is pending (explicit --restore or an auto-resume
        # hit), the ImageNet weights would be immediately overwritten — and
        # restoring a pretrained-trained run must not require the pretrained
        # weight files to still exist
        restore_pending = bool(cfg.restore) or (
            cfg.auto_resume
            and os.path.exists(os.path.join(cfg.output_dir, "checkpoint_latest.msgpack"))
        )
        if cfg.pretrained and not restore_pending:
            from chexpert_tpu.models.pretrained import load_pretrained

            params, batch_stats = load_pretrained(cfg.model, params, batch_stats)
        self.state = TrainState.create(params, batch_stats, self.tx)
        self.start_step = 0
        self._maybe_restore()

        from chexpert_tpu.parallel.mesh import replicated

        self.state = jax.device_put(self.state, replicated(self.mesh))
        # --device_aug: random crop/flip fused into the train step from the
        # margin-stored tiles (train/steps.py::device_augment)
        device_crop = hw if (cfg.data_aug and cfg.packed_cache and cfg.device_aug) else None
        self.train_step, self.eval_step = jit_steps(
            self.model, self.tx, self.mesh, cfg.seed, device_crop=device_crop
        )

    def _maybe_restore(self):
        cfg = self.cfg
        # preemption recovery: --auto_resume picks up the latest checkpoint
        # in output_dir without an explicit --restore (the contract is
        # resume-from-latest with step + optimizer state)
        if cfg.auto_resume and not cfg.restore:
            latest = os.path.join(cfg.output_dir, "checkpoint_latest.msgpack")
            if os.path.exists(latest):
                cfg = self.cfg = cfg.replace(restore=latest)
        if cfg.restore and os.path.isfile(cfg.restore):
            print(f"Restoring model weights from {cfg.restore}")
            ck = load_model_checkpoint(cfg.restore, self.state.params, self.state.batch_stats)
            self.state = self.state.replace(
                params=ck["params"],
                batch_stats=ck["batch_stats"],
                step=np.int32(ck["global_step"]),
            )
            self.start_step = ck["global_step"]
            if cfg.train:
                optim_path = os.path.join(
                    os.path.dirname(cfg.restore),
                    "optim_" + os.path.basename(cfg.restore),
                )
                if os.path.exists(optim_path):
                    print("Restoring optimizer.")
                    self.state = self.state.replace(
                        opt_state=load_optim_checkpoint(optim_path, self.state.opt_state)
                    )

    # --- data ---
    def index(self, mode: str) -> ChexpertIndex:
        import json as _json

        return ChexpertIndex(
            self.cfg.data_path, mode,
            data_filter=_json.loads(self.cfg.data_filter) if self.cfg.data_filter else None,
            mini_data=self.cfg.mini_data,
            uncertain_policy=self.cfg.uncertain_policy,
        )

    def batches(self, index: ChexpertIndex, train: bool, epoch: int = 0):
        cfg = self.cfg
        # drop_last in train: a zero-padded partial batch would pollute the
        # BatchNorm batch statistics (eval keeps padding+mask — running stats
        # make padded rows inert there)
        drop_last = train and len(index) >= cfg.batch_size
        if cfg.packed_cache and index.mode != "test":
            import os as _os

            from chexpert_tpu.data.chexpert import DIR_NAME
            from chexpert_tpu.data.packed import PackedBatches, build_packed_cache

            cache_dir = _os.path.join(cfg.data_path, DIR_NAME, "packed")
            path = build_packed_cache(
                index, cache_dir, image_size=cfg.resize or cfg.image_size,
                resize=cfg.resize, workers=cfg.data_workers,
                pack_margin=32 if (train and cfg.data_aug) else 0,
            )
            # host-side crops from the memmap measured faster than device-side
            # (560/423/279 img/s for none/host/device aug on v5e) — the
            # vmapped per-image dynamic_slice lowers to slow gathers; device
            # aug stays available via --device_aug
            device_aug = train and cfg.data_aug and cfg.device_aug
            return PackedBatches(
                index, path, cfg.batch_size,
                image_size=cfg.resize or cfg.image_size,
                shuffle=train, augment=train and cfg.data_aug and not device_aug,
                emit_stored=device_aug,
                drop_last=drop_last, seed=cfg.seed, epoch=epoch,
                host_slice=self.host_slice,
            )
        return Batches(
            index, cfg.batch_size, shuffle=train,
            augment=train and cfg.data_aug,
            image_size=cfg.image_size, resize=cfg.resize,
            workers=cfg.data_workers, seed=cfg.seed, epoch=epoch,
            drop_last=drop_last,
            host_slice=self.host_slice,
        )

    def n_params(self) -> int:
        return sum(x.size for x in jax.tree_util.tree_leaves(self.state.params))


def reread_pretrained_flag(cfg: Config) -> Config:
    """pretrained flag re-read from saved config on restore
    (chexpert.py:521-524 — "in case forgotten e.g. in post-training
    evaluation"). The reference reads output_dir/config.json, which only
    honors that intent when restoring INTO the original run dir; we prefer
    the config saved next to the restore target itself (its run dir,
    stepping out of best_checkpoints/), falling back to
    output_dir/config.json."""
    if not cfg.restore:
        return cfg
    run_dir = cfg.restore if os.path.isdir(cfg.restore) else os.path.dirname(cfg.restore)
    if os.path.basename(os.path.normpath(run_dir)) == "best_checkpoints":
        run_dir = os.path.dirname(os.path.normpath(run_dir))
    for saved_cfg in (os.path.join(run_dir, "config.json"),
                      os.path.join(cfg.output_dir, "config.json")):
        if os.path.exists(saved_cfg):
            return cfg.replace(
                pretrained=load_json(saved_cfg).get("pretrained", cfg.pretrained))
    return cfg


def main(argv=None) -> int:
    cfg = config_from_args(argv)
    from chexpert_tpu.utils.io import enable_compilation_cache
    enable_compilation_cache()

    if cfg.multihost:
        # distributed init must precede any artifact writes: process_index
        # gates them (primary-only), and a timestamped default output_dir
        # would diverge across processes
        from chexpert_tpu.parallel import multihost

        multihost.initialize()
        if jax.process_count() > 1:
            assert cfg.output_dir, "--multihost requires an explicit --output_dir"

    cfg = resolve_output_dir(cfg)
    setup_output_dir(cfg)
    writer = MetricsWriter(cfg.output_dir)
    writer.add_text("config", str(cfg.to_dict()))

    cfg = reread_pretrained_flag(cfg)

    runner = Runner(cfg)
    print(
        f"Loaded {cfg.model} (number of parameters: {runner.n_params():,}; "
        f"weights trained to step {runner.start_step})"
    )
    print(f"Mesh: {dict(runner.mesh.shape)} on {len(jax.devices())} device(s)")

    valid_index = runner.index("valid")
    valid_batches = runner.batches(valid_index, train=False)

    if cfg.train:
        train_index = runner.index("train")
        print("Train data length:", len(train_index))
        print("Valid data length:", len(valid_index))
        runner.state = train_and_evaluate(
            cfg, runner.train_step, runner.eval_step, runner.state,
            lambda epoch: runner.batches(train_index, train=True, epoch=epoch),
            valid_batches, runner.schedule, writer, runner.mesh,
        )

    if cfg.evaluate_single_model:
        metrics = evaluate_single_model(
            runner.eval_step, runner.state, valid_batches, runner.mesh
        )
        step = int(runner.state.step)
        print(f"Evaluate metrics -- \n\t restore: {cfg.restore} \n\t step: {step}:")
        print("AUC:\n", pprint.pformat(metrics["aucs"]))
        print("Loss:\n", pprint.pformat(metrics["loss"]))
        save_json(metrics, f"eval_results_step_{step}", cfg.output_dir)

    if cfg.evaluate_ensemble:
        assert os.path.isdir(cfg.restore), (
            "Restore argument must be directory with saved checkpoints"
        )
        paths = list_checkpoints(cfg.restore)
        print(f"Running ensemble prediction using {len(paths)} checkpoints.")
        metrics = evaluate_ensemble(
            runner.model, paths, runner.state.params, runner.state.batch_stats,
            valid_batches, runner.mesh, member_chunk=cfg.ensemble_member_chunk,
        )
        print("AUC:\n", pprint.pformat(metrics["aucs"]))
        print("Loss:\n", pprint.pformat(metrics["loss"]))
        save_json(metrics, "eval_results_ensemble", cfg.output_dir)

    if cfg.visualize:
        # vis batches are tiny and the artifact path is file-based; per-host
        # batch slicing would hand each process partial categories (and race
        # on the PNGs) — run it single-process against the checkpoint instead
        assert jax.process_count() == 1, (
            "--visualize is a single-process tool: run it without --multihost "
            "on one host, restoring the checkpoint"
        )
        run_visualize(cfg, runner, writer)

    if cfg.plot_roc:
        filenames = [
            f for f in os.listdir(cfg.output_dir)
            if f.startswith("eval_results") and f.endswith(".json")
        ]
        if not filenames:
            raise RuntimeError(
                f"No `eval_results` files found in `{cfg.output_dir}` to plot results from."
            )
        for f in filenames:
            metrics = load_json(os.path.join(cfg.output_dir, f))
            plot_roc(metrics, cfg.output_dir, "roc_pr_" + f.split(".")[0])

    writer.close()
    return 0


def run_visualize(cfg: Config, runner: Runner, writer: MetricsWriter) -> None:
    """Grad-CAM grids + attention maps (reference chexpert.py:305-397,556-563)."""
    import jax.numpy as jnp

    vis_index = runner.index("vis")
    vis_batches = runner.batches(vis_index, train=False)
    variables = {"params": runner.state.params, "batch_stats": runner.state.batch_stats}

    imgs, labels, probs, masks, idx_list = [], [], [], [], []
    attn_per_layer = None
    for batch in vis_batches:
        if batch["image"].dtype == np.uint8:  # packed pipeline ships raw u8
            from chexpert_tpu.data.chexpert import PIXEL_MEAN, PIXEL_STD

            f = (batch["image"].astype(np.float32) / 255.0 - PIXEL_MEAN) / PIXEL_STD
            batch = dict(batch, image=np.broadcast_to(f, f.shape[:-1] + (3,)).copy())
        x = jnp.asarray(batch["image"])
        cam, logits = grad_cam(runner.model, variables, x)
        m = batch["mask"].astype(bool)
        imgs.append(denormalize(batch["image"][m]))
        labels.append(batch["label"][m])
        probs.append(np.asarray(jax.nn.sigmoid(logits))[m])
        masks.append(np.asarray(cam)[m])
        idx_list += batch["index"][m].tolist()
        # attention maps: rerun capturing softmax weights (einsum path),
        # chunked over the batch — full-batch capture is O(B*nh*(HW)^2)
        # memory, ~2 GB f32 for a 24-image vis batch at 320^2 (the
        # reference shares this hazard, attn_aug_conv.py:87)
        weights = capture_attention_weights(runner.model, variables, x)
        if weights:
            w = [wi[m] for wi in weights]
            attn_per_layer = (
                w if attn_per_layer is None
                else [np.concatenate([a, b]) for a, b in zip(attn_per_layer, w)]
            )
    imgs = np.concatenate(imgs)
    labels = np.concatenate(labels)
    probs = np.concatenate(probs)
    masks = np.concatenate(masks)

    patient_ids = extract_patient_ids(vis_index, idx_list)
    save_vis_grids(
        imgs, masks, labels, probs, idx_list, patient_ids,
        vis_index.vis_attrs, vis_index.vis_idxs, cfg.output_dir,
        int(runner.state.step),
    )
    if attn_per_layer:
        for b in range(len(imgs)):
            save_attn_maps(
                imgs, attn_per_layer, patient_ids, idx_list, cfg.output_dir, b
            )


if __name__ == "__main__":
    raise SystemExit(main())
