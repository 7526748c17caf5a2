"""CIFAR model test-bench CLI — functionality proxy before CheXpert runs.

Behavioral parity with /root/reference/models/test_model.py: per-arch
subcommands (efficientnet/resnet/wideresnet/densenet), attention flags,
CIFAR-10/100 with the standard augmentation stack (reflect-pad 4, random
flip, random crop 32 — test_model.py:268-269), cross-entropy training with
per-arch optimizers and warmup schedulers (:283-312), top-1/top-5 accuracy
(:98-102), single-batch --mini_data overfit mode (:59,270-275), checkpoint
save/restore, and attention-map visualization (:203-233).

    python -m chexpert_tpu.cli.bench densenet 12 100 --attn --train ...
    python -m chexpert_tpu.cli.bench efficientnet b0 --train ...

Data: reads the standard CIFAR python pickle layouts
(cifar-10-batches-py / cifar-100-python) under --data_dir. This environment
has no network egress, so --synthetic generates a labeled random dataset with
the same shapes for hermetic smoke runs.
"""

from __future__ import annotations

import argparse
import os
import pickle
import time
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from chexpert_tpu.checkpoint import (
    load_model_checkpoint,
    load_optim_checkpoint,
    save_model_checkpoint,
    save_optim_checkpoint,
)
from chexpert_tpu.models import (
    AttnParams,
    DenseNet,
    EfficientNet,
    OptimizerSpec,
    ResNet,
    WideResNet,
)
from chexpert_tpu.parallel.mesh import batch_sharding, create_mesh, replicated
from chexpert_tpu.train import TrainState, init_model, make_optimizer
from chexpert_tpu.utils import MetricsWriter, save_json

# reference normalization constants (test_model.py:268)
CIFAR_MEAN = np.array([125.3, 123.0, 113.9], np.float32) / 255.0
CIFAR_STD = np.array([63.0, 62.1, 66.7], np.float32) / 255.0

RESNET_LAYERS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


def build_parser() -> argparse.ArgumentParser:
    common = argparse.ArgumentParser(add_help=False)
    # attention params (test_model.py:45-50)
    common.add_argument("--attn", action="store_true")
    common.add_argument("--attn_k", type=float, default=0.2)
    common.add_argument("--attn_v", type=float, default=0.1)
    common.add_argument("--attn_nh", type=int, default=8)
    common.add_argument("--attn_relative", type=lambda s: s.lower() != "false", default=True)
    common.add_argument("--input_dims", default=(32, 32), type=int, nargs="+")
    common.add_argument("--attn_impl", default="pallas", choices=["pallas", "pallas-fusedpack", "pallas-bd", "einsum"])
    # actions
    common.add_argument("--train", action="store_true")
    common.add_argument("--evaluate", action="store_true")
    common.add_argument("--vis_attn", action="store_true")
    common.add_argument("--seed", type=int, default=0)
    common.add_argument("--mini_data", action="store_true",
                        help="Truncate dataset to a single batch (overfit check).")
    common.add_argument("--synthetic", action="store_true",
                        help="Generate a synthetic dataset (no CIFAR download possible).")
    # paths
    common.add_argument("--dataset", default="cifar100", choices=["cifar10", "cifar100"])
    common.add_argument("--data_dir", default="~/data/cifar100/")
    common.add_argument("--output_dir", default="")
    common.add_argument("--restore", type=str, default="")
    # training params (test_model.py:68-78)
    common.add_argument("--batch_size", type=int, default=256)
    common.add_argument("--n_epochs", type=int, default=1)
    common.add_argument("--log_interval", type=int, default=1)
    common.add_argument("--eval_interval", type=int, default=10)
    common.add_argument("--weight_decay", type=float, default=1e-5)
    common.add_argument("--lr", type=float, default=0.016)
    common.add_argument("--lr_warmup_epochs", type=int, default=5)
    common.add_argument("--lr_cos_max_epochs", type=int, default=25)
    common.add_argument("--lr_decay_factor", type=float, default=0.97)
    common.add_argument("--lr_decay_epochs", type=float, default=2.4)
    common.add_argument("--compute_dtype", default="bfloat16",
                        choices=["bfloat16", "float32"])
    common.add_argument("--data_parallel", type=int, default=0)

    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="model", required=True)
    pa = sub.add_parser("efficientnet", parents=[common])
    pa.add_argument("architecture", default="b0",
                    choices=[f"b{i}" for i in range(8)])
    pb = sub.add_parser("resnet", parents=[common])
    pb.add_argument("architecture", type=int, default=50, choices=[50, 101, 152])
    pc = sub.add_parser("wideresnet", parents=[common])
    pc.add_argument("architecture", type=int, default=[28, 10], nargs=2)
    pd = sub.add_parser("densenet", parents=[common])
    pd.add_argument("architecture", type=int, default=[12, 100], nargs=2)
    return p


# --------------------
# data
# --------------------

def load_cifar(data_dir: str, dataset: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Standard CIFAR python pickle layout -> (x_train, y_train, x_test, y_test).
    Images uint8 NHWC."""
    d = os.path.expanduser(data_dir)

    def unpickle(f):
        with open(f, "rb") as fh:
            return pickle.load(fh, encoding="bytes")

    if dataset == "cifar10":
        base = os.path.join(d, "cifar-10-batches-py")
        xs, ys = [], []
        for i in range(1, 6):
            b = unpickle(os.path.join(base, f"data_batch_{i}"))
            xs.append(b[b"data"])
            ys += list(b[b"labels"])
        xtr = np.concatenate(xs)
        ytr = np.array(ys)
        t = unpickle(os.path.join(base, "test_batch"))
        xte, yte = t[b"data"], np.array(t[b"labels"])
    else:
        base = os.path.join(d, "cifar-100-python")
        t = unpickle(os.path.join(base, "train"))
        xtr, ytr = t[b"data"], np.array(t[b"fine_labels"])
        t = unpickle(os.path.join(base, "test"))
        xte, yte = t[b"data"], np.array(t[b"fine_labels"])

    def to_nhwc(x):
        return x.reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)

    return to_nhwc(xtr), ytr, to_nhwc(xte), yte


def synthetic_cifar(n_classes: int, n_train=512, n_test=256, seed=0):
    """Labeled random data with a planted class signal (hermetic smoke)."""
    rng = np.random.RandomState(seed)
    def gen(n):
        y = rng.randint(0, n_classes, n)
        x = rng.randint(0, 255, (n, 32, 32, 3)).astype(np.uint8)
        for i in range(n):  # plant: class index brightens a pixel row pattern
            x[i, y[i] % 32, :, :] = 255
        return x, y
    xtr, ytr = gen(n_train)
    xte, yte = gen(n_test)
    return xtr, ytr, xte, yte


def normalize(x_uint8: np.ndarray) -> np.ndarray:
    return (x_uint8.astype(np.float32) / 255.0 - CIFAR_MEAN) / CIFAR_STD


def augment(x_uint8: np.ndarray, rng: np.random.RandomState) -> np.ndarray:
    """reflect-pad 4 + random flip + random crop 32 (test_model.py:269)."""
    n = len(x_uint8)
    padded = np.pad(x_uint8, ((0, 0), (4, 4), (4, 4), (0, 0)), mode="reflect")
    out = np.empty_like(x_uint8)
    tops = rng.randint(0, 9, n)
    lefts = rng.randint(0, 9, n)
    flips = rng.rand(n) < 0.5
    for i in range(n):
        img = padded[i, tops[i] : tops[i] + 32, lefts[i] : lefts[i] + 32]
        out[i] = img[:, ::-1] if flips[i] else img
    return out


# --------------------
# model / optimizer factory (test_model.py:283-312)
# --------------------

def build_bench_model(args, n_classes: int, n_batches: int, dtype):
    attn = None
    if args.attn:
        attn = AttnParams(args.attn_k, args.attn_v, args.attn_nh,
                          args.attn_relative, tuple(args.input_dims))
    warmup = args.lr_warmup_epochs * n_batches
    if args.model == "efficientnet":
        model = EfficientNet(f"efficientnet-{args.architecture}",
                             num_classes=n_classes, dtype=dtype)
        spec = OptimizerSpec("rmsprop", "exponential",
                             decay_factor=args.lr_decay_factor,
                             decay_steps=max(1, int(args.lr_decay_epochs * n_batches)))
        tx, sched = make_optimizer(spec, args.lr, warmup, "linear")
    elif args.model == "resnet":
        model = ResNet("bottleneck", RESNET_LAYERS[args.architecture],
                       num_classes=n_classes, attn=attn, dtype=dtype,
                       attn_impl=args.attn_impl)
        spec = OptimizerSpec("sgd_nesterov", "cosine", weight_decay=args.weight_decay)
        tx, sched = make_optimizer(spec, args.lr, warmup, "linear",
                                   cosine_decay_steps=args.lr_cos_max_epochs * n_batches)
    elif args.model == "wideresnet":
        d, w = args.architecture
        model = WideResNet(d, w, num_classes=n_classes, attn=attn, dtype=dtype,
                           attn_impl=args.attn_impl)
        spec = OptimizerSpec("sgd_nesterov", "cosine", weight_decay=args.weight_decay)
        tx, sched = make_optimizer(spec, args.lr, warmup, "linear",
                                   cosine_decay_steps=args.lr_cos_max_epochs * n_batches)
    elif args.model == "densenet":
        k, L = args.architecture
        model = DenseNet(k, ((L - 4) // 6,) * 3, 2 * k, num_classes=n_classes,
                         attn=attn, dtype=dtype, attn_impl=args.attn_impl,
                         prefix_stats=True)
        spec = OptimizerSpec("sgd_nesterov", "multistep",
                             milestones=(100 * n_batches, 150 * n_batches),
                             weight_decay=args.weight_decay)
        tx, sched = make_optimizer(spec, args.lr, warmup, "linear")
    else:
        raise RuntimeError("Model not supported.")
    return model, tx, sched


# --------------------
# steps / metrics
# --------------------

def topk_accuracy(logits: np.ndarray, y: np.ndarray, ks=(1, 5)):
    """(test_model.py:98-102)"""
    order = np.argsort(-logits, axis=1)
    return [float(np.mean([(y[i] in order[i, :k]) for i in range(len(y))])) for k in ks]


def make_steps(model, tx, mesh, seed=0):
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))

    def train_step(state, x, y):
        rng = jax.random.fold_in(jax.random.PRNGKey(seed), state.step)

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats}, x,
                train=True, mutable=["batch_stats"], rngs={"dropout": rng},
            )
            logp = jax.nn.log_softmax(out.astype(jnp.float32))
            loss = -jnp.take_along_axis(logp, y[:, None], axis=1).mean()
            return loss, mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        import optax

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, new_params, new_stats, new_opt), loss

    def eval_step(state, x):
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats}, x, train=False
        ).astype(jnp.float32)

    train_jit = jax.jit(train_step, in_shardings=(repl, data, data),
                        out_shardings=(repl, repl), donate_argnums=(0,))
    eval_jit = jax.jit(eval_step, in_shardings=(repl, data), out_shardings=data)
    return train_jit, eval_jit


def evaluate(eval_step, state, x, y, batch_size, mesh) -> Tuple[float, float, float]:
    sh = batch_sharding(mesh)
    losses, logits_all = 0.0, []
    n = len(x)
    bs = batch_size
    for s in range(0, n - n % bs, bs):  # full batches only (static shapes)
        xb = jax.device_put(jnp.asarray(normalize(x[s : s + bs])), sh)
        logits = np.asarray(eval_step(state, xb))
        logits_all.append(logits)
    logits = np.concatenate(logits_all) if logits_all else np.zeros((0, 1))
    yy = y[: len(logits)]
    logp = logits - logits.max(1, keepdims=True)
    logp = logp - np.log(np.exp(logp).sum(1, keepdims=True))
    loss = float(-logp[np.arange(len(yy)), yy].mean()) if len(yy) else float("nan")
    top1, top5 = topk_accuracy(logits, yy) if len(yy) else (0.0, 0.0)
    return loss, top1, top5


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from chexpert_tpu.utils.io import enable_compilation_cache
    enable_compilation_cache()

    if not args.output_dir:
        args.output_dir = os.path.join(
            "results", args.model, time.strftime("%Y-%m-%d_%H-%M-%S", time.gmtime())
        )
    os.makedirs(args.output_dir, exist_ok=True)
    writer = MetricsWriter(args.output_dir)
    save_json(vars(args), "config", args.output_dir)

    n_classes = 10 if args.dataset == "cifar10" else 100
    if args.synthetic:
        xtr, ytr, xte, yte = synthetic_cifar(n_classes, seed=args.seed)
    else:
        xtr, ytr, xte, yte = load_cifar(args.data_dir, args.dataset)
    if args.mini_data:
        xtr, ytr = xtr[: args.batch_size], ytr[: args.batch_size]
        xte, yte = xtr, ytr

    n_batches = max(1, len(xtr) // args.batch_size)
    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    model, tx, sched = build_bench_model(args, n_classes, n_batches, dtype)

    mesh = create_mesh(args.data_parallel, 1)
    params, stats = init_model(model, jax.random.PRNGKey(args.seed), (1, 32, 32, 3))
    state = TrainState.create(params, stats, tx)

    if args.restore:
        print(f"Restoring model weights from {args.restore}")
        ck = load_model_checkpoint(args.restore, state.params, state.batch_stats)
        state = state.replace(params=ck["params"], batch_stats=ck["batch_stats"],
                              step=np.int32(ck["global_step"]))
        optim_path = os.path.join(os.path.dirname(args.restore),
                                  "optim_" + os.path.basename(args.restore))
        if os.path.exists(optim_path):
            state = state.replace(
                opt_state=load_optim_checkpoint(optim_path, state.opt_state))

    state = jax.device_put(state, replicated(mesh))
    train_step, eval_step = make_steps(model, tx, mesh, args.seed)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    print(f"Loaded {args.model}-{args.architecture} (number of parameters: {n_params:,})")

    rng = np.random.RandomState(args.seed)
    sh = batch_sharding(mesh)

    step = int(state.step)  # host-side mirror: avoid per-step device fetches
    if args.train:
        for epoch in range(args.n_epochs):
            order = rng.permutation(len(xtr)) if not args.mini_data else np.arange(len(xtr))
            for s in range(0, len(xtr) - len(xtr) % args.batch_size, args.batch_size):
                idx = order[s : s + args.batch_size]
                xb = xtr[idx] if args.mini_data else augment(xtr[idx], rng)
                xb = jax.device_put(jnp.asarray(normalize(xb)), sh)
                yb = jax.device_put(jnp.asarray(ytr[idx], jnp.int32), sh)
                state, loss = train_step(state, xb, yb)
                step += 1
                if step % args.log_interval == 0:
                    lv = float(loss)
                    writer.add_scalar("train_loss", lv, step)
                    writer.add_scalar("lr", float(sched(step - 1)), step)
                    print(f"epoch {epoch + 1}/{args.n_epochs} step {step} loss {lv:.4f}")
            if (epoch + 1) % args.eval_interval == 0 or epoch == args.n_epochs - 1:
                loss, top1, top5 = evaluate(eval_step, state, xte, yte,
                                            args.batch_size, mesh)
                print(f"Evaluate @ step {int(state.step)}: loss {loss:.4f}; "
                      f"acc@1 {top1:.4f}; acc@5 {top5:.4f}")
                writer.add_scalar("eval_loss", loss, int(state.step))
                writer.add_scalar("acc@top1", top1, int(state.step))
                writer.add_scalar("acc@top5", top5, int(state.step))
                save_model_checkpoint(
                    os.path.join(args.output_dir, "checkpoint.msgpack"),
                    state.params, state.batch_stats, int(state.step))
                save_optim_checkpoint(
                    os.path.join(args.output_dir, "optim_checkpoint.msgpack"),
                    state.opt_state)

    if args.evaluate:
        loss, top1, top5 = evaluate(eval_step, state, xte, yte, args.batch_size, mesh)
        print(f"Evaluate @ step {int(state.step)}: loss {loss:.4f}; "
              f"acc@1 {top1:.4f}; acc@5 {top5:.4f}")

    if args.vis_attn:
        assert args.attn, "Enable --attn flag to visualize attention."
        from chexpert_tpu.interpret import save_attn_maps

        x = xte[:8]
        xb = jnp.asarray(normalize(x))
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        # chunked capture: bounded memory (interpret/capture.py)
        from chexpert_tpu.interpret.capture import capture_attention_weights

        weights = capture_attention_weights(model, variables, xb)
        os.makedirs(os.path.join(args.output_dir, "vis"), exist_ok=True)
        for i in range(len(x)):
            save_attn_maps(x.astype(np.float32) / 255.0, weights,
                           [str(i) for i in range(len(x))],
                           list(range(len(x))), args.output_dir, i)

    writer.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
