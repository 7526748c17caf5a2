"""Measure the PyTorch reference's train step on this host's CPU.

The reference publishes no throughput numbers (SURVEY.md §6), so the perf
baseline must be grounded somewhere measurable. This script times the
reference-equivalent hot loop — torchvision densenet121 (via the test-local
shim, torchvision is not installed here), BCEWithLogitsLoss(reduction='none')
with .sum(1).mean(0), Adam(1e-4), 320x320 inputs — exactly the per-step work
of /root/reference/chexpert.py:152-164 + :461-473, and records images/sec to
BASELINE_TORCH_CPU.json at the repo root.

This is a MEASURED floor (single CPU core); bench.py combines it with a
documented V100-era upper bound to produce a defensible vs_baseline.

Run:  python scripts/measure_torch_baseline.py [--batch 4] [--steps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.dont_write_bytecode = True
sys.path.insert(0, os.path.join(REPO, "tests", "_torchvision_shim"))
sys.path.insert(0, "/root/reference")  # read-only golden oracle import

import torch  # noqa: E402


def _build(arch: str):
    """The reference's own model classes with its factory arguments
    (/root/reference/chexpert.py:461-495)."""
    from models.attn_aug_conv import Bottleneck, DenseNet, ResNet

    attn = {"k": 0.2, "v": 0.1, "nh": 8, "relative": True,
            "input_dims": (320, 320)}
    if arch == "densenet121":
        return DenseNet(num_classes=5)
    if arch == "aadensenet121":
        return DenseNet(32, (6, 12, 24, 16), 64, num_classes=5, attn_params=attn)
    if arch == "aaresnet152":
        return ResNet(Bottleneck, [3, 8, 36, 3], num_classes=5, attn_params=attn)
    if arch == "resnet152":
        # the reference's torchvision-clone ResNet with attention disabled is
        # structurally torchvision resnet152 (attn_aug_conv.py:214-304)
        return ResNet(Bottleneck, [3, 8, 36, 3], num_classes=5)
    if arch.startswith("efficientnet-b"):
        # the reference's compound-scaled EfficientNet factory
        # (/root/reference/models/efficientnet.py:188-228, wired at
        # chexpert.py:496-500)
        from models.efficientnet import construct_model

        return construct_model(arch, n_classes=5)
    raise RuntimeError(arch)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--warmup", type=int, default=1)
    p.add_argument("--image-size", type=int, default=320)
    p.add_argument("--arch", default="densenet121",
                   help="reference-table arch; non-densenet121 results land "
                        "under an 'archs' map in the JSON")
    args = p.parse_args()

    torch.manual_seed(0)
    model = _build(args.arch)
    model.train()
    if args.arch.startswith("efficientnet"):
        # the reference's efficientnet optimizer (chexpert.py:496-500)
        opt = torch.optim.RMSprop(model.parameters(), lr=1e-4,
                                  momentum=0.9, eps=1e-3)
    else:
        opt = torch.optim.Adam(model.parameters(), lr=1e-4)
    loss_fn = torch.nn.BCEWithLogitsLoss(reduction="none")

    x = torch.randn(args.batch, 3, args.image_size, args.image_size)
    y = (torch.rand(args.batch, 5) > 0.5).float()

    def step():
        out = model(x)
        loss = loss_fn(out, y).sum(1).mean(0)  # reference chexpert.py:160
        opt.zero_grad()
        loss.backward()
        opt.step()
        return float(loss)

    for _ in range(args.warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(args.steps):
        step()
    dt = time.perf_counter() - t0

    img_s = args.batch * args.steps / dt
    out = os.path.join(REPO, "BASELINE_TORCH_CPU.json")
    record = json.load(open(out)) if os.path.exists(out) else {}
    entry = {
        "img_s": round(img_s, 3),
        "batch": args.batch,
        "image_size": args.image_size,
        "steps": args.steps,
        "torch": torch.__version__,
        "threads": torch.get_num_threads(),
    }
    if args.arch == "densenet121":
        record.update(entry)
        record["note"] = (
            "reference-equivalent densenet121 train step on this host CPU "
            "(chexpert.py:152-164); measured floor for bench.py vs_baseline; "
            "'archs' holds the other reference-table rows"
        )
    else:
        record.setdefault("archs", {})[args.arch] = entry
    with open(out, "w") as f:
        json.dump(record, f, indent=2)
    print(json.dumps({args.arch: entry}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
