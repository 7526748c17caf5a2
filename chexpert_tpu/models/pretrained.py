"""torchvision pretrained-weight import (OIHW torch state dict -> Flax NHWC).

The reference gets ImageNet initialization from torchvision's model zoo
(/root/reference/chexpert.py:462,482 `pretrained=args.pretrained`). This
environment has no torchvision and no network egress, so the converter works
from a torch state-dict FILE (downloaded out-of-band):

    CHEXPERT_TPU_PRETRAINED_DIR=/path/with/{densenet121,resnet152}.pth

Mapping rules:
  * conv weights:   torch OIHW -> flax HWIO transpose (2, 3, 1, 0)
  * BN:             weight->scale, bias->bias, running_mean/var->batch_stats
  * linear:         torch (out, in) -> flax (in, out) transpose; the
                    classifier head is SKIPPED (the reference replaces it
                    with a fresh 5-way layer, chexpert.py:463-466)
  * names:          torchvision dotted paths -> our module tree (identical
                    component names by construction; densenet's versioned
                    'norm.1'/'conv.1' legacy keys normalized)
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Tuple

import jax
import numpy as np

PRETRAINED_DIR_ENV = "CHEXPERT_TPU_PRETRAINED_DIR"

_SKIP_HEADS = ("classifier.", "fc.")


def _load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    return {k: v.numpy() for k, v in sd.items()}


def _normalize_densenet_keys(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Old torchvision densenet zoo files use 'norm.1'/'conv.2' style keys."""
    pattern = re.compile(r"^(.*denselayer\d+\.(?:norm|relu|conv))\.((?:[12]))\.(.*)$")
    out = {}
    for k, v in sd.items():
        m = pattern.match(k)
        out[(m.group(1) + m.group(2) + "." + m.group(3)) if m else k] = v
    return out


def convert_torch_state_dict(
    sd: Dict[str, np.ndarray], params: Any, batch_stats: Any, arch: str,
    include_head: bool = False,
) -> Tuple[Any, Any]:
    """Map a torchvision state dict onto our (params, batch_stats) trees.

    include_head=False (ImageNet import): the classifier/fc head is skipped —
    the reference replaces it with a fresh n-class layer (chexpert.py:463-466).
    include_head=True (reference-checkpoint interop): the head transfers too
    (reference checkpoints already carry the 5-class head).

    Raises KeyError listing any of our parameters left unmatched (heads
    excepted when skipped) so silent partial loads cannot happen.
    """
    import flax.traverse_util as tu

    if arch.startswith("densenet"):
        sd = _normalize_densenet_keys(sd)
        # torchvision prefixes everything under features.; ours has no prefix
        sd = {k[len("features.") :] if k.startswith("features.") else k: v
              for k, v in sd.items()}

    flat_params = dict(tu.flatten_dict(jax.tree_util.tree_map(np.asarray, params)))
    flat_stats = dict(tu.flatten_dict(jax.tree_util.tree_map(np.asarray, batch_stats)))

    def to_ours(torch_key: str):
        """torch 'a.b.weight' -> candidate (path tuple, kind)."""
        parts = torch_key.split(".")
        leaf = parts[-1]
        path = tuple(parts[:-1])
        # torchvision resnet downsample.0/.1 -> our downsample_conv/_bn
        if len(path) >= 2 and path[-2] == "downsample":
            which = "downsample_conv" if path[-1] == "0" else "downsample_bn"
            path = path[:-2] + (which,)
        return path, leaf

    used = set()
    n_loaded = 0
    for tkey, val in sd.items():
        if tkey.endswith("num_batches_tracked"):
            continue
        if not include_head and any(
            tkey.startswith(h) or f".{h}" in tkey for h in ("classifier.", "fc.")
        ):
            continue
        path, leaf = to_ours(tkey)
        if leaf == "weight":
            if val.ndim == 4:  # conv OIHW -> HWIO
                target = path + ("kernel",)
                if target not in flat_params:
                    raise KeyError(f"no match for torch conv {tkey} -> {target}")
                w = val.transpose(2, 3, 1, 0)
                assert flat_params[target].shape == w.shape, (tkey, flat_params[target].shape, w.shape)
                flat_params[target] = w.astype(flat_params[target].dtype)
            elif val.ndim == 1:  # BN scale
                target = path + ("scale",)
                if target not in flat_params:
                    raise KeyError(f"no match for torch bn scale {tkey} -> {target}")
                assert flat_params[target].shape == val.shape
                flat_params[target] = val.astype(flat_params[target].dtype)
            elif val.ndim == 2:  # linear (out,in) -> (in,out)
                target = path + ("kernel",)
                if target not in flat_params:
                    raise KeyError(f"no match for torch linear {tkey} -> {target}")
                w = val.T
                assert flat_params[target].shape == w.shape
                flat_params[target] = w.astype(flat_params[target].dtype)
            else:
                raise KeyError(f"unhandled weight ndim for {tkey}: {val.ndim}")
            used.add(target)
            n_loaded += 1
        elif leaf == "bias":
            target = path + ("bias",)
            if target not in flat_params:
                raise KeyError(f"no match for torch bias {tkey} -> {target}")
            assert flat_params[target].shape == val.shape
            flat_params[target] = val.astype(flat_params[target].dtype)
            used.add(target)
            n_loaded += 1
        elif leaf == "running_mean":
            target = path + ("mean",)
            if target not in flat_stats:
                raise KeyError(f"no match for torch running_mean {tkey} -> {target}")
            flat_stats[target] = val.astype(flat_stats[target].dtype)
            n_loaded += 1
        elif leaf == "running_var":
            target = path + ("var",)
            if target not in flat_stats:
                raise KeyError(f"no match for torch running_var {tkey} -> {target}")
            flat_stats[target] = val.astype(flat_stats[target].dtype)
            n_loaded += 1
        elif leaf in ("key_rel_h", "key_rel_w"):
            # AAConv2d relative-position embeddings (attn_aug_conv.py:40-41);
            # same (dkh, 2L-1) layout in both frameworks
            target = path + (leaf,)
            if target not in flat_params:
                raise KeyError(f"no match for torch rel embedding {tkey} -> {target}")
            assert flat_params[target].shape == val.shape
            flat_params[target] = val.astype(flat_params[target].dtype)
            used.add(target)
            n_loaded += 1
        else:
            raise KeyError(f"unhandled torch key {tkey}")

    # every param of ours must have been covered (heads excepted when skipped)
    missing = [
        p for p in flat_params
        if p not in used and (include_head or p[0] not in ("classifier", "fc"))
    ]
    if missing:
        raise KeyError(f"{len(missing)} of our params unmatched, e.g. {missing[:5]}")

    new_params = tu.unflatten_dict(flat_params)
    new_stats = tu.unflatten_dict(flat_stats)
    return new_params, new_stats


def export_torch_state_dict(
    params: Any, batch_stats: Any, arch: str, path: str,
) -> int:
    """Inverse of convert_torch_state_dict: our (params, batch_stats) trees
    -> a torchvision-format .pth state dict, torch.save'd at `path`.

    Exact mapping inverse (conv HWIO->OIHW, linear (in,out)->(out,in), BN
    scale->weight + running stats, resnet downsample_conv/_bn ->
    downsample.0/.1, densenet body under 'features.'); no
    num_batches_tracked buffers (the legacy-zoo format the importer
    normalizes, tests/test_pretrained_real_format.py). The head IS included
    — the importer skips it by default, matching the reference's
    fresh-n-class replacement (chexpert.py:463-466). Returns the number of
    exported tensors. Round-trip pinned by
    tests/test_pretrained_real_format.py::test_export_import_round_trip."""
    import flax.traverse_util as tu
    import torch

    flat_params = dict(tu.flatten_dict(jax.tree_util.tree_map(np.asarray, params)))
    flat_stats = dict(tu.flatten_dict(jax.tree_util.tree_map(np.asarray, batch_stats)))

    def torch_key(path_tuple, leaf: str) -> str:
        parts = list(path_tuple)
        if parts and parts[-1] == "downsample_conv":
            parts = parts[:-1] + ["downsample", "0"]
        elif parts and parts[-1] == "downsample_bn":
            parts = parts[:-1] + ["downsample", "1"]
        if arch.startswith("densenet") and parts[0] not in ("classifier", "fc"):
            parts = ["features"] + parts
        return ".".join(parts + [leaf])

    sd = {}
    for p, val in flat_params.items():
        path_tuple, leaf = p[:-1], p[-1]
        if leaf == "kernel":
            if val.ndim == 4:  # HWIO -> OIHW
                sd[torch_key(path_tuple, "weight")] = val.transpose(3, 2, 0, 1)
            elif val.ndim == 2:  # (in, out) -> (out, in)
                sd[torch_key(path_tuple, "weight")] = val.T
            else:
                raise KeyError(f"unhandled kernel ndim at {p}: {val.ndim}")
        elif leaf == "scale":
            sd[torch_key(path_tuple, "weight")] = val
        elif leaf == "bias":
            sd[torch_key(path_tuple, "bias")] = val
        elif leaf in ("key_rel_h", "key_rel_w"):
            sd[torch_key(path_tuple, leaf)] = val
        else:
            raise KeyError(f"unhandled param leaf at {p}")
    for p, val in flat_stats.items():
        path_tuple, leaf = p[:-1], p[-1]
        if leaf == "mean":
            sd[torch_key(path_tuple, "running_mean")] = val
        elif leaf == "var":
            sd[torch_key(path_tuple, "running_var")] = val
        else:
            raise KeyError(f"unhandled batch-stats leaf at {p}")

    torch.save({k: torch.tensor(np.ascontiguousarray(v.astype(np.float32)))
                for k, v in sd.items()}, path)
    return len(sd)


def load_pretrained(arch: str, params: Any, batch_stats: Any) -> Tuple[Any, Any]:
    """Load ImageNet weights for arch from $CHEXPERT_TPU_PRETRAINED_DIR."""
    d = os.environ.get(PRETRAINED_DIR_ENV, "")
    path = os.path.join(d, f"{arch}.pth")
    if not d or not os.path.exists(path):
        raise FileNotFoundError(
            f"--pretrained requires a torchvision state dict at "
            f"${PRETRAINED_DIR_ENV}/{arch}.pth (no network egress in this "
            "environment); proceeding without it is the --no-pretrained path"
        )
    sd = _load_torch_state_dict(path)
    return convert_torch_state_dict(sd, params, batch_stats, arch)
