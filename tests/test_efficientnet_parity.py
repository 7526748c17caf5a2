"""EfficientNet forward parity vs the reference torch implementation
(/root/reference/models/efficientnet.py), weights transferred with a
test-local name mapping (torch Sequential indices -> our named modules)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

REFERENCE = "/root/reference"
sys.dont_write_bytecode = True
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

ref_eff = pytest.importorskip("models.efficientnet")

from chexpert_tpu.models import EfficientNet, scaled_blocks  # noqa: E402
from chexpert_tpu.train import init_model  # noqa: E402


def torch_to_flax_effnet(sd, blocks_cfg):
    """Map reference torch keys to our param/batch_stats flat dicts.

    Reference module order inside MBConvBlock (efficientnet.py:84-103):
    [expand conv, BN, swish]? + [dw conv, BN, swish, SE, proj conv, BN, drop?]
    SE = Sequential(pool, reduce conv, swish, expand conv, sigmoid).
    """
    params, stats = {}, {}

    def put_conv(tkey, name):
        params[name + "/kernel"] = sd[tkey].transpose(2, 3, 1, 0)

    def put_bn(tprefix, name):
        params[name + "/scale"] = sd[tprefix + ".weight"]
        params[name + "/bias"] = sd[tprefix + ".bias"]
        stats[name + "/mean"] = sd[tprefix + ".running_mean"]
        stats[name + "/var"] = sd[tprefix + ".running_var"]

    def put_biased_conv(tprefix, name):
        params[name + "/kernel"] = sd[tprefix + ".weight"].transpose(2, 3, 1, 0)
        params[name + "/bias"] = sd[tprefix + ".bias"].reshape(-1)

    put_conv("stem.0.weight", "stem_conv")
    put_bn("stem.1", "stem_bn")
    for si, (n, cin, cout, k, s, e, se) in enumerate(blocks_cfg):
        for i in range(n):
            t = f"blocks.{si}.{i}"
            f = f"blocks_{si}_{i}"
            off = 0
            if e != 1:
                put_conv(f"{t}.0.weight", f"{f}/expand_conv")
                put_bn(f"{t}.1", f"{f}/expand_bn")
                off = 3
            put_conv(f"{t}.{off}.weight", f"{f}/depthwise_conv")
            put_bn(f"{t}.{off + 1}", f"{f}/depthwise_bn")
            put_biased_conv(f"{t}.{off + 3}.1", f"{f}/se/reduce")
            put_biased_conv(f"{t}.{off + 3}.3", f"{f}/se/expand")
            put_conv(f"{t}.{off + 4}.weight", f"{f}/project_conv")
            put_bn(f"{t}.{off + 5}", f"{f}/project_bn")
    put_conv("head.0.weight", "head_conv")
    put_bn("head.1", "head_bn")
    params["classifier/kernel"] = sd["head.6.weight"].T
    params["classifier/bias"] = sd["head.6.bias"]
    return params, stats


@pytest.mark.parametrize(
    "name",
    # b1/b4/b7 guard the compound-scaling math (width/depth rounding,
    # reference construct_model's in-place rescale, efficientnet.py:188-228)
    ["efficientnet-b0", "efficientnet-b1", "efficientnet-b4", "efficientnet-b7"],
)
def test_efficientnet_forward_parity(name):
    tm = ref_eff.construct_model(name, n_classes=5)
    tm.eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}

    fm = EfficientNet(name, num_classes=5, dtype=jnp.float32)
    params, batch_stats = init_model(fm, jax.random.PRNGKey(0), (1, 64, 64, 3))

    import flax.traverse_util as tu

    flat_p = {"/".join(k): v for k, v in tu.flatten_dict(
        jax.tree_util.tree_map(np.asarray, params)).items()}
    flat_s = {"/".join(k): v for k, v in tu.flatten_dict(
        jax.tree_util.tree_map(np.asarray, batch_stats)).items()}

    _, blocks_cfg, _ = scaled_blocks(name)
    mp, ms = torch_to_flax_effnet(sd, blocks_cfg)

    assert set(mp) == set(flat_p), (
        sorted(set(mp) ^ set(flat_p))[:6]
    )
    assert set(ms) == set(flat_s)
    for k_, v in mp.items():
        assert flat_p[k_].shape == v.shape, (k_, flat_p[k_].shape, v.shape)
        flat_p[k_] = v.astype(np.float32)
    for k_, v in ms.items():
        flat_s[k_] = v.astype(np.float32)

    new_params = tu.unflatten_dict({tuple(k.split("/")): v for k, v in flat_p.items()})
    new_stats = tu.unflatten_dict({tuple(k.split("/")): v for k, v in flat_s.items()})

    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(torch.tensor(x)).numpy()
    out = fm.apply(
        {"params": new_params, "batch_stats": new_stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False,
    )
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=3e-4)
