"""Native libjpeg decode path: build, bit-parity with PIL, DCT scaling,
fallback behavior."""

import os
import time

import numpy as np
import pytest
from PIL import Image

from chexpert_tpu import native


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory):
    d = tmp_path_factory.mktemp("jpegs")
    rng = np.random.RandomState(0)
    small = rng.randint(0, 255, (390, 320), dtype=np.uint8)
    big = rng.randint(0, 255, (1400, 1200), dtype=np.uint8)
    ps = str(d / "small.jpg")
    pb = str(d / "big.jpg")
    Image.fromarray(small, "L").save(ps, quality=90)
    Image.fromarray(big, "L").save(pb, quality=90)
    return ps, pb


def test_native_builds_and_matches_pil(jpegs):
    if not native.available():
        pytest.skip("native toolchain/libjpeg unavailable")
    ps, _ = jpegs
    arr = native.decode_gray(ps)
    ref = np.asarray(Image.open(ps).convert("L"))
    # both are libjpeg underneath: bit-exact for unscaled decode
    np.testing.assert_array_equal(arr, ref)


def test_native_dct_scaling(jpegs):
    if not native.available():
        pytest.skip("native toolchain/libjpeg unavailable")
    _, pb = jpegs
    full = native.decode_gray(pb)
    assert full.shape == (1400, 1200)
    half = native.decode_gray(pb, min_edge_hint=600)  # 1200/2 = 600 >= 600
    assert half.shape == (700, 600)
    # never scales below the hint
    at_least = native.decode_gray(pb, min_edge_hint=601)
    assert min(at_least.shape) >= 601


def test_load_grayscale_uses_native_and_env_fallback(jpegs, monkeypatch):
    from chexpert_tpu.data.transforms import load_grayscale

    ps, _ = jpegs
    a = np.asarray(load_grayscale(ps))
    monkeypatch.setenv("CHEXPERT_TPU_NO_NATIVE", "1")
    b = np.asarray(load_grayscale(ps))
    np.testing.assert_array_equal(a, b)


def test_decode_transform_parity_native_vs_pil(jpegs, monkeypatch):
    from chexpert_tpu.data.transforms import decode_transform

    ps, pb = jpegs
    for path in (ps, pb):
        nat = decode_transform(path, image_size=320)
        monkeypatch.setenv("CHEXPERT_TPU_NO_NATIVE", "1")
        pil = decode_transform(path, image_size=320)
        monkeypatch.delenv("CHEXPERT_TPU_NO_NATIVE")
        np.testing.assert_array_equal(nat, pil)
