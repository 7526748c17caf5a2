"""Packed uint8 cache pipeline: build, equivalence with the JPEG pipeline,
augment jitter, on-device normalization."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chexpert_tpu.data import ChexpertIndex, PIXEL_MEAN, PIXEL_STD, make_synthetic_dataset
from chexpert_tpu.data.packed import PackedBatches, build_packed_cache
from chexpert_tpu.data.pipeline import Batches
from chexpert_tpu.train.steps import prepare_image


@pytest.fixture(scope="module")
def packed(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("packed_data"))
    make_synthetic_dataset(root, n_train=20, n_valid=10, image_size=48)
    index = ChexpertIndex(root, "valid", download=False)
    cache_dir = os.path.join(root, "cache")
    path = build_packed_cache(index, cache_dir, image_size=48, workers=2)
    return index, path


def test_cache_build_and_reuse(packed):
    index, path = packed
    assert os.path.exists(path)
    mm = np.load(path, mmap_mode="r")
    assert mm.shape == (10, 48, 48) and mm.dtype == np.uint8
    # rebuilding reuses the existing cache (same path, no error)
    again = build_packed_cache(index, os.path.dirname(path), image_size=48)
    assert again == path


def test_packed_matches_jpeg_pipeline(packed):
    index, path = packed
    jpeg = next(iter(Batches(index, 10, image_size=48, workers=2)))
    pk = next(iter(PackedBatches(index, path, 10, image_size=48)))
    assert pk["image"].dtype == np.uint8 and pk["image"].shape == (10, 48, 48, 1)
    # after on-device prep, packed == jpeg pipeline (same decode + normalize)
    prepped = np.asarray(prepare_image(jnp.asarray(pk["image"])))
    np.testing.assert_allclose(prepped, jpeg["image"], atol=1e-5)
    np.testing.assert_array_equal(pk["label"], jpeg["label"])
    np.testing.assert_array_equal(pk["index"], jpeg["index"])


def test_packed_padding_and_masks(packed):
    index, path = packed
    got = list(PackedBatches(index, path, 4, image_size=48))
    assert len(got) == 3
    assert got[-1]["mask"].tolist() == [1, 1, 0, 0]


def test_packed_augment_jitter(tmp_path):
    root = str(tmp_path)
    make_synthetic_dataset(root, n_train=8, n_valid=4, image_size=64)
    index = ChexpertIndex(root, "train", download=False)
    path = build_packed_cache(index, os.path.join(root, "c"), image_size=48,
                              pack_margin=16, workers=2)
    mm = np.load(path, mmap_mode="r")
    assert mm.shape[1] == 64  # stored with margin
    a = next(iter(PackedBatches(index, path, 8, image_size=48, augment=True, seed=1, epoch=0)))
    b = next(iter(PackedBatches(index, path, 8, image_size=48, augment=True, seed=1, epoch=1)))
    assert a["image"].shape == (8, 48, 48, 1)
    assert not np.array_equal(a["image"], b["image"])  # different crops per epoch


def test_packed_resume_after_kill(tmp_path, monkeypatch):
    """A killed pack resumes from the last flushed chunk, not from zero."""
    import chexpert_tpu.data.packed as packed_mod

    root = str(tmp_path)
    make_synthetic_dataset(root, n_train=4, n_valid=12, image_size=40)
    index = ChexpertIndex(root, "valid", download=False)
    cache = os.path.join(root, "c")
    real = packed_mod.load_grayscale

    calls = {"n": 0}

    def dies_mid_pack(path, **kw):
        calls["n"] += 1
        if calls["n"] > 6:  # dies in the 2nd chunk of 4
            raise RuntimeError("simulated kill")
        return real(path, **kw)

    monkeypatch.setattr(packed_mod, "load_grayscale", dies_mid_pack)
    with pytest.raises(RuntimeError, match="simulated kill"):
        build_packed_cache(index, cache, image_size=40, workers=1, chunk_rows=4)
    import glob
    assert not glob.glob(os.path.join(cache, "*.u8"))  # only .tmp + .progress

    resumed = {"n": 0}

    def counting(path, **kw):
        resumed["n"] += 1
        return real(path, **kw)

    monkeypatch.setattr(packed_mod, "load_grayscale", counting)
    path = build_packed_cache(index, cache, image_size=40, workers=1, chunk_rows=4)
    assert resumed["n"] == 8  # rows 0-3 kept from the first attempt
    monkeypatch.setattr(packed_mod, "load_grayscale", real)
    fresh = build_packed_cache(index, os.path.join(root, "c2"), image_size=40,
                               workers=2, chunk_rows=4)
    np.testing.assert_array_equal(np.load(path, mmap_mode="r"),
                                  np.load(fresh, mmap_mode="r"))


def test_packed_cache_keyed_by_row_subset(tmp_path):
    """Two different row subsets of the same length get distinct caches
    (stale-cache hazard: same (mode, n, size) but different rows)."""
    root = str(tmp_path)
    make_synthetic_dataset(root, n_train=12, n_valid=4, image_size=32)
    cache = os.path.join(root, "c")
    head = ChexpertIndex(root, "train", download=False, mini_data=6)
    mid = ChexpertIndex(root, "train", download=False)
    mid.data = mid.data.iloc[3:9]  # same length, different rows
    p_head = build_packed_cache(head, cache, image_size=32, pack_margin=0)
    p_mid = build_packed_cache(mid, cache, image_size=32, pack_margin=0)
    assert p_head != p_mid
    # each cache row matches its own index's decode
    b_head = next(iter(PackedBatches(head, p_head, 6, image_size=32)))
    b_mid = next(iter(PackedBatches(mid, p_mid, 6, image_size=32)))
    np.testing.assert_array_equal(b_head["index"], head.all_indices())
    np.testing.assert_array_equal(b_mid["index"], mid.all_indices())
    assert not np.array_equal(b_head["image"], b_mid["image"])


def test_prepare_image_dtypes():
    u8 = jnp.asarray(np.full((2, 4, 4, 1), 255, np.uint8))
    out = np.asarray(prepare_image(u8))
    assert out.shape == (2, 4, 4, 3)
    np.testing.assert_allclose(out, (1.0 - PIXEL_MEAN) / PIXEL_STD, atol=1e-6)
    f32 = jnp.ones((2, 4, 4, 3), jnp.float32)
    np.testing.assert_array_equal(np.asarray(prepare_image(f32)), np.ones((2, 4, 4, 3)))


def test_device_augment():
    """On-device random crop + flip (train/steps.py::device_augment)."""
    import jax
    from chexpert_tpu.train.steps import device_augment

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randint(0, 255, (4, 40, 40, 1)), jnp.uint8)
    out = device_augment(img, jax.random.PRNGKey(0), 32)
    assert out.shape == (4, 32, 32, 1) and out.dtype == jnp.uint8
    # every output crop's pixel multiset is a sub-multiset of the source
    a = np.asarray(out)
    src = np.asarray(img)
    for i in range(4):
        assert set(np.unique(a[i])).issubset(set(np.unique(src[i])))
    # deterministic per rng key; different keys differ
    out2 = device_augment(img, jax.random.PRNGKey(0), 32)
    out3 = device_augment(img, jax.random.PRNGKey(1), 32)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    assert not np.array_equal(np.asarray(out), np.asarray(out3))


def test_emit_stored_batches(tmp_path):
    root = str(tmp_path)
    make_synthetic_dataset(root, n_train=8, n_valid=4, image_size=64)
    index = ChexpertIndex(root, "train", download=False)
    path = build_packed_cache(index, os.path.join(root, "c"), image_size=48,
                              pack_margin=16, workers=2)
    b = next(iter(PackedBatches(index, path, 8, image_size=48, emit_stored=True)))
    assert b["image"].shape == (8, 64, 64, 1)  # full stored tile


def test_device_aug_training_e2e(tmp_path):
    """Train with on-device augmentation through the CLI (packed + data_aug)."""
    root = str(tmp_path)
    make_synthetic_dataset(root, n_train=16, n_valid=8, image_size=48)
    from chexpert_tpu.cli.chexpert import main

    assert main([
        "--train", "--data_path", root, "--output_dir", os.path.join(root, "run"),
        "--model", "densenet-tiny", "--image_size", "32", "--batch_size", "8",
        "--compute_dtype", "float32", "--data_parallel", "2", "--data_workers", "2",
        "--n_epochs", "1", "--lr", "1e-2", "--log_interval", "1",
        "--eval_interval", "100", "--packed_cache", "--data_aug",
        "--device_aug",
    ]) == 0


def test_concurrent_pack_exactly_one_packs(tmp_path):
    """Two processes request the same unbuilt cache concurrently: the .lock
    serializes packing so exactly one decodes (the other polls, then reuses
    the finished cache) — the multihost shared-filesystem race (VERDICT r2
    task 3; cli/chexpert.py builds the cache in every process)."""
    import subprocess
    import sys

    root = str(tmp_path / "data")
    make_synthetic_dataset(root, n_train=8, n_valid=24, image_size=32)
    cache_dir = str(tmp_path / "cache")

    worker = f"""
import json, sys
import chexpert_tpu.data.packed as packed
from chexpert_tpu.data import ChexpertIndex

calls = [0]
_orig = packed.load_grayscale
def counting(*a, **kw):
    calls[0] += 1
    return _orig(*a, **kw)
packed.load_grayscale = counting

index = ChexpertIndex({root!r}, "valid", download=False)
path = packed.build_packed_cache(index, {cache_dir!r}, image_size=32,
                                 workers=2, poll_sec=0.05)
json.dump({{"path": path, "decodes": calls[0]}}, open(sys.argv[1], "w"))
"""
    outs = [str(tmp_path / f"w{i}.json") for i in range(2)]
    procs = [
        subprocess.Popen([sys.executable, "-c", worker, o],
                         env=dict(os.environ, JAX_PLATFORMS="cpu"))
        for o in outs
    ]
    for p in procs:
        assert p.wait(timeout=300) == 0
    import json as _json

    results = [_json.load(open(o)) for o in outs]
    assert results[0]["path"] == results[1]["path"]
    decodes = sorted(r["decodes"] for r in results)
    assert decodes == [0, 24], decodes  # exactly one process packed
    mm = np.load(results[0]["path"], mmap_mode="r")
    assert mm.shape == (24, 32, 32) and mm.dtype == np.uint8
    assert not os.path.exists(results[0]["path"] + ".lock")


def test_stale_lock_is_broken(tmp_path):
    """A lock whose holder died (no heartbeat) must not deadlock packing."""
    root = str(tmp_path / "data")
    make_synthetic_dataset(root, n_train=8, n_valid=6, image_size=32)
    index = ChexpertIndex(root, "valid", download=False)
    cache_dir = str(tmp_path / "cache")
    os.makedirs(cache_dir)
    # plant an orphaned lock with an old mtime at the path packing will use
    from chexpert_tpu.data.packed import _index_key, pack_cache_path

    path = pack_cache_path(cache_dir, "valid", 32, None,
                           _index_key(index.all_indices()))
    with open(path + ".lock", "w") as f:
        f.write("99999\n")
    old = os.path.getmtime(path + ".lock") - 3600
    os.utime(path + ".lock", (old, old))
    built = build_packed_cache(index, cache_dir, image_size=32, workers=2,
                               poll_sec=0.05, stale_sec=5.0)
    assert built == path and os.path.exists(path)
    assert not os.path.exists(path + ".lock")


def test_vectorized_crop_matches_reference_loop(tmp_path):
    """The sliding-window gather crop (VERDICT r2 task 4: replaces the
    per-image Python loop that cost ~25% of --data_aug throughput) must
    produce byte-identical crops/flips for the same seed."""
    root = str(tmp_path / "d")
    make_synthetic_dataset(root, n_train=24, n_valid=4, image_size=48)
    index = ChexpertIndex(root, "train", download=False)
    cache = build_packed_cache(index, str(tmp_path / "c"), image_size=32,
                               workers=2, pack_margin=8)
    b = PackedBatches(index, cache, 8, image_size=32, shuffle=True,
                      augment=True, seed=3, epoch=1)
    batches = list(b)

    # reference: same seed-derived draws, per-image loop semantics
    mm = np.load(cache, mmap_mode="r")
    stored, s, bs = mm.shape[1], 32, 8
    order = np.arange(len(index))
    rng = np.random.RandomState(3 + 1_000_003 * 1)
    rng.shuffle(order)
    for bi, batch in enumerate(batches):
        chunk = order[bi * bs : (bi + 1) * bs]
        raw = mm[np.sort(chunk)][np.argsort(np.argsort(chunk))]
        brng = np.random.RandomState((3 + 1_000_003 * 1 + 7_919 * bi) % (2**31))
        n = len(chunk)
        tops = brng.randint(0, stored - s + 1, bs)[:n]
        lefts = brng.randint(0, stored - s + 1, bs)[:n]
        flips = (brng.rand(bs) < 0.5)[:n]
        for i in range(n):
            c = raw[i, tops[i]:tops[i] + s, lefts[i]:lefts[i] + s]
            expect = c[:, ::-1] if flips[i] else c
            np.testing.assert_array_equal(batch["image"][i, :, :, 0], expect)
