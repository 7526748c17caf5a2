"""Synthetic CheXpert-small fixture.

Generates a miniature dataset with the exact on-disk layout the real dataset
has (CheXpert-v1.0-small/{train,valid}.csv + patient/study/view JPEGs) so the
full train/eval/predict/visualize stack runs hermetically — the test-strategy
equivalent of the reference's informal --mini_data debugging
(/root/reference/chexpert.py:46, dataset.py:46-48), made reproducible.

Labels are planted with a learnable signal: each pathology k brightens a
distinct image region when positive, so models can overfit the fixture and
convergence tests have something to converge on.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

from chexpert_tpu.data.chexpert import ATTR_ALL_NAMES, ATTR_NAMES, DIR_NAME


def make_synthetic_dataset(
    root: str,
    n_train: int = 32,
    n_valid: int = 16,
    image_size: int = 64,
    seed: int = 0,
    views_per_study: int = 1,
    uncertain_frac: float = 0.0,
) -> str:
    """Write a synthetic dataset under root/CheXpert-v1.0-small. Returns root."""
    rng = np.random.RandomState(seed)
    base = os.path.join(root, DIR_NAME)
    os.makedirs(base, exist_ok=True)

    def gen_split(split: str, n: int, start_patient: int) -> None:
        rows = []
        for i in range(n):
            patient = start_patient + i // views_per_study
            study = 1
            view = i % views_per_study + 1
            labels = (rng.rand(len(ATTR_NAMES)) < 0.4).astype(np.float32)
            # plant signal: pathology k brightens horizontal band k
            img = rng.randint(0, 60, size=(image_size, image_size)).astype(np.float32)
            band = image_size // len(ATTR_NAMES)
            for k, on in enumerate(labels):
                if on:
                    img[k * band : (k + 1) * band] += 150
            img = np.clip(img, 0, 255).astype(np.uint8)

            rel = f"{DIR_NAME}/{split}/patient{patient:05d}/study{study}/view{view}_frontal.jpg"
            fpath = os.path.join(root, rel)
            os.makedirs(os.path.dirname(fpath), exist_ok=True)
            Image.fromarray(img, mode="L").save(fpath, quality=95)

            row = {"Path": rel, "Sex": "Male", "Age": 60,
                   "Frontal/Lateral": "Frontal", "AP/PA": "AP"}
            for a in ATTR_ALL_NAMES:
                row[a] = np.nan
            for k, a in enumerate(ATTR_NAMES):
                v = float(labels[k])
                if split == "train" and v == 1.0 and rng.rand() < uncertain_frac:
                    v = -1.0  # uncertain label to exercise U-Ones/U-Zeros
                row[a] = v
            rows.append(row)

        import pandas as pd

        df = pd.DataFrame(rows)
        if split == "valid":
            # valid.csv ships fully labeled (no NaN/-1 in competition labels)
            df[ATTR_NAMES] = df[ATTR_NAMES].fillna(0).replace(-1, 1)
        df.to_csv(os.path.join(base, f"{split}.csv"), index=False)

    gen_split("train", n_train, start_patient=1)
    gen_split("valid", n_valid, start_patient=10_000)
    return root
