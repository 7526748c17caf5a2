"""CheXpert-small dataset index + label preprocessing.

Behavioral parity with /root/reference/dataset.py:17-160:
  * modes: train / valid / test / vis
  * labels: 5 competition pathologies; NaN (unmentioned) -> 0; uncertain -1
    mapped by policy — 'ones' (U-Ones, the reference default,
    dataset.py:141-142) or 'zeros' (U-Zeros; the reference left this as a
    TODO at dataset.py:119)
  * optional row filter dict (e.g. {'Frontal/Lateral': 'Frontal'}) persisted
    as processed_training_data_filters.json (dataset.py:144-151)
  * processed dataframes cached (as parquet-free CSV, not torch .pt)
  * test mode: root is a path to a csv; labels zero-filled (dataset.py:35-38)
  * vis mode: 3 examples per category — each single condition, no findings,
    exactly 2, >2 (dataset.py:50-68)
  * mini_data head-N truncation (dataset.py:46-48)
  * patient-id extraction from the Path column (dataset.py:156-160)
  * auto-download/extract from the Stanford URL (dataset.py:94-113)

The index is pure pandas/host metadata; pixel IO lives in
chexpert_tpu.data.pipeline.
"""

from __future__ import annotations

import json
import os
import zipfile
from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd

URL = "http://download.cs.stanford.edu/deep/CheXpert-v1.0-small.zip"
DIR_NAME = os.path.splitext(os.path.basename(URL))[0]  # CheXpert-v1.0-small

ATTR_ALL_NAMES = [
    "No Finding", "Enlarged Cardiomediastinum", "Cardiomegaly", "Lung Opacity",
    "Lung Lesion", "Edema", "Consolidation", "Pneumonia", "Atelectasis",
    "Pneumothorax", "Pleural Effusion", "Pleural Other", "Fracture",
    "Support Devices",
]
# competition labels (reference dataset.py:25)
ATTR_NAMES = ["Atelectasis", "Cardiomegaly", "Consolidation", "Edema", "Pleural Effusion"]

# dataset pixel statistics (reference dataset.py:204, chexpert.py:71)
PIXEL_MEAN = 0.5330
PIXEL_STD = 0.0349

MODES = ("train", "valid", "test", "vis")


def _maybe_download_and_extract(root: str) -> None:
    """Download + unzip the dataset if absent (reference dataset.py:94-113)."""
    target = os.path.join(root, DIR_NAME)
    if os.path.exists(target):
        return
    fpath = os.path.join(root, os.path.basename(URL))
    if not os.path.exists(fpath):
        from urllib import request

        print(f"Downloading {URL} to {fpath}")

        def _progress(n_blocks, block_size, total_bytes):
            done = min(n_blocks * block_size, total_bytes)
            pct = 100.0 * done / max(total_bytes, 1)
            print(f"\rdownload: {pct:5.1f}% of {total_bytes} bytes", end="", flush=True)

        request.urlretrieve(URL, fpath, _progress)
        print()
    print(f"Extracting {fpath}")
    with zipfile.ZipFile(fpath, "r") as z:
        z.extractall(root)
    macosx = os.path.join(target, "__MACOSX")
    if os.path.exists(macosx):
        os.rmdir(macosx)
    os.unlink(fpath)
    print("Dataset extracted.")


def _preprocess_train_df(
    train_df: pd.DataFrame,
    data_filter: Optional[Dict[str, str]],
    uncertain_policy: str,
    csv_dir: str,
) -> pd.DataFrame:
    """NaN->0, -1 -> policy, optional row filter (reference dataset.py:134-153)."""
    train_df[ATTR_NAMES] = train_df[ATTR_NAMES].fillna(0)
    if uncertain_policy == "ones":
        train_df[ATTR_NAMES] = train_df[ATTR_NAMES].replace(-1, 1)
    elif uncertain_policy == "zeros":
        train_df[ATTR_NAMES] = train_df[ATTR_NAMES].replace(-1, 0)
    elif uncertain_policy == "ignore":
        pass  # keep -1; the pipeline emits a per-element label mask and the
        # loss excludes uncertain labels (U-Ignore; reference TODO :119)
    else:
        raise ValueError(f"unknown uncertain_policy: {uncertain_policy}")
    if data_filter is not None:
        for k, v in data_filter.items():
            train_df = train_df[train_df[k] == v]
        with open(os.path.join(csv_dir, "processed_training_data_filters.json"), "w") as f:
            json.dump(data_filter, f)
    return train_df


class ChexpertIndex:
    """Map-style index over CheXpert-small; a row is (image path, labels, idx).

    root semantics follow the reference: for train/valid/vis root is the data
    directory containing CheXpert-v1.0-small/; for test root is a csv path
    whose 'Path' column is joined to '.'.
    """

    def __init__(
        self,
        root: str,
        mode: str = "train",
        data_filter: Optional[Dict[str, str]] = None,
        mini_data: Optional[int] = None,
        uncertain_policy: str = "ones",
        download: bool = True,
    ):
        assert mode in MODES, mode
        self.root = os.path.expanduser(root)
        self.mode = mode

        if mode == "test":
            self.data = pd.read_csv(self.root, keep_default_na=True)
            self.root = "."  # base joined to csv Path column (dataset.py:37)
            self.data[ATTR_NAMES] = pd.DataFrame(
                np.zeros((len(self.data), len(ATTR_NAMES)))
            )
        else:
            if download:
                _maybe_download_and_extract(self.root)
            self.data = self._load_processed(data_filter, uncertain_policy, mode)
            if mini_data is not None:
                self.data = self.data[:mini_data]
            if mode == "vis":
                self._select_vis_subset()

        self.attr_idxs = [self.data.columns.tolist().index(a) for a in ATTR_NAMES]

    # --- processing + cache (reference dataset.py:115-132, .pt -> .csv) ---
    def _load_processed(self, data_filter, uncertain_policy, mode) -> pd.DataFrame:
        csv_dir = os.path.join(self.root, DIR_NAME)
        suffix = "" if uncertain_policy == "ones" else f".{uncertain_policy}"
        if data_filter:
            # cache keyed by filter so a filtered run never reuses an
            # unfiltered frame (the reference's .pt cache has this hazard)
            import hashlib

            h = hashlib.sha1(json.dumps(data_filter, sort_keys=True).encode()).hexdigest()[:8]
            suffix += f".f{h}"
        train_cache = os.path.join(csv_dir, f"train.processed{suffix}.csv")
        valid_cache = os.path.join(csv_dir, "valid.processed.csv")
        if not (os.path.exists(train_cache) and os.path.exists(valid_cache)):
            valid_df = pd.read_csv(os.path.join(csv_dir, "valid.csv"), keep_default_na=True)
            train_df = pd.read_csv(os.path.join(csv_dir, "train.csv"), keep_default_na=True)
            train_df = _preprocess_train_df(train_df, data_filter, uncertain_policy, csv_dir)
            train_df.to_csv(train_cache, index=False)
            valid_df.to_csv(valid_cache, index=False)
        path = valid_cache if mode in ("valid", "vis") else train_cache
        return pd.read_csv(path, keep_default_na=True)

    # --- vis subset (reference dataset.py:50-68) ---
    def _select_vis_subset(self) -> None:
        idxs: List[List[int]] = []
        d = self.data
        cond_sum = d[ATTR_NAMES].sum(1)
        for attr in ATTR_NAMES:  # single-condition categories
            idxs.append(d.loc[(d[attr] == 1) & (cond_sum == 1)].head(3).index.tolist())
        idxs.append(d.loc[cond_sum == 0].head(3).index.tolist())  # no findings
        idxs.append(d.loc[cond_sum == 2].head(3).index.tolist())  # 2 conditions
        idxs.append(d.loc[cond_sum > 2].head(3).index.tolist())  # >2 conditions
        self.vis_attrs = ATTR_NAMES + ["No findings", "2 conditions", "Multiple conditions"]
        self.vis_idxs = idxs
        flat = [i for sub in idxs for i in sub]
        self.data = self.data.loc[flat]

    def __len__(self) -> int:
        return len(self.data)

    def path(self, pos: int) -> str:
        """Filesystem path of the pos-th image."""
        return os.path.join(self.root, self.data.iloc[pos, 0])

    def labels(self, pos: int) -> np.ndarray:
        return self.data.iloc[pos, self.attr_idxs].values.astype(np.float32)

    def index(self, pos: int) -> int:
        """Original dataframe index (reference dataset.py:86-88)."""
        return int(self.data.index[pos])

    def all_labels(self) -> np.ndarray:
        return self.data[ATTR_NAMES].values.astype(np.float32)

    def all_indices(self) -> np.ndarray:
        return self.data.index.values.astype(np.int64)


def extract_patient_ids(index: ChexpertIndex, idxs: Sequence[int]) -> np.ndarray:
    """df index -> study ids like 'CheXpert-v1.0-small/valid/patient64541/study1'
    (reference dataset.py:156-160). Non-unique across views by design."""
    return (
        index.data["Path"].loc[list(idxs)].str.rsplit("/", expand=True, n=1)[0].values
    )


def compute_mean_and_std(image_iter) -> tuple:
    """Welford streaming mean/std over per-image means (reference
    dataset.py:163-174). image_iter yields float arrays in [0, 1]."""
    import math

    m, s, k = 0.0, 0.0, 1
    for img in image_iter:
        x = float(np.mean(img))
        new_m = m + (x - m) / k
        s += (x - m) * (x - new_m)
        m = new_m
        k += 1
    return m, math.sqrt(s / (k - 1))
