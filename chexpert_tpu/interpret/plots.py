"""Matplotlib artifact rendering: vis grids, attention maps, ROC/PR plots.

Behavioral parity with /root/reference/chexpert.py:305-427: per-category
3x[table | original | CAM-overlay] grids saved under output_dir/vis, per-layer
per-pixel attention-map grids, and the 2xN ROC/PR figure under
output_dir/plots.
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from chexpert_tpu.data.chexpert import ATTR_NAMES


def visualize_one(img, mask, label, patient_id, prob, attr_names, axs):
    """[table of GT vs probs | original | CAM overlay] (chexpert.py:339-361)."""
    sort_idxs = prob.argsort()[::-1]
    label = label[sort_idxs]
    prob = prob[sort_idxs]
    names = [attr_names[i] for i in sort_idxs]
    axs[0].set_title(patient_id)
    data = np.stack([label, prob.round(3)]).T
    axs[0].table(
        cellText=data, rowLabels=names, colLabels=["Ground truth", "Pred. prob"],
        rowColours=plt.cm.Greens(0.5 * label),
        cellColours=plt.cm.Greens(0.5 * data), cellLoc="center", loc="center",
    )
    axs[0].axis("tight")
    axs[1].set_title("Original image", fontsize=10)
    axs[1].imshow(img.squeeze(), cmap="gray")
    axs[2].set_title(
        "Top class activation \n{}: {:.4f}".format(names[0], prob[0]), fontsize=10
    )
    axs[2].imshow(img.squeeze(), cmap="gray")
    axs[2].imshow(mask.squeeze(), cmap="jet", alpha=0.5)
    for ax in axs:
        ax.axis("off")


def save_vis_grids(
    imgs: np.ndarray,          # (N, H, W, C) denormalized
    masks: np.ndarray,         # (N, H, W, 1) grad-cam
    labels: np.ndarray,        # (N, 5)
    probs: np.ndarray,         # (N, 5) sigmoid
    idxs: List[int],           # original df indices, order == batch order
    patient_ids: Sequence[str],
    vis_attrs: Sequence[str],
    vis_idxs: Sequence[Sequence[int]],
    output_dir: str,
    step: int,
) -> List[str]:
    """One figure per vis category (chexpert.py:328-337). Returns paths."""
    paths = []
    for attr, cat_idxs in zip(vis_attrs, vis_idxs):
        n_rows = max(len(cat_idxs), 1)
        fig, axs = plt.subplots(
            n_rows, 3,
            figsize=(4 * imgs.shape[1] / 100, 3.3 * imgs.shape[2] / 100),
            dpi=100, frameon=False, squeeze=False,
        )
        fig.suptitle(attr)
        for i, idx in enumerate(cat_idxs):
            offset = idxs.index(idx)
            visualize_one(
                imgs[offset], masks[offset], labels[offset],
                patient_ids[offset], probs[offset], ATTR_NAMES, axs[i],
            )
        filename = "vis_{}_step_{}.png".format(attr.replace(" ", "_"), step)
        path = os.path.join(output_dir, "vis", filename)
        plt.savefig(path, dpi=100)
        plt.close()
        paths.append(path)
    return paths


def save_attn_maps(
    x: np.ndarray,                  # (B, H, W, C) denormalized input images
    attn_weights: List[np.ndarray], # per layer: (B, nh, HW, HW)
    patient_ids: Sequence[str],
    idxs: Sequence[int],
    output_dir: str,
    batch_element: int = 0,
) -> List[str]:
    """Per-layer attention grids (chexpert.py:363-397): 4 probe pixels at
    1/3-2/3 grid vertices, window-mean-pooled attention, rows=heads+image."""
    H, W = x.shape[1:3]
    paths = []
    pix_to_vis = lambda h, w: [
        (h // 3, w // 3), (h // 3, int(2 * w / 3)),
        (int(2 * h / 3), w // 3), (int(2 * h / 3), int(2 * w / 3)),
    ]
    window = 30

    for j, weights in enumerate(attn_weights):
        nh = weights.shape[1]
        fig, axs = plt.subplots(nh + 1, 4, figsize=(3, 3 / 4 * (1 + nh)), frameon=False)
        fig.suptitle(str(patient_ids[batch_element]), fontsize=8)
        for ax, (ph, pw) in zip(axs[0], pix_to_vis(H, W)):
            image = x[batch_element].copy()
            image = np.repeat(image, 3, axis=-1) if image.shape[-1] == 1 else image[..., :3]
            lo = (max(ph - window, 0), max(pw - window, 0))
            image[lo[0] : ph + window, lo[1] : pw + window] = np.array([1.0, 215 / 255, 0])
            ax.imshow(np.clip(image, 0, 1))
            ax.axis("off")
        attn = weights[batch_element]  # (nh, HW, HW)
        h = w = int(np.sqrt(attn.shape[-1]))
        ws = max(1, int(window * h / H))
        attn = attn.reshape(nh, h, w, h, w)
        for i, (ph, pw) in enumerate(pix_to_vis(h, w)):
            for hi in range(nh):
                win = attn[hi, max(ph - ws, 0) : ph + ws, max(pw - ws, 0) : pw + ws]
                axs[hi + 1, i].imshow(win.mean((0, 1)))
                axs[hi + 1, i].axis("off")
        filename = f"attn_image_idx_{idxs[batch_element]}_{batch_element}_layer_{j}.png"
        path = os.path.join(output_dir, "vis", filename)
        fig.subplots_adjust(0, 0, 1, 0.95, 0.05, 0.05)
        plt.savefig(path)
        plt.close()
        paths.append(path)
    return paths


def plot_roc(metrics: Dict, output_dir: str, filename: str,
             labels: Sequence[str] = tuple(ATTR_NAMES)) -> str:
    """2xN ROC + PR grid from a saved eval_results json (chexpert.py:399-427)."""
    fig, axs = plt.subplots(2, len(labels), figsize=(24, 12))
    for i, (fpr, tpr, aucs, precision, recall, label) in enumerate(
        zip(metrics["fpr"].values(), metrics["tpr"].values(), metrics["aucs"].values(),
            metrics["precision"].values(), metrics["recall"].values(), labels)
    ):
        axs[0, i].plot(fpr, tpr, label="AUC = %0.2f" % (aucs if aucs is not None else float("nan")))
        axs[0, i].plot([0, 1], [0, 1], "k--")
        axs[0, i].set_xlabel("False Positive Rate")
        axs[1, i].step(recall, precision, where="post")
        axs[1, i].set_xlabel("Recall")
        axs[0, i].set_title(label)
        axs[0, i].legend(loc="lower right")
    plt.suptitle(filename)
    axs[0, 0].set_ylabel("True Positive Rate")
    axs[1, 0].set_ylabel("Precision")
    for ax in axs.flatten():
        ax.set_xlim([0.0, 1.05])
        ax.set_ylim([0.0, 1.05])
        ax.set_aspect("equal")
    plt.tight_layout()
    path = os.path.join(output_dir, "plots", filename + ".png")
    plt.savefig(path, pad_inches=0.0)
    plt.close()
    return path
