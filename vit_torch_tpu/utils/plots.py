"""Visualization tools.

Capability parity with the reference's plotting side-tools (SURVEY.md §2a L9):
``object/od_plot.py`` / ``object_detr/plot_od.py`` (per-class hue box
overlays on images), ``object_detr/util/plot_utils.py:13-75`` (training-curve
plots from stats logs), and the ``CocoManager`` GT browsing helpers.

Backend: matplotlib (plotly is not in this image); functions return the
figure and optionally save to disk, headless-safe (Agg).
"""

from __future__ import annotations

import colorsys
import json
from typing import Dict, List, Optional, Sequence

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
from matplotlib import patches  # noqa: E402


def class_color(label: int, n_classes: int = 20):
    """Stable per-class hue (the reference's hue-per-class scheme,
    ``object/od_plot.py:44-170``)."""
    hue = (label * 0.61803398875) % 1.0
    return colorsys.hsv_to_rgb(hue, 0.85, 0.95)


def annotate(image: np.ndarray, boxes: np.ndarray,
             labels: Optional[Sequence[int]] = None,
             scores: Optional[Sequence[float]] = None,
             class_names: Optional[Dict[int, str]] = None,
             save_to: Optional[str] = None, ax=None):
    """Draw xyxy boxes with per-class colors and score labels over an image."""
    if ax is None:
        fig, ax = plt.subplots(figsize=(8, 8))
    else:
        fig = ax.figure
    ax.imshow(image)
    ax.axis("off")
    boxes = np.asarray(boxes).reshape(-1, 4)
    for i, box in enumerate(boxes):
        label = int(labels[i]) if labels is not None else 0
        color = class_color(label)
        x0, y0, x1, y1 = box
        ax.add_patch(patches.Rectangle((x0, y0), x1 - x0, y1 - y0,
                                       fill=False, edgecolor=color,
                                       linewidth=2))
        text = class_names.get(label, str(label)) if class_names else str(label)
        if scores is not None:
            text += f" {scores[i]:.2f}"
        ax.text(x0, y0 - 2, text, color="white", fontsize=8,
                bbox=dict(facecolor=color, alpha=0.8, pad=1))
    if save_to:
        fig.savefig(save_to, bbox_inches="tight", dpi=120)
        plt.close(fig)
    return fig


def plot_training_curves(stats_fp: str, keys: Sequence[str] = ("acc", "loss"),
                         save_to: Optional[str] = None):
    """Train/val metric curves from a stats JSON (reference
    ``plot_utils.py:13-75`` over our schema-compatible logs)."""
    with open(stats_fp) as f:
        d = json.load(f)
    splits = [s for s in ("train", "val") if isinstance(d.get(s), list)]
    fig, axes = plt.subplots(1, len(keys), figsize=(6 * len(keys), 4))
    if len(keys) == 1:
        axes = [axes]
    for ax, key in zip(axes, keys):
        for split in splits:
            rows = d[split]
            xs = [r["epoch"] for r in rows]
            ys = [r.get(key) for r in rows]
            ax.plot(xs, ys, marker="o", markersize=3, label=split)
        ax.set_xlabel("epoch")
        ax.set_ylabel(key)
        ax.legend()
        ax.grid(alpha=0.3)
    fig.suptitle(d.get("info", {}).get("arch", stats_fp))
    if save_to:
        fig.savefig(save_to, bbox_inches="tight", dpi=120)
        plt.close(fig)
    return fig


def plot_detection_logs(stats_fp: str, metric: str = "ap",
                        save_to: Optional[str] = None):
    """AP-vs-epoch curve from a detection stats JSON (cli/coco.py format)."""
    with open(stats_fp) as f:
        d = json.load(f)
    rows = d.get("logs", [])
    xs = [r["epoch"] for r in rows]
    ys = [r["val"]["bbox"].get(metric, 0) for r in rows]
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.plot(xs, ys, marker="o")
    ax.set_xlabel("epoch")
    ax.set_ylabel(f"bbox {metric}")
    ax.grid(alpha=0.3)
    if save_to:
        fig.savefig(save_to, bbox_inches="tight", dpi=120)
        plt.close(fig)
    return fig


class CocoBrowser:
    """GT browsing helper (the reference's ``CocoManager``,
    ``object_detr/plot_od.py:87+``): render an image's ground truth."""

    def __init__(self, dataset) -> None:
        self.dataset = dataset  # CocoDetectionDataset

    def show(self, index: int, save_to: Optional[str] = None):
        sample = self.dataset[index]
        valid = sample["box_mask"] > 0
        names = {v: self.dataset.coco.cats.get(k, {}).get("name", str(k))
                 for k, v in self.dataset.cat_to_label.items()}
        return annotate(sample["image"], sample["boxes"][valid],
                        sample["labels"][valid], class_names=names,
                        save_to=save_to)
