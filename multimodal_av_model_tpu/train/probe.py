"""Feature-probe utilities for the pretraining story.

The reference's accuracy rides on externally pretrained wav2vec2 middle
features (reference model/encoder.py:83-100).  Our stand-in is contrastive-
only AV-alignment pretraining (train.contrastive_only); these probes measure
whether the pretrained features actually organize the frame classes the loss
targets (overlap vs solo — reference contrastive.py:8-44 anchors/candidates).
"""

from __future__ import annotations

import numpy as np


def collect_frame_features(outputs: list[dict], speaker: int = 1):
    """Stack per-frame contrastive features + mask labels from model output
    dicts (``contrast{n}`` [B,T,P], ``mask_ds{n}`` [B,T]); drops pad (3)."""
    feats, labels = [], []
    for out in outputs:
        f = np.asarray(out[f"contrast{speaker}"], np.float32)
        m = np.asarray(out[f"mask_ds{speaker}"])
        keep = m != 3
        feats.append(f[keep])
        labels.append(m[keep])
    return np.concatenate(feats), np.concatenate(labels)


def nearest_centroid_probe(
    feats: np.ndarray, labels: np.ndarray, train_frac: float = 0.5, seed: int = 0
) -> float:
    """Nearest-centroid classification accuracy on L2-normalized features.

    Simple, parameter-free: if the feature space separates the classes, the
    class centroids do the work.  Returns held-out accuracy.
    """
    feats = feats / np.maximum(np.linalg.norm(feats, axis=-1, keepdims=True), 1e-6)
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(feats))
    n_train = int(len(feats) * train_frac)
    tr, te = order[:n_train], order[n_train:]
    classes = np.unique(labels)
    centroids = np.stack([
        feats[tr][labels[tr] == c].mean(axis=0) for c in classes
    ])
    pred = classes[np.argmax(feats[te] @ centroids.T, axis=-1)]
    return float((pred == labels[te]).mean())


def overlap_vs_solo_labels(mask: np.ndarray) -> np.ndarray:
    """Collapse the 3-way mask to the probe classes: 1 = overlap, 0 = solo
    (either speaker's solo — consistent across both speaker views)."""
    return (mask == 1).astype(np.int32)
