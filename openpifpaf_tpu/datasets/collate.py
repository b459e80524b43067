"""Collate functions.

Reference parity: ``src/openpifpaf/datasets/collate.py:~10`` —
``collate_images_anns_meta`` (predict/eval: stack images, keep anns+meta as
lists) and ``collate_images_targets_meta`` (train: stack images and the
per-head target tensors).
"""

from __future__ import annotations

import numpy as np


def collate_images_anns_meta(batch):
    images = np.stack([b[0] for b in batch]).astype(np.float32)
    anns = [b[1] for b in batch]
    metas = [b[2] for b in batch]
    return images, anns, metas


def collate_images_targets_meta(batch):
    images = np.stack([b[0] for b in batch]).astype(np.float32)
    # b[1] is a tuple of per-head target pytrees; stack each leaf
    n_heads = len(batch[0][1])
    targets = []
    for head_i in range(n_heads):
        head_samples = [b[1][head_i] for b in batch]
        if isinstance(head_samples[0], dict):
            targets.append({k: np.stack([s[k] for s in head_samples])
                            for k in head_samples[0]})
        else:
            targets.append(np.stack(head_samples))
    metas = [b[2] for b in batch]
    return images, targets, metas


def collate_tracking_images_anns_meta(batch):
    """Eval collate for frame pairs: interleaved (2B, H, W, 3) images with
    the current frame's ground truth annotations per pair."""
    images = np.concatenate([np.stack(b[0]) for b in batch]).astype(np.float32)
    anns = [b[1] for b in batch]
    metas = [b[2] for b in batch]
    return images, anns, metas


def collate_tracking_images_targets_meta(batch):
    """Frame-pair batches: images come as (2, H, W, 3) per sample and are
    flattened to an interleaved (2B, H, W, 3) batch (frame pairs adjacent),
    mirroring the reference's tracking collate."""
    images = np.concatenate([np.stack(b[0]) for b in batch]).astype(np.float32)
    n_heads = len(batch[0][1])
    targets = []
    for head_i in range(n_heads):
        head_samples = [b[1][head_i] for b in batch]
        if isinstance(head_samples[0], dict):
            targets.append({k: np.stack([s[k] for s in head_samples])
                            for k in head_samples[0]})
        else:
            targets.append(np.stack(head_samples))
    metas = [b[2] for b in batch]
    return images, targets, metas
