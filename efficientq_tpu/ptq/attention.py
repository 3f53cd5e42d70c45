"""Segmentation-aware attention weighting for PTQ calibration.

Mirrors src/ptqer.py:

- ``hard_pred``: task-specific hard predictions from the last head
  (get_pred_lits / get_pred_brats, src/utils/metrics.py:172-192)
- ``class_voxel_counts``: per-class voxel counts inside the body mask
  (get_class_num_lits / get_class_num_brats, src/ptqer.py:172-188)
- ``attention_weight_map``: per-class weights (max_n / n_c)^p
  (get_att_weight_map, src/ptqer.py:210-235)
- ``mask_pyramid``: 5 average-pooled resolutions of the voxel weight map
  (get_mask_pyramid, src/ptqer.py:141-169)

All tensors NDHWC (channels last); masks are (N, D, H, W).
"""
from __future__ import annotations

from functools import partial
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import ops


def pred_lits(out: jnp.ndarray) -> jnp.ndarray:
    """(N, D, H, W, C) logits -> (N, D, H, W) argmax labels."""
    return jnp.argmax(out, axis=-1)


def pred_brats(out: jnp.ndarray) -> jnp.ndarray:
    """(N, D, H, W, C) logits -> (N, D, H, W) overlay labels: later channels
    overwrite earlier (1 = WT, 2 = TC, 3 = ET)."""
    hard = jax.nn.sigmoid(out) >= 0.5
    pred = jnp.zeros(out.shape[:-1], jnp.int32)
    for i in range(out.shape[-1]):
        pred = jnp.where(hard[..., i], i + 1, pred)
    return pred


def pred_brats_con_merge(out: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Overlay prediction with conservative channel merging first
    (get_pred_brats_con_merge, utils/metrics.py:195-209) — used for the
    Qseg/FPseg NIfTI dumps.

    ``axis``: the class axis (``1`` for the channels-first serving tail,
    ptq/deploy.py::channels_first_tail)."""
    axis = axis % out.ndim
    hard = (jax.nn.sigmoid(out) >= 0.5).astype(jnp.int32)

    def ch(i):
        return jax.lax.index_in_dim(hard, i, axis=axis, keepdims=False)

    merged = [ch(0)]
    for i in range(1, out.shape[axis]):
        merged.append(merged[-1] * ch(i))
    pred = jnp.zeros(merged[0].shape, jnp.int32)
    for i, m in enumerate(merged):
        pred = jnp.where(m > 0, i + 1, pred)
    return pred


def hard_pred(out: jnp.ndarray, task: str) -> jnp.ndarray:
    if task == "lits":
        return pred_lits(out)
    if task == "brats":
        return pred_brats(out)
    raise ValueError(f"unknown task {task}")


@partial(jax.jit, static_argnames="task")
def _class_voxel_counts(out, body_mask, task):
    if task == "lits":
        pred = pred_lits(out)
        return jnp.stack([jnp.sum((pred == i) & body_mask)
                          for i in range(3)])
    if task == "brats":
        hard = jax.nn.sigmoid(out) >= 0.5
        bkg = (jnp.sum(jnp.sum(hard, axis=-1) == 0)
               - jnp.sum(~body_mask))
        return jnp.stack([bkg] + [jnp.sum(hard[..., i] & body_mask)
                                  for i in range(hard.shape[-1])])
    raise ValueError(f"unknown task {task}")


def class_voxel_counts(out: jnp.ndarray, body_mask: jnp.ndarray,
                       task: str) -> List[int]:
    """Per-class voxel counts of the hard prediction within the body mask.
    One jitted program + one host transfer (not a sync per class); the jit
    is module-level (task static) so repeat calls hit the trace cache."""
    return [int(v) for v in np.asarray(_class_voxel_counts(out, body_mask,
                                                           task))]


def attention_weight_map(out_last: jnp.ndarray, body_mask: jnp.ndarray,
                         style: str, task: str) -> Tuple[Dict[int, float], List[int]]:
    """Per-class attention weights from the FP prediction.

    style 'p:<power>': weight_c = (max(nums) / n_c)^p, 1.0 for empty classes
    (src/ptqer.py:225-235).
    """
    nums = class_voxel_counts(out_last, body_mask, task)
    if not style.startswith("p:"):
        raise ValueError(f"unknown attention weight map style {style}")
    p = float(style[2:])
    weight_map = {}
    mx = max(nums)
    for i, n in enumerate(nums):
        weight_map[i] = 1.0 if n == 0 else (mx / n) ** p
    return weight_map, nums


def mask_pyramid(output_fp: jnp.ndarray, body_mask: jnp.ndarray,
                 weight_map: Dict[int, float], init_stride, num_lvls: int = 5,
                 task: str = "lits") -> List[jnp.ndarray]:
    """num_lvls-level pyramid of voxel weight maps, one per feature
    resolution.

    output_fp: stacked heads (M, N, D, H, W, C); the last head drives the
    prediction.  Level 0 is the prediction average-pooled by init_stride;
    each next level halves resolution.  Outside the body mask the weight is
    1 (src/ptqer.py:141-169).
    """
    init_stride = ops.triple(init_stride)
    out = output_fp[-1]  # (N, D, H, W, C)
    out = ops.avg_pool3d(out, init_stride)
    body = ops.max_pool3d(body_mask[..., None].astype(jnp.float32),
                          init_stride)[..., 0] > 0.5
    pyramid = []
    for _ in range(num_lvls):
        pred = hard_pred(out, task)
        mask = jnp.ones(pred.shape, jnp.float32)
        for k, v in weight_map.items():
            mask = jnp.where(pred == k, jnp.float32(v), mask)
        mask = jnp.where(body, mask, 1.0)
        pyramid.append(mask)
        out = ops.avg_pool3d(out, 2)
        body = ops.max_pool3d(body[..., None].astype(jnp.float32), 2)[..., 0] > 0.5
    return pyramid


def match_pyramid_level(pyramid, y_shape_ndhwc):
    """Pick the pyramid level whose spatial shape matches the layer output
    (EfficientQConv.py:53-59). Returns None when no level matches."""
    if not pyramid:
        return None
    target = tuple(y_shape_ndhwc[1:4])
    for mask in pyramid:
        if tuple(mask.shape[1:4]) == target:
            return mask
    return None
