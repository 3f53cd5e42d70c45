"""Training losses (jax).

Mirrors src/utils/losses.py: the nine selectable criteria of
train_seg.py:119-138 are composed from these pieces:

  ce | focal | dice | hybrid(ce+dice) | focalplusdice | bce | bdice |
  bhybrid(bce+bdice)

Logits come in reference layout (N, C, D, H, W); integer targets (N, D, H, W)
for the softmax family, channel targets (N, C, D, H, W) for the sigmoid
(multi-label) family.  ``multi_output_loss`` applies deep-supervision head
weights (train_seg.py:114-117).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

EPS = 1e-6


def one_hot(label: jax.Array, n_class: int, axis: int = 1) -> jax.Array:
    return jnp.stack([(label == i) for i in range(n_class)],
                     axis=axis).astype(jnp.float32)


def cross_entropy(logits: jax.Array, target: jax.Array) -> jax.Array:
    """nn.CrossEntropyLoss (mean over voxels)."""
    logp = jax.nn.log_softmax(logits, axis=1)
    n_class = logits.shape[1]
    t = one_hot(target, n_class)
    return -jnp.mean(jnp.sum(t * logp, axis=1))


def focal_loss(logits: jax.Array, target: jax.Array, gamma: float = 2.0) -> jax.Array:
    """FocalLoss (losses.py:154-168): (1-p)^gamma-damped NLL, sum over voxels
    divided by the number of (non-negative) targets."""
    logp = jax.nn.log_softmax(logits, axis=1)
    logp = (1.0 - jnp.exp(logp)) ** gamma * logp
    n_class = logits.shape[1]
    t = one_hot(target, n_class)
    total = -jnp.sum(t * logp)
    return total / target.size


def general_dice_loss(logits: jax.Array, target: jax.Array,
                      weight=None, power: int = 2,
                      ignore_bkg: bool = True) -> jax.Array:
    """Softmax multi-class Dice (losses.py:32-77), 'adaptive' class weights
    1/max((sum target_c)^power, 25)."""
    n_class = logits.shape[1]
    probs = jax.nn.softmax(logits, axis=1)
    t = one_hot(target, n_class)
    if weight == "adaptive":
        w = 1.0 / jnp.maximum(jnp.sum(t, axis=(0, 2, 3, 4)) ** power, 25.0)
    elif weight is None:
        w = jnp.ones((n_class,), jnp.float32)
    else:
        w = jnp.asarray(weight, jnp.float32)
    if ignore_bkg:
        w = w.at[0].set(0.0)
    inter = jnp.sum(jnp.sum(probs * t, axis=(2, 3, 4)) * w, axis=1)
    union = jnp.sum(jnp.sum(probs + t, axis=(2, 3, 4)) * w, axis=1)
    loss = 1.0 - (2.0 * inter + EPS) / (union + EPS)  # (n,)
    return jnp.mean(loss)


def bce_with_logits(logits: jax.Array, target: jax.Array) -> jax.Array:
    """WeightedBCEWithLogitsLoss with no class weight (losses.py:24-29):
    plain mean sigmoid BCE."""
    return jnp.mean(jnp.maximum(logits, 0) - logits * target +
                    jnp.log1p(jnp.exp(-jnp.abs(logits))))


def multilabel_dice_loss(logits: jax.Array, target: jax.Array,
                         weight=None) -> jax.Array:
    """Sigmoid per-channel Dice, summed over (n, c) with weights normalized
    to sum to C, divided by n (losses.py:79-109)."""
    n, c = logits.shape[:2]
    if weight is None:
        w = jnp.ones((c,), jnp.float32)
    else:
        w = jnp.asarray(weight, jnp.float32)
    w = w / jnp.sum(w) * c
    pred = jax.nn.sigmoid(logits)
    inter = jnp.sum(pred * target, axis=(2, 3, 4))           # (n, c)
    sums = jnp.sum(target, axis=(2, 3, 4)) + jnp.sum(pred, axis=(2, 3, 4))
    d = (2.0 * inter + EPS) / (sums + EPS)
    loss = jnp.sum((1.0 - d) * w[None, :])
    return loss / n


def hybrid(l1: Callable, l2: Callable, w=(1.0, 1.0)) -> Callable:
    def f(logits, target):
        return w[0] * l1(logits, target) + w[1] * l2(logits, target)
    return f


LOSS_REGISTRY = {
    "ce": cross_entropy,
    "focal": focal_loss,
    "dice": general_dice_loss,
    "hybrid": hybrid(cross_entropy, general_dice_loss),
    "focalplusdice": hybrid(focal_loss, general_dice_loss),
    "bce": bce_with_logits,
    "bdice": multilabel_dice_loss,
    "bhybrid": hybrid(bce_with_logits, multilabel_dice_loss),
}


def get_loss(name: str) -> Callable:
    name = name.lower()
    if name not in LOSS_REGISTRY:
        raise ValueError(f"Unknown loss type: {name}")
    return LOSS_REGISTRY[name]


def head_loss_weights(num_mo: int) -> jnp.ndarray:
    """Deep-supervision weights 1/2^i (deepest head least), heads beyond the
    last 3 zeroed, normalized (train_seg.py:114-117)."""
    import numpy as np

    w = np.array([1 / 2 ** i for i in range(num_mo, 0, -1)])
    for i in range(num_mo - 3):
        w[i] = 0
    w = w / w.sum()
    return jnp.asarray(w, jnp.float32)


def multi_output_loss(loss_fn: Callable, head_weights: jax.Array,
                      outputs: jax.Array, target: jax.Array):
    """Weighted sum over stacked head outputs (M, N, C, D, H, W)
    (losses.py:119-138). Returns (total, per-head array)."""
    losses = [loss_fn(outputs[i], target) for i in range(outputs.shape[0])]
    arr = jnp.stack(losses)
    if outputs.shape[0] == 1:
        return arr[0], arr
    assert head_weights.shape[0] == outputs.shape[0], (
        f"{head_weights.shape[0]} head weights for {outputs.shape[0]} heads")
    return jnp.sum(arr * head_weights), arr
