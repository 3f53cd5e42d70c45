"""Optimizer + LR schedule: Adam with poly decay and linear warmup.

Mirrors train_seg.py:97-112: poly LambdaLR with exponent 0.9 over
(iters_per_epoch * max_epoch) total steps, composed with a multiplicative
linear warmup over one epoch of iterations (5 epochs when fine-tuning from a
pretrain), per-iteration stepping; plus grad value-clipping at 1
(trainer.py:231 clip_grad_value_).
"""
from __future__ import annotations

import jax.numpy as jnp
import optax


def poly_warmup_schedule(base_lr: float, total_iters: int,
                         warmup_iters: int, exponent: float = 0.9,
                         warmup: str = "linear"):
    """lr(step) = base * max(1 - step/total, 0)^0.9 * warmup_factor(step).

    The poly factor is LambdaLR's (train_seg.py:99-100); the warmup factor
    is pytorch_warmup's dampening — 'linear' min(1, (step+1)/period)
    (pytorch_warmup/base.py:80-95) or 'exponential' 1 - exp(-(step+1)/period)
    (base.py:98-113).
    """
    def schedule(step):
        frac = jnp.maximum(1.0 - step / max(total_iters, 1), 0.0) ** exponent
        if warmup == "exponential":
            warm = 1.0 - jnp.exp(-(step + 1) / max(warmup_iters, 1))
        else:
            warm = jnp.minimum(1.0, (step + 1) / max(warmup_iters, 1))
        return base_lr * frac * warm

    return schedule


def clip_by_value(clip: float):
    """Element-wise gradient clipping to [-clip, clip] (torch
    clip_grad_value_ semantics — not norm clipping)."""
    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        import jax
        updates = jax.tree.map(lambda g: jnp.clip(g, -clip, clip), updates)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(base_lr: float, total_iters: int, warmup_iters: int,
                   weight_decay: float = 0.0, clip_value: float = 1.0):
    """Returns (optax optimizer, schedule fn). torch-Adam semantics: grads
    value-clipped, then L2 decay folded into the gradient (optim.Adam's
    weight_decay), then Adam with the scheduled lr."""
    sched = poly_warmup_schedule(base_lr, total_iters, warmup_iters)
    chain = [clip_by_value(clip_value)]
    if weight_decay > 0:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.adam(sched))
    return optax.chain(*chain), sched
