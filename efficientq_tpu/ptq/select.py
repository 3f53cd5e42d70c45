"""Calibration-volume selection (ours — no reference counterpart).

The reference leaves the calibration volume to ``--lwq_dataid`` with no
guidance (src/ptqer.py:86-109).  At aggressive settings that choice
dominates quality: the W2A2 calibration matrix (docs/quantization.md)
shows held-out dice is bimodal across calibration draws — a ~0.1 dice
swing, larger than any granularity/scale-mode choice.

``select_calibration`` calibrates once per candidate volume and keeps the
result with the best quantized dice **on the labeled candidate (train)
volumes themselves** — labels the user legitimately has; the validation
split is never touched.  The proxy study (scripts/calib_select_probe.py →
experiments/calib_select_probe.json) showed why this is the scoring rule: train-split
dice picked the best draw with zero regret, while calibration-set and
cross-validated reconstruction error both ANTI-correlate with held-out
dice at 2-bit (the good-basin draw had the *highest* held-out
reconstruction error) — reconstruction-based selection picks the worst
draw.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

from .. import ops
from .engine import run_ptq, run_ptq_mixed


def select_calibration(
    graph,
    variables,
    candidate_imgs: Sequence[np.ndarray],
    candidate_labels: Sequence[np.ndarray],
    *,
    num_mo: int,
    n_class: int,
    patch_size,
    overlap,
    multilabel_fusetype=None,
    mixed_frac: float = 0.0,
    mixed_qlvl: int = 16,
    mixed_tail: bool = True,
    verbose: bool = False,
    **ptq_kw,
):
    """Run PTQ once per candidate calibration volume; keep the best.

    ``candidate_imgs``/``candidate_labels`` are NCDHW numpy volumes (one
    batch entry each, as yielded by the sequential train loader).  Every
    calibrated net is scored by mean foreground dice over ALL candidate
    volumes (sliding-window inference, same machinery as validation).

    Returns ``(fgraph, qvars, report, selection)`` for the winning
    candidate, where ``selection`` is a dict with per-candidate scores and
    the picked index — missions write it to ``calib_select.txt``.
    """
    from ..eval.validate import validate_seg

    if len(candidate_imgs) != len(candidate_labels):
        raise ValueError("candidate imgs/labels length mismatch")
    if len(candidate_imgs) < 2:
        raise ValueError("--lwq_select needs at least 2 candidates")

    score_pairs = list(zip(candidate_imgs, candidate_labels))
    sn = [f"cand{i}" for i in range(len(candidate_imgs))]
    ranking = None
    if mixed_frac:
        # the mixed-precision sensitivity ranking is a property of the
        # trained weights far more than of the calibration volume (top-25%
        # upgrade sets agree across draws — scripts/mixed_rank_probe.py),
        # so rank ONCE on the first candidate and reuse: 1 + K calibration
        # passes instead of 2K
        _, _, rep1 = run_ptq(
            graph, variables,
            ops.ncdhw_to_ndhwc(jnp.asarray(candidate_imgs[0])),
            verbose=verbose, **ptq_kw)
        ranking = rep1.layer_rel_losses or rep1.layer_losses
    best, scores = None, []
    for i, img in enumerate(candidate_imgs):
        calib_x = ops.ncdhw_to_ndhwc(jnp.asarray(img))
        if mixed_frac:
            fg, fv, report = run_ptq_mixed(
                graph, variables, calib_x, mixed_frac=mixed_frac,
                mixed_qlvl=mixed_qlvl, mixed_tail=mixed_tail,
                verbose=verbose, ranking=ranking, **ptq_kw)
        else:
            fg, fv, report = run_ptq(graph, variables, calib_x,
                                     verbose=verbose, **ptq_kw)
        sm = validate_seg(fg, fv, score_pairs, sn, num_mo, n_class,
                          patch_size=patch_size, overlap=overlap,
                          mode="quantized", patch_batch=2,
                          multilabel_fusetype=multilabel_fusetype)
        score = float(sm[-1].get_metric()["dsc"])
        if verbose:
            print(f"calib_select candidate {i}: train-volume dice "
                  f"{score:.4f}")
        scores.append(score)
        # keep only the best-so-far: each (fg, fv, report) holds a full
        # quantized parameter set plus the FP calibration activations —
        # retaining all K would cost K x model memory for nothing
        if best is None or score > scores[best[0]]:
            best = (i, fg, fv, report)

    picked, fg, fv, report = best
    return fg, fv, report, {"scores": scores, "picked": picked}
