"""Whole-volume validation: sliding-window inference + per-head metrics.

Mirrors validate_seg / inference (src/utils/validate.py:212-303): for each
volume, split -> batched forward -> stitch (all on device, eval/sliding.py),
then per deep-supervision head and per subject accumulate metrics; the last
head optionally exports NIfTI segmentations with the source affine/header
and shape restoration.
"""
from __future__ import annotations

import os
import os.path as P
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from .. import ops
from .metrics import SegMetricMC
from .sliding import (column_grid_plan, make_jitted_volume_inferencer,
                      patch_grid)


def _column_count(x, patch_size, overlap, stride_div):
    """Number of full-depth columns for a volume (the column-mode
    patch_batch: every column in one forward)."""
    pd, cp, co = column_grid_plan(x.shape[1:4], patch_size, overlap,
                                  stride_div)
    return len(patch_grid((pd,) + tuple(x.shape[2:4]), cp, co)) * x.shape[0]


def validate_seg(
    graph,
    variables,
    loader,
    sn_list: Optional[List[str]],
    num_mo: int,
    n_class: int,
    *,
    patch_size,
    overlap,
    mode: str = "fp",
    save_dir: Optional[str] = None,
    is_cc: bool = False,
    sn_fn_dict=None,
    restore_shape_func=None,
    restore_infokw=None,
    merge_label_func=None,
    multilabel_fusetype=None,
    patch_batch="auto",
    precision=None,
    mesh=None,
    artifact=None,
    infer=None,
    compute_dtype=None,
    serve_grid="patch",
    stride_div=None,
    tune_serving="auto",
    serve_stem="direct",
) -> List[SegMetricMC]:
    """Evaluate on a loader of (N, C, D, H, W) numpy batches.

    Returns one SegMetricMC per head (index -1 = final output), like
    validate_seg at src/utils/validate.py:212-264.  With ``mesh`` the
    patch grid of each volume shards across the device mesh
    (parallel/mesh.py::shard_patch_inference).  ``patch_batch='auto'``
    measures the best patch chunking once per workload signature on TPU
    (eval/autotune.py) and uses 2 elsewhere.

    ``artifact``: a loaded ``export.ServingArtifact`` — inference runs
    from the serialized module instead of (graph, variables), which may
    both be None then; the artifact emits the final head only, so pass
    ``num_mo=1``.

    ``infer``: a prebuilt inferencer
    (``make_jitted_volume_inferencer(..., hard_pred=True, multilabel=...)``
    or the mesh maker's result).  Callers that score repeatedly on the
    same volumes (tune_act validated scoring, the quality gate) pass one
    so its jit cache persists across validate_seg calls instead of
    retracing the patch/forward/stitch program every call.
    """
    if artifact is not None:
        if mesh is not None:
            raise ValueError("artifact serving does not support --dp_devices")
        if num_mo != 1:
            raise ValueError("serving artifacts emit the final head only; "
                             "pass num_mo=1")
    if serve_grid == "column" and mesh is not None:
        # the mesh maker shards the reference patch grid only
        raise ValueError("--serve_grid column does not compose with "
                         "--dp_devices serving")
    if artifact is not None:
        # the artifact's manifest decides the grid (volume_inferencer
        # handles the column plan internally — the patch shape is
        # pre-lowered at export); --serve_grid column is only legal when
        # the artifact was exported for it
        if serve_grid == "column" and \
                artifact.manifest.get("serve_grid") != "column":
            raise ValueError("--serve_grid column with an artifact "
                             "exported for the patch grid — re-export "
                             "with --serve_grid column "
                             "--export_column_depth N")
    elif serve_grid == "column" and not stride_div:
        # validate before the auto-batch path calls _column_count, which
        # would otherwise die with a TypeError inside column_grid_plan
        # (advisor r3); mirrors make_jitted_volume_inferencer's check
        raise ValueError("serve_grid='column' needs stride_div "
                         "(models.uresq.min_input_divisor's D entry)")
    if serve_stem == "s2d" and (artifact is not None or mesh is not None
                                or serve_grid == "column"):
        raise ValueError("--serve_stem s2d composes with the patch grid on "
                         "a single device only (not --artifact / "
                         "--dp_devices / --serve_grid column)")
    sm = [SegMetricMC(n_class, sn_list, is_cc=is_cc) for _ in range(num_mo)]
    multilabel = None  # set from the first batch's label rank

    # inferencer built on the first volume unless the caller passed one:
    # the auto-tuner needs an example volume, and the hard-pred rule (sign
    # test vs argmax) needs the label rank — both single-device and mesh
    # makers compile once per signature and return uint8 hard predictions
    # straight from the device
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
    sn_counter = -1

    def process(preds_dev, masks):
        """Materialize one volume's hard predictions (uint8 — argmax /
        sign-test computed on device) and accumulate host-side metrics."""
        nonlocal sn_counter
        preds = np.asarray(preds_dev)  # (M, N, D, H, W[, C])
        N = preds.shape[1]
        for j in range(N):
            sn_counter += 1
            for i in range(-num_mo, 0):
                if multilabel:
                    seg = np.moveaxis(preds[i, j], -1, 0)  # (C, D, H, W)
                else:
                    seg = preds[i, j]  # (D, H, W) class ids
                label = np.asarray(masks[j])
                pred = sm[i].evaluate_append_pred(
                    seg, label, multilabel,
                    multilabel_fusetype=multilabel_fusetype)
                if save_dir and i == -1:
                    _save_nii(pred, sn_list, sn_counter, sn_fn_dict, save_dir,
                              merge_label_func, multilabel_fusetype,
                              restore_shape_func, restore_infokw)

    # 1-deep pipeline: dispatch volume i+1's (async) device computation
    # before materializing volume i, so host-side metrics/NIfTI work and
    # the next upload overlap device compute instead of serializing with
    # it (the bench's sync -> async serving gap).  Costs one extra
    # in-flight prediction canvas of device memory.
    pending = None
    s2d_artifact = (artifact is not None
                    and artifact.manifest.get("serve_stem") == "s2d")
    for images, masks in iter(loader):
        if serve_stem == "s2d" or s2d_artifact:
            # host-side NDHWC: the s2d inferencer transforms on the HOST
            # before upload (a device round-trip would defeat the point)
            x = np.moveaxis(np.asarray(images), 1, -1)
        else:
            x = ops.ncdhw_to_ndhwc(jnp.asarray(images))
        if multilabel is None:
            # label (N, C, D, H, W) -> per-class sigmoid path; (N, D, H, W)
            # -> argmax path (same rank rule as evaluate_append)
            multilabel = np.asarray(masks).ndim == 5
        if infer is None:
            if artifact is not None:
                infer = artifact.volume_inferencer(
                    patch_batch=patch_batch, hard_pred=True,
                    multilabel=multilabel)
            elif mesh is not None:
                from ..parallel.mesh import make_sharded_volume_inferencer

                infer = make_sharded_volume_inferencer(
                    graph, mesh, mode=mode, precision=precision,
                    hard_pred=True, multilabel=multilabel,
                    compute_dtype=compute_dtype)
            elif serve_stem == "s2d":
                from ..ptq.deploy import make_s2d_volume_inferencer

                infer = make_s2d_volume_inferencer(
                    graph, variables, patch_batch=patch_batch,
                    hard_pred=True, multilabel=multilabel,
                    compute_dtype=compute_dtype or jnp.bfloat16)
                if infer is None:
                    # no eligible stem (e.g. --deploy none): serve direct
                    print("serve_stem=s2d: no eligible stem on this "
                          "graph (needs a 3^3-stride-2 init conv feeding "
                          "an int8 Pallas consumer — use --deploy "
                          "int8|mixed — and >= 32 channels on TPU); "
                          "falling back to the direct path")
                    pb = (8 if patch_batch in ("auto", 0, None)
                          else int(patch_batch))
                    infer = make_jitted_volume_inferencer(
                        graph, patch_batch=pb, mode=mode,
                        precision=precision, hard_pred=True,
                        multilabel=multilabel, compute_dtype=compute_dtype)
            else:
                pb = patch_batch
                if pb == "auto":
                    if serve_grid == "column":
                        # all columns in one forward (the measured-best
                        # batching — scripts/serve_volume_probe.py); the
                        # patch-grid autotuner's sweep doesn't apply
                        pb = _column_count(x, patch_size, overlap,
                                           stride_div)
                    else:
                        from .autotune import choose_patch_batch

                        pb = choose_patch_batch(graph, variables, x,
                                                patch_size, overlap,
                                                mode=mode,
                                                precision=precision,
                                                compute_dtype=compute_dtype,
                                                tune=tune_serving)
                infer = make_jitted_volume_inferencer(
                    graph, patch_batch=pb, mode=mode, precision=precision,
                    hard_pred=True, multilabel=multilabel,
                    compute_dtype=compute_dtype, serve_grid=serve_grid,
                    stride_div=stride_div)
        preds_dev = infer(variables, x, tuple(ops.triple(patch_size)),
                          tuple(ops.triple(overlap)))
        if pending is not None:
            process(*pending)
        pending = (preds_dev, masks)
    if pending is not None:
        process(*pending)
    return sm


def _save_nii(pred, sn_list, idx, sn_fn_dict, save_dir, merge_label_func,
              multilabel_fusetype, restore_shape_func, restore_infokw,
              suffix=""):
    from ..utils.nifti import load_nifti, save_nifti

    assert sn_fn_dict, "Please specify SN to filename mapping."
    sn = sn_list[idx]
    seg = pred
    if merge_label_func:
        seg = merge_label_func(seg, multilabel_fusetype)
    seg = np.asarray(seg)
    if restore_shape_func:
        seg = restore_shape_func(seg, **restore_infokw[sn])
    try:
        affine = load_nifti(sn_fn_dict[sn]).affine
    except Exception:
        affine = np.eye(4)
    save_nifti(P.join(save_dir, f"{sn}{suffix}.nii.gz"),
               seg.astype(np.uint16), affine)


def inference(graph, variables, loader, sn_list, *, save_dir, patch_size,
              overlap, sn_fn_dict=None, suffix="_seg", mode="fp",
              restore_shape_func=None, restore_infokw=None,
              merge_label_func=None, multilabel_fusetype=None,
              patch_batch="auto", artifact=None, compute_dtype=None,
              serve_grid="patch", stride_div=None, tune_serving="auto",
              serve_stem="direct"):
    """Label-free inference + NIfTI export (validate.py:266-303).  With
    ``artifact`` (export.ServingArtifact) the forward runs from the
    serialized module; graph/variables may be None."""
    if serve_stem == "s2d" and (artifact is not None
                                or serve_grid == "column"):
        raise ValueError("--serve_stem s2d composes with the patch grid on "
                         "a single device only")
    if not save_dir:
        print("No save directory specified for final true test inference!")
        return
    if serve_grid == "column" and artifact is not None:
        raise ValueError("--serve_grid column does not compose with "
                         "--artifact serving")
    if serve_grid == "column" and not stride_div:
        raise ValueError("serve_grid='column' needs stride_div "
                         "(models.uresq.min_input_divisor's D entry)")
    os.makedirs(save_dir, exist_ok=True)
    infer = None
    sn_counter = -1
    final_head = slice(-1, None)  # aux heads DCE'd out (see sliding.py)
    multilabel = merge_label_func is not None  # per-class sigmoid path

    def process(preds_dev):
        nonlocal sn_counter
        preds = np.asarray(preds_dev)  # uint8 hard predictions (on-device)
        for j in range(preds.shape[1]):
            sn_counter += 1
            if multilabel:
                pred = np.moveaxis(preds[-1, j], -1, 0)  # (C, D, H, W)
            else:
                pred = preds[-1, j]  # (D, H, W) class ids
            _save_nii(pred, sn_list, sn_counter, sn_fn_dict, save_dir,
                      merge_label_func, multilabel_fusetype,
                      restore_shape_func, restore_infokw, suffix)

    # 1-deep pipeline, same rationale as validate_seg: NIfTI encoding of
    # volume i overlaps the device computing volume i+1
    pending = None
    s2d_artifact = (artifact is not None
                    and artifact.manifest.get("serve_stem") == "s2d")
    for images, _ in iter(loader):
        if serve_stem == "s2d" or s2d_artifact:
            x = np.moveaxis(np.asarray(images), 1, -1)  # host NDHWC
        else:
            x = ops.ncdhw_to_ndhwc(jnp.asarray(images))
        if infer is None:
            if artifact is not None:
                infer = artifact.volume_inferencer(patch_batch=patch_batch,
                                                   hard_pred=True,
                                                   multilabel=multilabel)
            elif serve_stem == "s2d":
                from ..ptq.deploy import make_s2d_volume_inferencer

                infer = make_s2d_volume_inferencer(
                    graph, variables, patch_batch=patch_batch,
                    hard_pred=True, multilabel=multilabel,
                    compute_dtype=compute_dtype or jnp.bfloat16,
                    heads=final_head)
                if infer is None:
                    print("serve_stem=s2d: no eligible stem (needs "
                          "--deploy int8|mixed and >= 32 channels on "
                          "TPU) — direct path")
                    pb = (8 if patch_batch in ("auto", 0, None)
                          else int(patch_batch))
                    infer = make_jitted_volume_inferencer(
                        graph, patch_batch=pb, mode=mode, heads=final_head,
                        hard_pred=True, multilabel=multilabel,
                        compute_dtype=compute_dtype)
            else:
                pb = patch_batch
                if pb == "auto":
                    if serve_grid == "column":
                        pb = _column_count(x, patch_size, overlap,
                                           stride_div)
                    else:
                        from .autotune import choose_patch_batch

                        pb = choose_patch_batch(graph, variables, x,
                                                patch_size, overlap,
                                                mode=mode, heads=final_head,
                                                compute_dtype=compute_dtype,
                                                tune=tune_serving)
                infer = make_jitted_volume_inferencer(graph, patch_batch=pb,
                                                      mode=mode,
                                                      heads=final_head,
                                                      hard_pred=True,
                                                      multilabel=multilabel,
                                                      compute_dtype=
                                                      compute_dtype,
                                                      serve_grid=serve_grid,
                                                      stride_div=stride_div)
        preds_dev = infer(variables, x, tuple(ops.triple(patch_size)),
                          tuple(ops.triple(overlap)))
        if pending is not None:
            process(pending)
        pending = preds_dev
    if pending is not None:
        process(pending)


def true_test_inference(graph, variables, data, save_dir, mode="fp",
                        patch_batch="auto", multilabel_fusetype=None,
                        artifact=None, compute_dtype=None,
                        serve_grid="patch", stride_div=None,
                        tune_serving="auto", serve_stem="direct"):
    """Label-free export of the true-test split — the reference's
    ``inference_final`` (trainer.py:253-270,307; suffix '' as trainer.test
    passes it).  Shared by the mission driver and the Tester."""
    if data.true_test_image_loader is None:
        print("No true-test split found (true_test.txt); skipping "
              "true-test inference.")
        return
    inference(graph, variables, data.true_test_image_loader,
              data.true_test_sn, save_dir=save_dir,
              patch_size=data.slide_patch_size, overlap=data.slide_overlap,
              mode=mode, suffix="", patch_batch=patch_batch,
              sn_fn_dict=data.sn_to_fn_map,
              restore_shape_func=data.restore_shape_func,
              restore_infokw=data.restore_infokw,
              merge_label_func=data.merge_label_func,
              multilabel_fusetype=multilabel_fusetype, artifact=artifact,
              compute_dtype=compute_dtype, serve_grid=serve_grid,
              stride_div=stride_div, tune_serving=tune_serving,
              serve_stem=serve_stem)


def restore_crop(crop, pmin, pmax, shape):
    """Undo a crop back to the original volume shape (misc.py:162-171)."""
    image = np.zeros(shape, dtype=crop.dtype)
    image[pmin[0]:pmax[0], pmin[1]:pmax[1], pmin[2]:pmax[2]] = crop
    return image
