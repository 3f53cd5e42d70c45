"""Mission drivers: train_fp and ptq.

Mirror src/train_seg.py:27-203 and src/ptq_seg.py + src/ptqer.py:282-387.
"""
from __future__ import annotations

import os
import os.path as P

import jax
import jax.numpy as jnp
import numpy as np

from .. import nnir, ops
from ..data.transforms import center_crop
from ..eval.validate import validate_seg
from ..models import build_uresq, torch_io, validate_spatial_shape
from ..models.uresq import min_input_divisor
from ..ptq import run_ptq
from ..quant import pack_int_weight
from ..train import Trainer
from . import definer


def _make_dp_mesh(args, check_batch: bool = False):
    """Build the data mesh: --mesh_shape D,I (hybrid dcn x ici, multi-host)
    or --dp_devices (1-D local; 0 = off, -1 = all)."""
    shape = getattr(args, "mesh_shape", None)
    if shape:
        from ..parallel import make_hybrid_mesh

        n_dcn, n_ici = (int(v) for v in shape.split(","))
        # --batch_size is PER PROCESS (each process's loader contributes
        # its shard, parallel/mesh.py::host_local_batch): it must divide
        # this process's share of the mesh
        local_share = (n_dcn * n_ici) // max(jax.process_count(), 1)
        if check_batch and args.batch_size % max(local_share, 1) != 0:
            raise ValueError(f"batch_size {args.batch_size} (per process) "
                             f"not divisible by this process's "
                             f"{local_share} mesh devices")
        mesh = make_hybrid_mesh(n_dcn, n_ici)
        print(f"Hybrid data mesh dcn={n_dcn} x ici={n_ici}: {mesh}")
        return mesh
    dp = getattr(args, "dp_devices", 0) or 0
    if not dp:
        return None
    from jax.sharding import Mesh

    devs = jax.devices()
    n = len(devs) if dp < 0 else dp
    # user-input checks: real exceptions, not asserts (advisor r2 —
    # asserts vanish under python -O and surface as sharding errors)
    if n > len(devs):
        raise ValueError(f"--dp_devices {n} > {len(devs)} devices")
    if check_batch and args.batch_size % n != 0:
        raise ValueError(
            f"batch_size {args.batch_size} not divisible by {n} devices")
    mesh = Mesh(np.array(devs[:n]), ("data",))
    print(f"Data-parallel over {n} devices: {mesh}")
    return mesh


def _final_test(graph, variables, hub, num_mo, n_class, save_dir, args,
                mode="fp", mesh=None, artifact=None, stride_div=None):
    """validate_final + optional inference_final equivalent: per-split
    metric files, then label-free true-test export (trainer.py:253-307).
    With ``artifact`` the forward runs from the serialized serving module
    (export.py) and graph/variables may be None.

    ``stride_div``: the net's D-stride multiple (min_input_divisor) —
    required when --serve_grid column pads full-depth serving columns."""
    os.makedirs(save_dir, exist_ok=True)
    is_cc = bool(getattr(args, "is_cc", False))
    serve_dtype = (jnp.bfloat16
                   if getattr(args, "serve_dtype", "f32") == "bf16" else None)
    serve_grid = getattr(args, "serve_grid", "patch")
    if serve_grid == "column" and stride_div is None:
        raise ValueError("--serve_grid column is not available for this "
                         "mission path (no model config to derive the "
                         "stride multiple from)")
    for split, loader, sns in (("val", hub.valloader, hub.val_sn),
                               ("test", hub.testloader, hub.test_sn)):
        if loader is None:
            continue
        nii_dir = P.join(save_dir, split) if args.save_nii else None
        sm = validate_seg(graph, variables, loader, sns, num_mo, n_class,
                          patch_size=hub.slide_patch_size,
                          overlap=hub.slide_overlap, mode=mode,
                          patch_batch=getattr(args, "patch_batch", 0)
                          or "auto",
                          tune_serving=getattr(args, "tune_serving",
                                               "auto"),
                          save_dir=nii_dir, is_cc=is_cc, mesh=mesh,
                          artifact=artifact,
                          sn_fn_dict=hub.sn_to_fn_map,
                          restore_shape_func=hub.restore_shape_func,
                          restore_infokw=hub.restore_infokw,
                          merge_label_func=hub.merge_label_func,
                          multilabel_fusetype=hub.multilabel_fusetype,
                          compute_dtype=serve_dtype,
                          serve_grid=serve_grid, stride_div=stride_div,
                          serve_stem=getattr(args, "serve_stem", "direct"))
        with open(P.join(save_dir, f"{split}_seg.txt"), "w") as f:
            for i in range(-1, -num_mo - 1, -1):
                sm[i].write_metric(f, "Output %d:" % i, is_indiv=True)
        sm[-1].print_metric("  " + split)
    if getattr(args, "true_test", False):
        from ..eval.validate import true_test_inference

        true_test_inference(graph, variables, hub,
                            P.join(save_dir, "true_test"), mode=mode,
                            patch_batch=getattr(args, "patch_batch", 0)
                            or "auto", artifact=artifact,
                            tune_serving=getattr(args, "tune_serving",
                                                 "auto"),
                            multilabel_fusetype=hub.multilabel_fusetype,
                            compute_dtype=serve_dtype,
                            serve_grid=serve_grid, stride_div=stride_div,
                            serve_stem=getattr(args, "serve_stem",
                                               "direct"))


def train_fp(args):
    """FP training mission (train_seg.py:27-203)."""
    hub, data_info, nMod, nClass, patch_size = definer.get_data_cube(args)
    cfg, model_info, n_mo = definer.get_model_config(args)
    validate_spatial_shape(patch_size, cfg, "--patch_size")
    graph = build_uresq(cfg)
    variables = nnir.init(graph, jax.random.PRNGKey(0))

    qinfo = "FP"
    if args.resume:
        # resume into the original experiment directory (train_seg.py:68-69)
        snap_root = P.dirname(P.abspath(args.resume))
    else:
        snap_root = definer.make_snapshot_dir(args, "exp_fp", model_info,
                                              qinfo)

    warmup_epochs = 5 if args.pretrain else 1
    test_interval = (args.test_interval
                     if args.test_interval > args.max_epoch / 20
                     else max(args.max_epoch // 20, 1))
    # TensorBoard sink (train_seg.py:163-169), optional dependency
    tb_writer = None
    try:
        from torch.utils.tensorboard import SummaryWriter

        tb_writer = SummaryWriter(log_dir=P.join(
            os.getcwd(), "results", args.task, "tboard",
            "round" + str(args.round), P.basename(snap_root)))
    except Exception:
        pass
    mesh = _make_dp_mesh(args, check_batch=True)
    if getattr(args, "fsdp", False) and mesh is None:
        raise ValueError("--fsdp requires --dp_devices")

    trainer = Trainer(
        graph, variables, hub, loss_name=args.loss, num_mo=n_mo, mesh=mesh,
        n_class=nClass, base_lr=args.lr, max_epoch=args.max_epoch,
        snapshot_root=snap_root, weight_decay=float(args.weight_decay),
        warmup_epochs=warmup_epochs, test_interval=test_interval,
        display_interval=args.disp_interval,
        multilabel_fusetype=args.merge_type, tb_writer=tb_writer,
        ckpt_backend=getattr(args, "ckpt_backend", "pickle"),
        fsdp=getattr(args, "fsdp", False), remat=getattr(args, "remat", 0),
        amp=getattr(args, "amp", False))
    if args.resume:
        trainer.resume(args.resume)
    elif args.pretrain:
        trainer.load_pretrain(args.pretrain)
    trainer.train()
    print("Training complete.")

    ext = ".orbax" if trainer.ckpt_backend == "orbax" else ".pkl"

    def _exists(p):
        return P.isdir(p) if ext == ".orbax" else P.isfile(p)

    if not args.no_test:
        best = P.join(snap_root, "state_seg_max" + ext)
        if _exists(best):
            trainer.load_pretrain(best)
            _final_test(graph, trainer.variables, hub, n_mo, nClass,
                        P.join(snap_root, "seg_max"), args,
                        stride_div=min_input_divisor(cfg)[0])
        last = P.join(snap_root, "state_%04d%s" % (args.max_epoch, ext))
        if _exists(last):
            trainer.load_pretrain(last)
            _final_test(graph, trainer.variables, hub, n_mo, nClass,
                        P.join(snap_root, "seg_%04d" % args.max_epoch), args,
                        stride_div=min_input_divisor(cfg)[0])
    return snap_root


def _calib_crop_shape(args, img):
    """The shared calibration crop rule (ptqer.py:96-105): explicit
    --lwq_patchsz, else each spatial dim capped at 192 and rounded down to
    a multiple of 64."""
    if args.lwq_patchsz:
        return [int(x) for x in args.lwq_patchsz.split(",")]
    return [min(x, 192) // 64 * 64 for x in img.shape[-3:]]


def _calib_sequence(args, hub, count, per_volume=False):
    """``count`` sequential center-cropped (img, label) pairs after the
    --lwq_dataid skip (ptqer.py:83-111), with a descriptive error when the
    train split is too short (bare StopIteration otherwise).

    ``per_volume=False`` keeps the reference's unit: each item is one
    trainseqloader BATCH (test_batch_size volumes — the reference's
    get_calibration_data counts batches for both --lwq_dataid and
    --lwq_batchsz, ptqer.py:87-103).  ``per_volume=True`` flattens batches
    so each item is exactly ONE volume — --lwq_select scores candidates
    individually, so its unit must be a volume regardless of
    --test_batch_size."""
    hub.trainseqloader.dataset.use_fix_transform()
    it = iter(hub.trainseqloader)
    pairs = []
    try:
        for _ in range(args.lwq_dataid):
            next(it)
        while len(pairs) < count:
            img, label = next(it)
            shape = _calib_crop_shape(args, img)
            img, label = center_crop(img, shape), center_crop(label, shape)
            if per_volume:
                for j in range(img.shape[0]):
                    if len(pairs) < count:
                        pairs.append((img[j:j + 1], label[j:j + 1]))
            else:
                pairs.append((img, label))
    except StopIteration:
        unit = "volumes" if per_volume else "batches"
        raise ValueError(
            f"calibration needs --lwq_dataid ({args.lwq_dataid}) + {count} "
            f"sequential {unit}, but the train split has fewer") from None
    return pairs


def get_calibration_data(args, hub):
    """One (or lwq_batchsz-stacked) center-cropped calibration volume(s)
    from the sequential train loader (ptqer.py:83-111)."""
    pairs = _calib_sequence(args, hub, args.lwq_batchsz)
    img = np.concatenate([p[0] for p in pairs], axis=0)
    label = np.concatenate([p[1] for p in pairs], axis=0)
    return img, label


def get_calibration_candidates(args, hub):
    """K sequential candidate (img, label) volume pairs for --lwq_select,
    each center-cropped by the same rule as the single-volume path."""
    pairs = _calib_sequence(args, hub, args.lwq_select, per_volume=True)
    return [p[0] for p in pairs], [p[1] for p in pairs]


def ptq(args):
    """PTQ mission (ptq_seg.py:7-32 + ptqer.do_ptq:282-387)."""
    hub, data_info, nMod, nClass, patch_size = definer.get_data_cube(args)
    cfg, model_info, n_mo = definer.get_model_config(args)
    graph = build_uresq(cfg)
    variables = nnir.init(graph, jax.random.PRNGKey(0))

    validate_spatial_shape(patch_size, cfg, "--patch_size")
    if args.lwq_patchsz:
        # an explicit calibration crop must also flow through the net (the
        # auto rule rounds to multiples of 64, always compatible)
        validate_spatial_shape(
            [int(x) for x in args.lwq_patchsz.split(",")], cfg,
            "--lwq_patchsz")

    qinfo = definer.qinfo_string(args)
    snap_dir = definer.make_snapshot_dir(args, "exp_ptq", model_info, qinfo)

    # load pretrained FP weights (torch or our pickle; ptq_seg.py:19-21) —
    # load_torch_checkpoint already tries torch.load, falls back to plain
    # pickle, and unwraps {'state_dict': ...}
    if not args.pretrain:
        raise ValueError("PTQ requires --pretrain")
    print("pretrain is :", args.pretrain)
    variables = torch_io.load_torch_checkpoint(graph, variables,
                                               args.pretrain)

    # multi-chip calibration + eval: Gram accumulation and the patch grid
    # shard over the mesh (parallel/ptq.py, parallel/mesh.py)
    mesh = _make_dp_mesh(args)

    # optional FP evaluation before quantization (ptqer.py:309-310)
    if args.test_fp:
        from ..ptq import fold_bn

        fg, fv = fold_bn(graph, variables)
        _final_test(fg, fv, hub, n_mo, nClass, P.join(snap_dir, "fp"), args,
                    mesh=mesh, stride_div=min_input_divisor(cfg)[0])

    hp = definer.get_lwq_hyperparams(args)
    ptq_kw = dict(
        task=args.task, init_stride=definer.parse_triple(args.init_stride),
        hp=hp, verbose=args.lwq_verbose, mesh=mesh,
        granularity=getattr(args, "lwq_granularity", "layer"))
    act_offset = getattr(args, "act_offset", 0)
    if act_offset:
        # offset (signed-asymmetric) activation grids, searched per layer
        # at calibration (ptq/engine.run_ptq act_offset); scope 'tail'
        # restricts the search to the basin-trigger set (the last
        # ResBlock's convs, engine.tail_sensitive_convs)
        from ..ptq.engine import tail_sensitive_convs

        scope = getattr(args, "act_offset_scope", "tail")
        ptq_kw["act_offset"] = act_offset
        if scope == "tail":
            ptq_kw["act_offset_convs"] = set(tail_sensitive_convs(graph))
            print(f"act_offset: searching k in 0..{act_offset} on "
                  f"{sorted(ptq_kw['act_offset_convs'])}")
        else:
            print(f"act_offset: searching k in 0..{act_offset} on every "
                  f"q_act conv")
    mixed_frac = getattr(args, "mixed_frac", 0.0)
    lwq_select = getattr(args, "lwq_select", 0)
    if lwq_select:
        # calibration-volume selection (ptq/select.py): calibrate on each
        # of K candidates, keep the best by train-volume dice
        if args.lwq_batchsz != 1:
            raise ValueError("--lwq_select is incompatible with "
                             "--lwq_batchsz > 1 (candidates are "
                             "single volumes)")
        if lwq_select < 2:
            raise ValueError("--lwq_select needs at least 2 candidates")
        from ..ptq.select import select_calibration

        cand_imgs, cand_labels = get_calibration_candidates(args, hub)
        tune_pairs = list(zip(cand_imgs, cand_labels))
        fgraph, qvars, report, selection = select_calibration(
            graph, variables, cand_imgs, cand_labels,
            num_mo=n_mo, n_class=nClass,
            patch_size=hub.slide_patch_size, overlap=hub.slide_overlap,
            multilabel_fusetype=hub.multilabel_fusetype,
            mixed_frac=mixed_frac, mixed_qlvl=args.mixed_qlvl,
            mixed_tail=getattr(args, "mixed_tail", "on") == "on", **ptq_kw)
        calib_x = ops.ncdhw_to_ndhwc(
            jnp.asarray(cand_imgs[selection["picked"]]))
        with open(P.join(snap_dir, "calib_select.txt"), "w") as f:
            for i, s in enumerate(selection["scores"]):
                mark = "  <- picked" if i == selection["picked"] else ""
                f.write(f"candidate {args.lwq_dataid + i}: "
                        f"train-volume dice {s:.6f}{mark}\n")
        print(f"calib_select: picked candidate "
              f"{args.lwq_dataid + selection['picked']} "
              f"(train-volume dice {selection['scores'][selection['picked']]:.4f} "
              f"over {lwq_select} candidates)")
    else:
        img, _label = get_calibration_data(args, hub)
        tune_pairs = [(img, _label)]
        calib_x = ops.ncdhw_to_ndhwc(jnp.asarray(img))
        if args.lwq_verbose:
            print("Calibration data shape:", img.shape)
        if mixed_frac:
            # sensitivity-driven mixed precision: two-pass recalibration,
            # worst layers lifted to --mixed_qlvl (ptq/engine.run_ptq_mixed)
            from ..ptq import run_ptq_mixed

            fgraph, qvars, report = run_ptq_mixed(
                graph, variables, calib_x, mixed_frac=mixed_frac,
                mixed_qlvl=args.mixed_qlvl,
                mixed_tail=getattr(args, "mixed_tail", "on") == "on",
                **ptq_kw)
        else:
            fgraph, qvars, report = run_ptq(graph, variables, calib_x,
                                            **ptq_kw)
    if report.mixed_upgraded:
        # persist which layers calibrated at the lifted grid (needed to
        # reason about the export; the map itself ships in the export as
        # __qlvl_overrides__)
        print(f"mixed precision: {len(report.mixed_upgraded)} layers at "
              f"qlvl {args.mixed_qlvl}: {', '.join(report.mixed_upgraded)}")
        with open(P.join(snap_dir, "mixed_upgraded.txt"), "w") as f:
            f.write("\n".join(report.mixed_upgraded) + "\n")

    _scorer_cache = {}

    def _tune_scorer():
        """Quantized-dice scorer on the labeled calibration/train volumes
        (validation never touched) — shared by --tail_alpha_sweep and
        --tune_act; one jitted inferencer across every score call."""
        if "fn" in _scorer_cache:
            return _scorer_cache["fn"]
        from ..eval.sliding import make_jitted_volume_inferencer
        from ..eval.validate import validate_seg

        t_sn = [f"calib{i}" for i in range(len(tune_pairs))]
        # score geometry clamped to the calibration crop: the crop
        # (--lwq_patchsz / the 192-cap rule) can be smaller than the
        # task's sliding patch, and grid_starts rejects patch > volume
        vol_shape = np.asarray(tune_pairs[0][0]).shape[2:5]
        score_ps = tuple(min(p, v) for p, v in zip(
            ops.triple(hub.slide_patch_size), vol_shape))
        score_ov = tuple(o if o < p else p // 2 for o, p in zip(
            ops.triple(hub.slide_overlap), score_ps))
        score_infer = make_jitted_volume_inferencer(
            fgraph, patch_batch=2, mode="quantized", hard_pred=True,
            multilabel=np.asarray(tune_pairs[0][1]).ndim == 5)

        def tune_score(v):
            sm = validate_seg(fgraph, v, tune_pairs, t_sn, n_mo, nClass,
                              patch_size=score_ps,
                              overlap=score_ov, mode="quantized",
                              patch_batch=2,
                              multilabel_fusetype=hub.multilabel_fusetype,
                              infer=score_infer)
            return float(sm[-1].get_metric()["dsc"])

        _scorer_cache["fn"] = tune_score
        return tune_score

    if getattr(args, "tail_alpha_sweep", False):
        # validated activation-clip-range sweep on the tail convs
        # (ptq/tune.py::sweep_tail_alpha): the W2A2 basin fix — the
        # recon-optimal tail alphas clip too tightly for downstream dice
        # (measured +0.23 uniform-W2A2 on the gate); factor 1.0 is a
        # candidate, so the sweep cannot lose by its own score
        from ..ptq.tune import sweep_tail_alpha

        facs = tuple(float(x) for x in
                     getattr(args, "tail_alpha_factors",
                             "1.0,1.3,1.7,2.2,3.0").split(","))
        qvars, ainfo = sweep_tail_alpha(fgraph, qvars, _tune_scorer(),
                                        factors=facs)
        if ainfo["scores"]:
            print(f"tail_alpha_sweep: kept x{ainfo['best_factor']} "
                  f"(calib-volume dice {ainfo['best_score']:.4f}) over "
                  f"{[f for f, _ in ainfo['scores']]} on "
                  f"{ainfo['convs']}")
            with open(P.join(snap_dir, "tail_alpha_sweep.txt"), "w") as f:
                for fac, s in ainfo["scores"]:
                    mark = ("  <- kept"
                            if fac == ainfo["best_factor"] else "")
                    f.write(f"x{fac}: dice {s:.6f}{mark}\n")

    if getattr(args, "tune_act", 0):
        # joint alpha_act refinement on the calibration volume
        # (tune_activation_range, src/ptqer.py:238-272 — unused there),
        # VALIDATED by quantized dice on the labeled calibration volume(s):
        # at 2-bit the raw reconstruction objective overfits (more iters ->
        # lower MSE, worse held-out dice, docs/quantization.md), so the
        # best-scoring iterate is kept — iteration 0 included, making the
        # flag safe at any precision
        from ..ptq.tune import tune_activation_range

        tune_score = _tune_scorer()
        qvars, tune_losses, tinfo = tune_activation_range(
            fgraph, qvars, calib_x, report.output_fp,
            max_iter=args.tune_act, score_fn=tune_score)
        print(f"tune_act: recon MSE {tune_losses[0]:.6g} -> "
              f"{tune_losses[-1]:.6g} over {len(tune_losses)} iters; "
              f"kept iter {tinfo['best_iter']} "
              f"(calib-volume dice {tinfo['best_score']:.4f})")
        with open(P.join(snap_dir, "tune_act_loss.txt"), "w") as f:
            f.write("\n".join(f"{v:.8g}" for v in tune_losses))
        with open(P.join(snap_dir, "tune_act_score.txt"), "w") as f:
            for it, s in tinfo["scores"]:
                mark = "  <- kept" if it == tinfo["best_iter"] else ""
                f.write(f"iter {it}: dice {s:.6f}{mark}\n")

    if getattr(args, "qat_epochs", 0):
        # quantization-aware fine-tune of the calibrated net (ptq/qat.py):
        # STE training under the deployed fake-quant forward, best-val-
        # dice epoch kept (epoch 0 = pure PTQ included, so the flag can
        # only help).  Beyond-reference: src/ptqer.py stops at calibration.
        from ..ptq.qat import run_qat

        qat_dir = P.join(snap_dir, "qat")
        os.makedirs(qat_dir, exist_ok=True)
        qvars, qat_log = run_qat(
            fgraph, qvars, hub, num_mo=n_mo, n_class=nClass,
            loss_name=args.loss, epochs=args.qat_epochs, lr=args.qat_lr,
            snapshot_root=qat_dir, mesh=mesh,
            multilabel_fusetype=hub.multilabel_fusetype,
            display_interval=args.disp_interval,
            weight_decay=float(args.weight_decay))
        kd = qat_log["kept_dice"]
        print(f"qat: kept epoch {qat_log['kept_epoch']}"
              + (f" (val dice {kd:.4f})" if kd is not None else ""))

    print(f"FP forward costs {report.fp_forward_seconds:.3f}s, PTQ costs "
          f"{report.calibration_seconds:.3f}s.")
    with open(P.join(snap_dir, "time_cost.txt"), "w") as f:
        f.write(report.time_cost_line())
    with open(P.join(snap_dir, "layer_loss.txt"), "w") as f:
        f.write("\n".join(report.layer_loss_lines()))
    # per-layer ADMM trajectories (loss/residuals/rho per iteration) — the
    # reference's loss_history + plot_save observability
    # (EfficientQConv.py:122-127, ptqer.py:275-279), as one npz
    np.savez_compressed(
        P.join(snap_dir, "layer_loss_curve.npz"),
        **{f"{name}/{k}": v
           for name, hist in report.layer_histories.items()
           for k, v in hist.items()})
    if args.lwq_verbose:
        # loss-curve PNG per layer (the reference's plot_save helper,
        # src/ptqer.py:275-279); best-effort when matplotlib is present
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig = plt.figure(figsize=(8, 5))
            for name, hist in report.layer_histories.items():
                plt.plot(hist["loss"], label=name, linewidth=0.8)
            plt.yscale("log")
            plt.xlabel("ADMM iteration")
            plt.ylabel("reconstruction loss")
            plt.legend(fontsize=4, ncol=2)
            fig.savefig(P.join(snap_dir, "layer_loss_curve.png"), dpi=120)
            plt.close(fig)
        except Exception as e:
            print(f"loss-curve plot skipped: {e}")
    with open(P.join(snap_dir, "class_voxel_nums.txt"), "w") as f:
        for n in report.class_voxel_nums:
            f.write(f"{n}\n")

    _dump_seg_niis(report, args.task, snap_dir)

    if not args.no_test:
        _final_test(fgraph, qvars, hub, n_mo, nClass, P.join(snap_dir, "ptq"),
                    args, mode="quantized", mesh=mesh,
                    stride_div=min_input_divisor(cfg)[0])

    _save_quantized(fgraph, qvars, snap_dir)
    if getattr(args, "export_artifact", False):
        _save_artifact(fgraph, qvars, hub, nMod, nClass, snap_dir, args)
    return snap_dir


def infer(args):
    """Serving mission (ours — no reference counterpart): load a PTQ
    export (state_in_int8.pkl / state_in_int8_compress.npz /
    state_in_fp.pkl) and run whole-volume inference without
    recalibrating.  The reference can only evaluate a quantized net by
    re-running the full PTQ pipeline (src/ptqer.py:282-387); here the
    packed export reloads directly (torch_io.load_int8_checkpoint,
    mirroring restore_fp_weight, src/models/PTQConv.py:144-152) and
    ``--deploy int8|mixed`` additionally serves through the int8
    deployment rewrite (fused Pallas kernels on TPU).

    Model/quant flags must match the ptq run that produced the export.
    ``--true_test``/``--save_nii``/``--is_cc``/``--dp_devices``/
    ``--patch_batch`` all apply.

    ``--artifact serving_artifact.zip`` instead serves from a serialized
    serving artifact (export.py): no --pretrain and no model/quant flags —
    the artifact IS the computation.  ``--export_artifact`` writes such an
    artifact of THIS run's serving graph (including any --deploy rewrite,
    which bakes the fused Pallas kernels in and pins platforms=('tpu',)).
    """
    hub, data_info, nMod, nClass, patch_size = definer.get_data_cube(args)

    if getattr(args, "artifact", None):
        from ..export import load_serving_artifact

        art = load_serving_artifact(args.artifact)
        art.check_platform()
        # spatial dims are static in the exported module (only batch may
        # be symbolic): the serving patch size must match the export's.
        # Column artifacts pin their own D (the export-time column depth);
        # only H/W must match the task patch.
        want = (art.patch_size[1:]
                if art.manifest.get("serve_grid") == "column"
                else art.patch_size)
        got = tuple(ops.triple(hub.slide_patch_size))
        got = got[1:] if art.manifest.get("serve_grid") == "column" else got
        if got != tuple(want):
            raise ValueError(
                f"--patch_size {tuple(ops.triple(hub.slide_patch_size))} "
                f"does not match the artifact's {art.patch_size}")
        # the manifest knows what it serves: a task/modality/class mismatch
        # would otherwise surface as an opaque StableHLO shape error (or,
        # worse, silently score against the wrong task's labels)
        for key, got in (("task", args.task), ("n_mod", int(nMod)),
                         ("n_class", int(nClass))):
            want = art.manifest.get(key)
            if want is not None and want != got:
                raise ValueError(
                    f"artifact was exported for {key}={want!r}; this run "
                    f"is {key}={got!r} — serve it with the matching task "
                    f"flags")
        snap_dir = definer.make_snapshot_dir(args, "exp_infer", "artifact",
                                             "ARTIFACT")
        print(f"serving from artifact {args.artifact} "
              f"(batch={art.batch}, platforms={list(art.exported.platforms)})")
        if getattr(args, "dp_devices", 0):
            raise ValueError("--artifact serving does not support "
                             "--dp_devices (the module is pre-lowered)")
        _final_test(None, None, hub, 1, nClass, P.join(snap_dir, "infer"),
                    args, mode="quantized", artifact=art)
        return snap_dir

    cfg, model_info, n_mo = definer.get_model_config(args)
    validate_spatial_shape(patch_size, cfg, "--patch_size")
    graph = build_uresq(cfg)
    variables = nnir.init(graph, jax.random.PRNGKey(0))
    if not args.pretrain:
        raise ValueError("infer requires --pretrain (a PTQ export) or "
                         "--artifact (a serving artifact)")

    qinfo = definer.qinfo_string(args)
    snap_dir = definer.make_snapshot_dir(args, "exp_infer", model_info,
                                         qinfo)

    # exports are of the folded graph: fold first (the random-init BN
    # stats fold into conv params that the export then overwrites)
    from ..ptq import apply_qlvl_overrides, fold_bn

    fgraph, fvars = fold_bn(graph, variables)
    # mixed-precision exports carry per-layer grids (__qlvl_overrides__):
    # rebuild the serving qcfgs from the export so lifted layers unpack
    # and fake-quantize on the grids they were calibrated with
    overrides = torch_io.read_export_qlvl_overrides(args.pretrain)
    if overrides:
        fgraph = apply_qlvl_overrides(fgraph, overrides)
    fvars = torch_io.load_int8_checkpoint(fgraph, fvars, args.pretrain)

    deploy = getattr(args, "deploy", "none")
    if deploy != "none":
        from ..ptq.deploy import to_int8_inference

        only = {(3, 3, 3)} if deploy == "mixed" else None
        fgraph, fvars = to_int8_inference(fgraph, fvars,
                                          only_kernel_sizes=only)
        n_int8 = sum(1 for node in fgraph.nodes
                     if node.attrs.get("int8"))
        print(f"deploy={deploy}: {n_int8} convs on the int8 path")

    if getattr(args, "export_artifact", False):
        _save_artifact(fgraph, fvars, hub, nMod, nClass, snap_dir, args)

    mesh = _make_dp_mesh(args)
    _final_test(fgraph, fvars, hub, n_mo, nClass,
                P.join(snap_dir, "infer"), args, mode="quantized",
                mesh=mesh, stride_div=min_input_divisor(cfg)[0])
    return snap_dir


def _save_artifact(graph, variables, hub, n_mod, n_class, snap_dir, args):
    """Serialize the final-head serving forward next to the weight exports
    (export.py): manifest + jax.export StableHLO in one zip."""
    from .. import export as export_mod
    from ..eval.sliding import column_grid_plan
    from ..models.uresq import min_input_divisor

    pb = getattr(args, "patch_batch", 0) or 0
    serve_dtype = getattr(args, "serve_dtype", "f32")
    patch_size = tuple(ops.triple(hub.slide_patch_size))
    overlap = tuple(ops.triple(hub.slide_overlap))
    serve_grid = getattr(args, "serve_grid", "patch")
    column_depth = None
    if serve_grid == "column":
        # column serving's patch D is the full (stride-padded) volume
        # depth — data-dependent, so a column artifact pins it at export
        # (--export_column_depth, e.g. 155 for standard BraTS volumes).
        # Shallower volumes pad up at serve time; deeper ones need a new
        # artifact.
        depth = getattr(args, "export_column_depth", 0) or 0
        if depth <= 0:
            raise ValueError("--export_artifact with --serve_grid column "
                             "needs --export_column_depth (the deepest "
                             "volume this artifact will serve)")
        cfg, _, _ = definer.get_model_config(args)
        column_depth, patch_size, overlap = column_grid_plan(
            (depth,) + patch_size[1:], patch_size, overlap,
            min_input_divisor(cfg)[0])
    exported, batch = export_mod.export_patch_model(
        graph, variables, patch_size, n_mod,
        mode="quantized", patch_batch=pb if pb > 0 else 4,
        compute_dtype=jnp.bfloat16 if serve_dtype == "bf16" else None)
    path = P.join(snap_dir, "serving_artifact.zip")
    export_mod.save_serving_artifact(path, exported, {
        "task": args.task,
        "patch_size": list(patch_size),
        "overlap": list(overlap),
        "serve_grid": serve_grid,
        **({"column_depth": int(column_depth)}
           if column_depth is not None else {}),
        "n_mod": int(n_mod),
        "n_class": int(n_class),
        "batch": batch,
        "deploy": getattr(args, "deploy", "none"),
        "serve_dtype": serve_dtype,
        "multilabel_fusetype": hub.multilabel_fusetype,
    })
    print(f"serving artifact -> {path} (batch={batch}, "
          f"platforms={list(exported.platforms)})")

    if (getattr(args, "serve_stem", "direct") == "s2d"
            and serve_grid == "patch"):
        # ALSO ship the headline serving mode (--serve_stem s2d) as an
        # artifact: the exported module is the fused s2d-stem forward
        # (channels-first tail); the host transform is manifest-driven
        # package code on the serving side (export.py
        # ServingArtifact._s2d_volume_inferencer).  The direct artifact
        # above stays alongside as the odd-geometry fallback.
        g_dep, v_dep = graph, variables
        if not any(n.attrs.get("int8") for n in graph.nodes):
            # the ptq mission hands the post-PTQ (undeployed) graph here;
            # the s2d stem rewrite needs the int8 Pallas consumers, so
            # apply the mixed deployment (the headline serving mode)
            from ..ptq.deploy import to_int8_inference

            only = (None if getattr(args, "deploy", "none") == "int8"
                    else {(3, 3, 3)})
            g_dep, v_dep = to_int8_inference(graph, variables,
                                             only_kernel_sizes=only)
        res = export_mod.export_s2d_model(
            g_dep, v_dep, patch_size, n_mod,
            # default 8 = the standard BraTS whole-grid forward; ragged
            # grids zero-pad up (patch_model_fn)
            patch_batch=pb if pb > 0 else 8)
        if res is None:
            print("serve_stem=s2d artifact skipped: no eligible stem "
                  "(need --deploy int8|mixed and a >=32-channel stem)")
        else:
            exported_s, batch_s, stem_attrs = res
            path_s = P.join(snap_dir, "serving_artifact_s2d.zip")
            export_mod.save_serving_artifact(path_s, exported_s, {
                "task": args.task,
                "patch_size": list(patch_size),
                "overlap": list(overlap),
                "serve_stem": "s2d",
                "channels_first": True,
                "stem_geometry": stem_attrs,
                "n_mod": int(n_mod),
                "n_class": int(n_class),
                "batch": batch_s,
                "deploy": getattr(args, "deploy", "none"),
                "serve_dtype": "bf16",
                "multilabel_fusetype": hub.multilabel_fusetype,
            })
            print(f"s2d serving artifact -> {path_s} (batch={batch_s}, "
                  f"platforms={list(exported_s.platforms)})")
    return path


def _dump_seg_niis(report, task, snap_dir):
    """Side-by-side Q vs FP hard segmentations (ptqer.py:372-377; brats uses
    the conservative-merge prediction, utils/metrics.py:216-219)."""
    from ..ptq.attention import hard_pred, pred_brats_con_merge
    from ..utils.nifti import save_nifti

    for tag, out in (("Qseg", report.output_q), ("FPseg", report.output_fp)):
        if task == "brats":
            pred = np.asarray(pred_brats_con_merge(out[-1])).astype(np.uint8)
        else:
            pred = np.asarray(hard_pred(out[-1], task)).astype(np.uint8)
        for i in range(pred.shape[0]):
            save_nifti(P.join(snap_dir, f"{tag}{i}.nii.gz"), pred[i])


def _save_quantized(graph, variables, snap_dir):
    """FP-valued, int8-packed and npz-compressed exports
    (ptqer.py:383-387, PTQConv.store_int_weight)."""
    import pickle

    sd = torch_io.to_torch_state_dict(graph, variables)
    # the effective per-layer grids: mixed precision (run_ptq_mixed)
    # rewrites qcfgs per node, so exports must carry the map — reloading
    # on uniform CLI flags would unpack/serve lifted layers on the wrong
    # grid (torch_io.load_int8_checkpoint / the infer mission consume it;
    # load_torch_state_dict ignores non-node keys)
    sd["__qlvl_overrides__"] = {
        node.name: (node.attrs["qcfg"].qlvl_w, node.attrs["qcfg"].qlvl_act)
        for node in graph.qconv_nodes()}
    with open(P.join(snap_dir, "state_in_fp.pkl"), "wb") as f:
        pickle.dump({"state_dict": sd}, f)

    sd_int = dict(sd)
    for node in graph.qconv_nodes():
        qcfg = node.attrs["qcfg"]
        if not qcfg.q_weight:
            continue
        w = sd[f"{node.name}.weight"]
        alpha = np.asarray(sd[f"{node.name}.alpha_w"])
        sd_int[f"{node.name}.weight"] = pack_int_weight(w, alpha, qcfg.qlvl_w)
    with open(P.join(snap_dir, "state_in_int8.pkl"), "wb") as f:
        pickle.dump({"state_dict": sd_int}, f)
    np.savez_compressed(P.join(snap_dir, "state_in_int8_compress.npz"),
                        state_dict=sd_int)
