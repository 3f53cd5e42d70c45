"""Serving artifacts (export.py): jax.export round-trip + serving parity.

The reference's deployment artifact is a weight file that needs the full
model code + exact CLI flags to serve (src/models/PTQConv.py:128-143);
here the artifact is the serialized final-head patch forward itself.
These tests pin: (1) the exported module computes exactly what the live
fake-quant graph computes, (2) the whole-volume inferencer built from a
loaded artifact matches the direct sliding-window path voxel-for-voxel,
(3) static-batch artifacts pad ragged chunks correctly, (4) Pallas-carrying
graphs export TPU-only and refuse to serve on other backends, (5) format
validation rejects foreign zips.
"""
import json
import zipfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficientq_tpu import export as export_mod
from efficientq_tpu import nnir
from efficientq_tpu.eval.sliding import make_jitted_volume_inferencer
from efficientq_tpu.models import UResQConfig, build_uresq
from efficientq_tpu.ptq import fold_bn
from efficientq_tpu.quant import fake_quant_weight


@pytest.fixture(scope="module")
def tiny_qnet():
    kw = dict(num_mod=2, num_classes=3, depth_config=[1, 1, 1],
              width_config=[4, 8, 4], dilation_config=[1, 1, 1],
              drop_rate=0.0, fuse_bn=True, quantize=True,
              qlvl_w=4, qlvl_act=4, q_first=(256, -1), q_last=(256, -1),
              blk_type="mid", ds="simple", ds_depth_limit=3,
              init_stride=(2, 2, 2))
    graph = build_uresq(UResQConfig(**kw))
    variables = nnir.init(graph, jax.random.PRNGKey(7))
    fg, fv = fold_bn(graph, variables)
    # emulate the post-PTQ state: kernels on the alpha grid, act scales set
    for node in fg.qconv_nodes():
        q = node.attrs["qcfg"]
        p = fv["params"][node.name]
        if q.q_weight:
            a = jnp.maximum(jnp.max(jnp.abs(p["kernel"])), 1e-8)
            p["kernel"] = fake_quant_weight(p["kernel"], a, q.qlvl_w)
            p["alpha_w"] = a
        if q.q_act:
            p["alpha_act"] = jnp.float32(0.8)
    return fg, fv


@pytest.fixture(scope="module")
def artifact(tiny_qnet, tmp_path_factory):
    fg, fv = tiny_qnet
    exported, batch = export_mod.export_patch_model(fg, fv, (8, 8, 8), 2,
                                                    mode="quantized")
    path = str(tmp_path_factory.mktemp("art") / "serving_artifact.zip")
    export_mod.save_serving_artifact(path, exported, {
        "batch": batch, "patch_size": [8, 8, 8], "n_mod": 2, "n_class": 3})
    return path, batch


def test_patch_forward_parity(tiny_qnet, artifact):
    """Deserialized module == live fake-quant forward, final head."""
    fg, fv = tiny_qnet
    path, batch = artifact
    assert batch == "symbolic"  # XLA-path graphs lower with a free batch
    art = export_mod.load_serving_artifact(path)
    assert art.manifest["format"] == export_mod.FORMAT
    assert "cpu" in art.exported.platforms  # multi-platform export
    art.check_platform()  # cpu backend is covered
    x = jnp.asarray(np.random.RandomState(0).randn(3, 8, 8, 8, 2)
                    .astype(np.float32))
    ref = nnir.apply(fg, fv, x, mode="quantized")[-1:]
    got = art.patch_model_fn()(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-6, rtol=2e-6)


def test_volume_inferencer_matches_direct(tiny_qnet, artifact):
    """Whole-volume sliding-window serving from the artifact produces the
    same uint8 hard predictions as the direct jitted inferencer."""
    fg, fv = tiny_qnet
    path, _ = artifact
    art = export_mod.load_serving_artifact(path)
    vol = jnp.asarray(np.random.RandomState(1).randn(1, 12, 12, 12, 2)
                      .astype(np.float32))
    infer_a = art.volume_inferencer(patch_batch=2, hard_pred=True)
    out_a = infer_a(None, vol, (8, 8, 8), (4, 4, 4))
    infer_d = make_jitted_volume_inferencer(
        fg, patch_batch=2, mode="quantized", heads=slice(-1, None),
        hard_pred=True, multilabel=False)
    out_d = infer_d(fv, vol, (8, 8, 8), (4, 4, 4))
    assert out_a.dtype == jnp.uint8 and out_a.shape == out_d.shape
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_d))


def test_static_batch_pads_ragged_chunks(tiny_qnet):
    """A pinned-batch artifact (the fallback for graphs that cannot lower
    symbolically, e.g. Pallas) zero-pads ragged final chunks and drops the
    padded rows."""
    from jax import export as jexport

    fg, fv = tiny_qnet

    def patch_fn(xb):
        return nnir.apply(fg, fv, xb, mode="quantized")[-1:]

    spec = jax.ShapeDtypeStruct((4, 8, 8, 8, 2), jnp.float32)
    exported = jexport.export(jax.jit(patch_fn))(spec)
    art = export_mod.ServingArtifact(
        exported, {"batch": 4, "patch_size": [8, 8, 8]})
    x = jnp.asarray(np.random.RandomState(2).randn(3, 8, 8, 8, 2)
                    .astype(np.float32))
    got = art.patch_model_fn()(x)
    ref = patch_fn(x)
    assert got.shape == np.asarray(ref).shape  # padded rows dropped
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-6, rtol=2e-6)
    with pytest.raises(ValueError, match="> artifact batch"):
        art.patch_model_fn()(jnp.zeros((5, 8, 8, 8, 2)))


def test_pallas_deploy_exports_tpu_only(tiny_qnet, tmp_path):
    """Deployed graphs carry Mosaic custom calls: the export pins
    platforms=('tpu',) and check_platform refuses to serve elsewhere."""
    from efficientq_tpu.ptq.deploy import to_int8_inference

    fg, fv = tiny_qnet
    ig, iv = to_int8_inference(fg, fv, pallas=True)
    exported, batch = export_mod.export_patch_model(ig, iv, (8, 8, 8), 2,
                                                    mode="quantized")
    assert exported.platforms == ("tpu",)
    path = str(tmp_path / "tpu_art.zip")
    export_mod.save_serving_artifact(path, exported,
                                     {"batch": batch,
                                      "patch_size": [8, 8, 8]})
    art = export_mod.load_serving_artifact(path)
    assert jax.default_backend() == "cpu"  # the suite pins cpu
    with pytest.raises(RuntimeError, match="exported for"):
        art.check_platform()


def test_foreign_zip_rejected(tmp_path):
    path = str(tmp_path / "bogus.zip")
    with zipfile.ZipFile(path, "w") as z:
        z.writestr(export_mod.MANIFEST_NAME, json.dumps({"format": "x/9"}))
    with pytest.raises(ValueError, match="not a serving artifact"):
        export_mod.load_serving_artifact(path)


def test_bf16_artifact_close_to_f32(tiny_qnet, tmp_path):
    """--serve_dtype bf16 baked into the export (compute_dtype): the
    deserialized module's logits are bf16-rounded but close, and the
    manifest records the dtype for the serving client."""
    fg, fv = tiny_qnet
    exported, batch = export_mod.export_patch_model(
        fg, fv, (8, 8, 8), 2, mode="quantized",
        compute_dtype=jnp.bfloat16)
    path = str(tmp_path / "art_bf16.zip")
    export_mod.save_serving_artifact(path, exported, {
        "batch": batch, "patch_size": [8, 8, 8], "n_mod": 2, "n_class": 3,
        "serve_dtype": "bf16"})
    art = export_mod.load_serving_artifact(path)
    assert art.manifest["serve_dtype"] == "bf16"
    x = jnp.asarray(np.random.RandomState(2).randn(2, 8, 8, 8, 2)
                    .astype(np.float32))
    ref = nnir.apply(fg, fv, x, mode="quantized")[-1:]
    got = art.patch_model_fn()(x)
    d = float(jnp.max(jnp.abs(jnp.asarray(got, jnp.float32) - ref)))
    scale = float(jnp.std(ref))
    assert 0 < d < 0.1 * scale + 0.05, (d, scale)


def test_s2d_artifact_end_to_end(tmp_path):
    """The headline serving mode (--serve_stem s2d) as an artifact
    (export_s2d_model + ServingArtifact._s2d_volume_inferencer): the
    serialized module matches the live s2d forward exactly on a patch
    stack, and the manifest-driven whole-volume path agrees with the
    direct quantized inferencer on the hard segmentation."""
    from efficientq_tpu.eval.sliding import patch_grid
    from efficientq_tpu.pallas.stem import extract_s2d_patches
    from efficientq_tpu.ptq.deploy import (channels_first_tail,
                                           s2d_stem_serving,
                                           to_int8_inference)

    cfg = UResQConfig(num_mod=4, num_classes=3, depth_config=[1, 1, 1],
                      width_config=[8, 16, 8], dilation_config=[1, 1, 1],
                      init_stride=(2, 2, 2), drop_rate=0.0, blk_type="mid",
                      ds="simple", quantize=True, qlvl_w=4, qlvl_act=4,
                      q_first=(256, -1), q_last=(256, -1))
    graph = build_uresq(cfg)
    variables = nnir.init(graph, jax.random.PRNGKey(0))
    fg, fv = fold_bn(graph, variables)
    for node in fg.qconv_nodes():
        q = node.attrs["qcfg"]
        p = fv["params"][node.name]
        if q.q_weight:
            a = jnp.maximum(jnp.max(jnp.abs(p["kernel"])), 1e-8)
            p["kernel"] = fake_quant_weight(p["kernel"], a, q.qlvl_w)
            p["alpha_w"] = a
        if q.q_act:
            p["alpha_act"] = jnp.float32(1.0)
    ig, iv = to_int8_inference(fg, fv, pallas=True,
                               only_kernel_sizes={(3, 3, 3)})

    patch, overlap = (16, 16, 16), (4, 4, 4)
    res = export_mod.export_s2d_model(ig, iv, patch, 4, patch_batch=8)
    assert res is not None
    exported, batch, stem_attrs = res
    assert batch == 8
    path = str(tmp_path / "serving_artifact_s2d.zip")
    export_mod.save_serving_artifact(path, exported, {
        "task": "brats", "patch_size": list(patch),
        "overlap": list(overlap), "serve_stem": "s2d",
        "channels_first": True, "stem_geometry": stem_attrs,
        "n_mod": 4, "n_class": 3, "batch": batch, "deploy": "mixed",
        "serve_dtype": "bf16", "multilabel_fusetype": "brats_con"})
    art = export_mod.load_serving_artifact(path)
    art.check_platform()

    # (1) module == live s2d forward on the same patch stack, exactly
    vol_shape = (22, 20, 20)  # 2x2x2 grid (= the pinned batch), odd z start
    vol = np.random.RandomState(1).randn(1, *vol_shape, 4).astype(np.float32)
    starts = patch_grid(vol_shape, patch, overlap)
    g2, v2, stem = s2d_stem_serving(channels_first_tail(ig), iv)
    assert stem is not None
    stack, par = extract_s2d_patches(jnp.asarray(vol), starts, patch)
    # jitted reference: an eager bf16 walk rounds differently than the
    # compiled program (XLA fusion), and the artifact IS the compiled form
    ref = jax.jit(lambda t: nnir.apply(
        g2, v2, t, mode="quantized",
        compute_dtype=jnp.bfloat16)[-1:])((stack, par))
    got = art.patch_model_fn()((stack, par))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    # (2) manifest-driven whole-volume serving vs the direct inferencer
    infer = art.volume_inferencer(hard_pred=True, multilabel=True)
    seg = np.asarray(infer(None, vol, patch, overlap))
    direct = make_jitted_volume_inferencer(
        ig, patch_batch=8, mode="quantized", heads=slice(-1, None),
        hard_pred=True, multilabel=True, compute_dtype=jnp.bfloat16)
    seg_ref = np.asarray(direct(iv, jnp.asarray(vol), patch, overlap))
    assert seg.shape == seg_ref.shape
    agree = (seg == seg_ref).mean()
    assert agree > 0.999, agree

    # (3) odd-geometry volumes are refused with the fallback named
    bad = np.random.RandomState(2).randn(1, 22, 21, 20, 4).astype(np.float32)
    with pytest.raises(ValueError, match="direct serving"):
        infer(None, bad, patch, overlap)


def test_s2d_artifact_through_validate_seg(tmp_path):
    """infer --artifact serving_artifact_s2d.zip path: validate_seg feeds
    the s2d artifact inferencer host NDHWC volumes (manifest-driven) and
    produces the same metrics as the direct quantized graph."""
    from efficientq_tpu.eval.validate import validate_seg
    from efficientq_tpu.ptq.deploy import to_int8_inference

    cfg = UResQConfig(num_mod=1, num_classes=3, depth_config=[1, 1, 1],
                      width_config=[4, 8, 4], dilation_config=[1, 1, 1],
                      init_stride=(2, 2, 2), drop_rate=0.0, blk_type="mid",
                      ds=None, quantize=True, qlvl_w=4, qlvl_act=4,
                      q_first=(256, -1), q_last=(256, -1))
    graph = build_uresq(cfg)
    variables = nnir.init(graph, jax.random.PRNGKey(3))
    fg, fv = fold_bn(graph, variables)
    for node in fg.qconv_nodes():
        q = node.attrs["qcfg"]
        p = fv["params"][node.name]
        if q.q_weight:
            a = jnp.maximum(jnp.max(jnp.abs(p["kernel"])), 1e-8)
            p["kernel"] = fake_quant_weight(p["kernel"], a, q.qlvl_w)
            p["alpha_w"] = a
        if q.q_act:
            p["alpha_act"] = jnp.float32(1.0)
    ig, iv = to_int8_inference(fg, fv, pallas=True,
                               only_kernel_sizes={(3, 3, 3)})
    patch, overlap = (8, 8, 8), (2, 2, 2)
    res = export_mod.export_s2d_model(ig, iv, patch, 1, patch_batch=27)
    assert res is not None
    exported, batch, stem_attrs = res
    path = str(tmp_path / "serving_artifact_s2d.zip")
    export_mod.save_serving_artifact(path, exported, {
        "task": "lits", "patch_size": list(patch),
        "overlap": list(overlap), "serve_stem": "s2d",
        "channels_first": True, "stem_geometry": stem_attrs,
        "n_mod": 1, "n_class": 3, "batch": batch, "deploy": "mixed",
        "serve_dtype": "bf16"})
    art = export_mod.load_serving_artifact(path)

    rng = np.random.RandomState(4)
    loader = [(rng.randn(1, 1, 16, 16, 16).astype(np.float32),
               (rng.rand(1, 16, 16, 16) * 3).astype(np.int64))
              for _ in range(2)]
    sm = validate_seg(None, None, loader, None, 1, 3, patch_size=patch,
                      overlap=overlap, artifact=art)
    m = sm[-1].get_metric()
    assert np.isfinite(m["dsc"])

    sm_ref = validate_seg(ig, iv, loader, None, 1, 3, patch_size=patch,
                          overlap=overlap, mode="quantized",
                          compute_dtype=jnp.bfloat16, patch_batch=27)
    m_ref = sm_ref[-1].get_metric()
    assert abs(m["dsc"] - m_ref["dsc"]) < 0.02, (m["dsc"], m_ref["dsc"])
