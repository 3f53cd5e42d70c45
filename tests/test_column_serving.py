"""Full-depth column serving (--serve_grid column).

The reference always serves an overlapped D-patch grid
(src/utils/validate.py:235-240); on BraTS its D starts {0, 27} recompute
101 of 155 planes.  Column serving pads D to the net's stride multiple and
runs (D, ph, pw) columns — eval/sliding.py::column_grid_plan.  These tests
pin the plan geometry and that the inferencer's column output is EXACTLY
the padded-volume sliding window cropped back (the machinery introduces no
numeric change beyond the grid choice itself).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficientq_tpu import nnir
from efficientq_tpu.eval.sliding import (column_grid_plan,
                                         make_jitted_volume_inferencer,
                                         patch_grid,
                                         sliding_window_inference)
from efficientq_tpu.models import build_uresq
from efficientq_tpu.models.uresq import UResQConfig, min_input_divisor


@pytest.fixture(scope="module")
def tiny():
    cfg = UResQConfig(num_mod=2, num_classes=3, depth_config=[1, 1, 1],
                      width_config=[4, 8, 4], dilation_config=[1, 1, 1],
                      init_stride=(2, 2, 2), drop_rate=0.0, blk_type="mid",
                      ds="simple")
    graph = build_uresq(cfg)
    variables = nnir.init(graph, jax.random.PRNGKey(0))
    return cfg, graph, variables


def test_column_grid_plan_flagship_geometry():
    # BraTS: (155, 240, 240), patch 128, overlap 16, net stride multiple 16
    pd, patch, ov = column_grid_plan((155, 240, 240), (128, 128, 128),
                                     (16, 16, 16), 16)
    assert pd == 160
    assert patch == (160, 128, 128) and ov == (0, 16, 16)
    # 4 columns instead of the reference grid's 8 cubes
    assert len(patch_grid((160, 240, 240), patch, ov)) == 4
    assert len(patch_grid((155, 240, 240), (128,) * 3, (16,) * 3)) == 8


def test_column_inferencer_is_padded_sliding_window(tiny):
    """Column output == sliding window over the D-padded volume, cropped —
    exactly (the mode changes the grid, nothing else)."""
    cfg, graph, variables = tiny
    div = min_input_divisor(cfg)[0]
    rng = np.random.RandomState(0)
    vol = jnp.asarray(rng.randn(1, 18, 24, 24, 2).astype(np.float32))

    infer = make_jitted_volume_inferencer(graph, patch_batch=4, mode="fp",
                                          serve_grid="column",
                                          stride_div=div)
    got = infer(variables, vol, (16, 16, 16), (4, 4, 4))

    pd, patch, ov = column_grid_plan((18, 24, 24), (16, 16, 16), (4, 4, 4),
                                     div)
    vp = jnp.pad(vol, ((0, 0), (0, pd - 18), (0, 0), (0, 0), (0, 0)))

    def model_fn(xb):
        return nnir.apply(graph, variables, xb, mode="fp")

    want = sliding_window_inference(model_fn, vp, patch, ov, patch_batch=4)
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(want[:, :, :18]))


def test_column_equals_patch_when_depth_fits(tiny):
    """A volume whose D equals the patch depth: both grids have the single
    D start 0, so column serving must match patch serving bit-for-bit."""
    cfg, graph, variables = tiny
    div = min_input_divisor(cfg)[0]
    rng = np.random.RandomState(1)
    vol = jnp.asarray(rng.randn(1, 16, 24, 24, 2).astype(np.float32))

    kw = dict(patch_batch=4, mode="fp", hard_pred=True, multilabel=True)
    got = make_jitted_volume_inferencer(graph, serve_grid="column",
                                        stride_div=div, **kw)(
        variables, vol, (16, 16, 16), (4, 4, 4))
    want = make_jitted_volume_inferencer(graph, **kw)(
        variables, vol, (16, 16, 16), (4, 4, 4))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_column_mode_validation(tiny):
    _, graph, _ = tiny
    with pytest.raises(ValueError, match="stride_div"):
        make_jitted_volume_inferencer(graph, serve_grid="column")
    with pytest.raises(ValueError, match="serve_grid"):
        make_jitted_volume_inferencer(graph, serve_grid="volume")


def test_validate_seg_rejects_column_with_mesh_or_artifact():
    from efficientq_tpu.eval.validate import validate_seg

    with pytest.raises(ValueError, match="column"):
        validate_seg(None, None, [], None, 1, 3, patch_size=16, overlap=4,
                     serve_grid="column", stride_div=8, mesh=object())


def test_validate_and_inference_reject_column_without_stride_div():
    """Library callers that pass serve_grid='column' but forget stride_div
    get a named ValueError up front, not a TypeError from inside
    column_grid_plan's ceil-division on the auto-batch path (advisor r3)."""
    from efficientq_tpu.eval.validate import inference, validate_seg

    with pytest.raises(ValueError, match="stride_div"):
        validate_seg(None, None, [], None, 1, 3, patch_size=16, overlap=4,
                     serve_grid="column")
    with pytest.raises(ValueError, match="stride_div"):
        inference(None, None, [], None, save_dir="/tmp/x",
                  patch_size=16, overlap=4, serve_grid="column")


def test_column_artifact_end_to_end(tiny, tmp_path):
    """Column-mode serving artifact (r4): export the patch forward at the
    column patch size with the column plan in the manifest; the loaded
    artifact's volume_inferencer pads/crops D itself and must match live
    column serving exactly.  Deeper-than-pinned volumes are rejected."""
    from efficientq_tpu import export as export_mod

    cfg, graph, variables = tiny
    div = min_input_divisor(cfg)[0]
    rng = np.random.RandomState(1)
    vol = jnp.asarray(rng.randn(1, 18, 24, 24, 2).astype(np.float32))

    # column plan for a pinned export depth of 20 (volume D=18 pads up)
    col_d, cpatch, cov = column_grid_plan((20, 24, 24), (16, 16, 16),
                                          (4, 4, 4), div)
    exported, batch = export_mod.export_patch_model(
        graph, variables, cpatch, 2, mode="fp", patch_batch=3)
    path = str(tmp_path / "col_artifact.zip")
    export_mod.save_serving_artifact(path, exported, {
        "task": "lits", "patch_size": list(cpatch), "overlap": list(cov),
        "serve_grid": "column", "column_depth": int(col_d),
        "n_mod": 2, "n_class": 3, "batch": batch, "deploy": "none",
        "serve_dtype": "f32"})

    art = export_mod.load_serving_artifact(path)
    assert art.manifest["serve_grid"] == "column"
    infer_art = art.volume_inferencer(hard_pred=True, multilabel=False)
    # caller-side patch/overlap are ignored for column artifacts
    got = infer_art(None, vol, (16, 16, 16), (4, 4, 4))

    live = make_jitted_volume_inferencer(
        graph, patch_batch=3, mode="fp", serve_grid="column",
        stride_div=div, heads=slice(-1, None), hard_pred=True)
    want = live(variables, vol, (16, 16, 16), (4, 4, 4))
    # same grid family; the artifact pins D=20 vs live pad-to-stride —
    # both cover the full depth, so hard predictions agree everywhere
    assert got.shape == want.shape
    assert (np.asarray(got) == np.asarray(want)).mean() > 0.999

    deep = jnp.asarray(rng.randn(1, 24, 24, 24, 2).astype(np.float32))
    with pytest.raises(ValueError, match="column depth"):
        infer_art(None, deep, (16, 16, 16), (4, 4, 4))


def test_validate_seg_column_artifact_manifest_gate():
    """--serve_grid column + a PATCH-grid artifact is a manifest mismatch;
    a column artifact passes the gate."""
    from efficientq_tpu.eval.validate import validate_seg

    class FakeArt:
        manifest = {"serve_grid": "patch"}

    with pytest.raises(ValueError, match="re-export"):
        validate_seg(None, None, [], None, 1, 3, patch_size=16, overlap=4,
                     serve_grid="column", artifact=FakeArt())
    # column artifact: no exception from the gate (empty loader, no work)
    FakeArt.manifest = {"serve_grid": "column", "column_depth": 20}
    validate_seg(None, None, [], None, 1, 3, patch_size=16, overlap=4,
                 serve_grid="column", artifact=FakeArt())
