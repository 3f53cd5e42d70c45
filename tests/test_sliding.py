"""Sliding-window inference: grid semantics + stitch correctness."""
import jax
import jax.numpy as jnp
import numpy as np

from efficientq_tpu.eval.sliding import (grid_starts, patch_grid,
                                         sliding_window_inference)


def test_grid_starts_matches_reference_rule():
    # l[0 : d-p : p-o] + [d-p] (utils/transforms.py:795-797)
    assert grid_starts(240, 128, 16) == [0, 112]
    assert grid_starts(155, 128, 16) == [0, 27]
    assert grid_starts(128, 128, 16) == [0]
    assert grid_starts(130, 64, 16) == [0, 48, 66]


def test_stitch_identity_model():
    """With the identity model, overlap-averaged stitching must reconstruct
    the input exactly."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 20, 18, 16, 3).astype(np.float32))

    def model_fn(xb):  # (B, pd, ph, pw, C) -> (1, B, ...)
        return xb[None]

    out = sliding_window_inference(model_fn, x, (8, 8, 8), (4, 4, 4),
                                   patch_batch=3)
    assert out.shape == (1, 1, 20, 18, 16, 3)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(x), atol=1e-5)


def test_stitch_counts_overlaps_like_reference():
    """Constant-one model: average of ones is one everywhere regardless of
    visit counts (including duplicated terminal patches)."""
    x = jnp.zeros((1, 17, 9, 9, 1))

    def model_fn(xb):
        return jnp.ones((2,) + xb.shape[:-1] + (4,))

    out = sliding_window_inference(model_fn, x, (8, 8, 8), (4, 4, 4),
                                   patch_batch=2)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)


def test_stitch_batched_subjects():
    """N=2 subjects stitched independently through the flattened patch
    batch (the test_batch_size>1 eval path)."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 12, 10, 10, 2).astype(np.float32))

    def model_fn(xb):
        return xb[None]

    out = sliding_window_inference(model_fn, x, (8, 8, 8), (4, 4, 4),
                                   patch_batch=3)
    assert out.shape == (1, 2, 12, 10, 10, 2)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(x), atol=1e-5)


def test_patch_grid_covers_volume():
    starts = patch_grid((30, 20, 10), (8, 8, 8), (2, 2, 2))
    cover = np.zeros((30, 20, 10), bool)
    for i, j, k in starts:
        cover[i:i + 8, j:j + 8, k:k + 8] = True
    assert cover.all()


def test_jitted_inference_under_jit():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 12, 12, 12, 2).astype(np.float32))

    def model_fn(xb):
        return (2.0 * xb)[None]

    f = jax.jit(lambda im: sliding_window_inference(model_fn, im, (8, 8, 8),
                                                    (4, 4, 4), 4))
    out = f(x)
    np.testing.assert_allclose(np.asarray(out[0]), 2 * np.asarray(x), atol=1e-5)


def test_choose_patch_batch_cpu_default_and_cache(tmp_path, monkeypatch):
    """Off-TPU the autotuner returns the safe default without measuring;
    the disk cache round-trips."""
    import efficientq_tpu.eval.autotune as at
    from efficientq_tpu import nnir
    from efficientq_tpu.models import UResQConfig, build_uresq

    monkeypatch.setattr(at, "_DISK_CACHE", str(tmp_path / "tune.json"))
    cfg = UResQConfig(num_mod=1, num_classes=3, depth_config=[1, 1, 1],
                      width_config=[4, 8, 4], dilation_config=[1, 1, 1],
                      init_stride=(2, 2, 2), drop_rate=0.0, blk_type="mid",
                      ds=None)
    graph = build_uresq(cfg)
    variables = nnir.init(graph, jax.random.PRNGKey(0))
    x = jnp.zeros((1, 16, 16, 16, 1), jnp.float32)
    pb = at.choose_patch_batch(graph, variables, x, (8, 8, 8), (2, 2, 2),
                               default=3)
    assert pb == 3  # CPU backend: no sweep, default returned
    # --tune_serving off: deterministic min(full grid, 8), ANY backend,
    # no measurement and no cache involvement
    pb_off = at.choose_patch_batch(graph, variables, x, (8, 8, 8),
                                   (2, 2, 2), default=3, tune="off")
    assert pb_off == 8  # 27-patch grid capped at 8
    small = jnp.zeros((1, 8, 8, 14, 1), jnp.float32)
    assert at.choose_patch_batch(graph, variables, small, (8, 8, 8),
                                 (2, 2, 2), tune="off") == 2  # full grid
    # cache write/read path (exercise _save_disk/_load_disk directly)
    at._save_disk({"k": 7})
    assert at._load_disk() == {"k": 7}


def test_heads_slice_matches_full_stitch():
    """heads=slice(-1, None) must reproduce the final head of the full
    multi-head stitch exactly (serving fast path, aux heads DCE'd)."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 12, 12, 12, 2).astype(np.float32))

    def model_fn(xb):
        # two fake heads with distinct values
        return jnp.stack([0.5 * xb, 2.0 * xb])

    full = sliding_window_inference(model_fn, x, (8, 8, 8), (4, 4, 4), 4)
    last = sliding_window_inference(model_fn, x, (8, 8, 8), (4, 4, 4), 4,
                                    heads=slice(-1, None))
    assert last.shape[0] == 1 and full.shape[0] == 2
    np.testing.assert_array_equal(np.asarray(full[-1:]), np.asarray(last))
