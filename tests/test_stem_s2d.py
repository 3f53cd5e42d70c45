"""Space-to-depth stem fast path (pallas/stem.py + deploy.s2d_stem_serving).

The s2d stem must be numerically equivalent to the direct stride-2 conv
path at the same compute dtype: the kernel's bf16 dots accumulate f32 like
the XLA conv, so per-layer outputs agree to bf16 reduction-order noise and
hard predictions match.  Kernel-level checks are exact (same bf16 inputs).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from efficientq_tpu import nnir, ops
from efficientq_tpu.eval.sliding import (extract_patches, patch_grid,
                                         sliding_window_inference)
from efficientq_tpu.models import build_uresq
from efficientq_tpu.models.uresq import UResQConfig
from efficientq_tpu.pallas.stem import (extract_s2d_patches, s2d_stem_weights,
                                        s2d_supported, s2d_volume,
                                        stem_s2d_conv)
from efficientq_tpu.ptq import fold_bn
from efficientq_tpu.ptq.attention import pred_brats_con_merge
from efficientq_tpu.ptq.deploy import (channels_first_tail, s2d_stem_serving,
                                       to_int8_inference)
from efficientq_tpu.quant import fake_quant_weight

ATTRS = dict(kernel_size=(3, 3, 3), stride=(2, 2, 2), padding=(1, 1, 1),
             dilation=(1, 1, 1), groups=1)


@pytest.mark.parametrize("depth", [22, 23])  # even-only and odd z starts
def test_stem_kernel_matches_direct_conv(depth):
    rng = np.random.RandomState(depth)
    C, O = 4, 8
    vol_shape = (depth, 32, 32)
    patch = (16, 16, 16)
    w3 = rng.randn(3, 3, 3, C, O).astype(np.float32) * 0.1
    bias = rng.randn(O).astype(np.float32) * 0.1
    vol = rng.randn(1, *vol_shape, C).astype(np.float32)
    starts = patch_grid(vol_shape, patch, (4, 4, 4))
    assert s2d_supported(starts, patch, vol_shape, ATTRS)

    # oracle: per-patch direct conv at bf16 operands / f32 accumulation
    patches = extract_patches(jnp.asarray(vol), starts, patch)
    xb = patches.reshape(-1, *patch, C).astype(jnp.bfloat16)
    y_ref = ops.conv3d(xb, jnp.asarray(w3, jnp.bfloat16), None, (2, 2, 2),
                       (1, 1, 1), (1, 1, 1), 1,
                       preferred_element_type=jnp.float32) + bias
    y_ref = jnp.maximum(y_ref, 0.0)
    alpha, qlvl = 0.7, 4
    q_ref = jnp.round(jnp.clip(y_ref / alpha, 0, 1)
                      * (qlvl - 1)).astype(jnp.int8)

    sp, par = extract_s2d_patches(jnp.asarray(vol), starts, patch)
    we, wo = s2d_stem_weights(w3)
    y, q = stem_s2d_conv(sp, par, jnp.asarray(we, jnp.bfloat16),
                         jnp.asarray(wo, jnp.bfloat16), jnp.asarray(bias),
                         alpha, qlvl, interpret=True, out_dtype=jnp.float32)
    if depth % 2 == 1:
        assert int(jnp.sum(par)) > 0  # the odd-parity path is exercised
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)
    assert int(jnp.sum(q != q_ref)) == 0

    # ring variant (_stem_ring_kernel): every plane read once, both kd2
    # taps in one packed dot — must be BIT-identical to the z-tiled kernel
    yr, qr = stem_s2d_conv(sp, par, jnp.asarray(we, jnp.bfloat16),
                           jnp.asarray(wo, jnp.bfloat16),
                           jnp.asarray(bias), alpha, qlvl, interpret=True,
                           out_dtype=jnp.float32, ring="force")
    np.testing.assert_array_equal(np.asarray(yr), np.asarray(y))
    np.testing.assert_array_equal(np.asarray(qr), np.asarray(q))


def test_s2d_volume_roundtrip():
    rng = np.random.RandomState(0)
    vol = rng.randn(1, 5, 8, 8, 2).astype(np.float32)
    s = np.asarray(s2d_volume(jnp.asarray(vol), dtype=jnp.float32))
    assert s.shape == (1, 3, 4, 4, 16)
    # channel layout: ((pz*2+py)*2+px)*C + c
    for pz in range(2):
        for py in range(2):
            for px in range(2):
                for c in range(2):
                    ch = ((pz * 2 + py) * 2 + px) * 2 + c
                    got = s[0, :, :, :, ch]
                    want = np.pad(vol[0, :, :, :, c],
                                  ((0, 1), (0, 0), (0, 0)))[pz::2, py::2, px::2]
                    np.testing.assert_array_equal(got, want)


@pytest.fixture(scope="module")
def serving_graphs():
    cfg = UResQConfig(num_mod=4, num_classes=3, depth_config=[1, 1, 1],
                      width_config=[8, 16, 8], dilation_config=[1, 1, 1],
                      init_stride=(2, 2, 2), drop_rate=0.0, blk_type="mid",
                      ds="simple", quantize=True, qlvl_w=4, qlvl_act=4,
                      q_first=(256, -1), q_last=(256, -1))
    graph = build_uresq(cfg)
    variables = nnir.init(graph, jax.random.PRNGKey(0))
    fgraph, fvars = fold_bn(graph, variables)
    for node in fgraph.qconv_nodes():
        qcfg = node.attrs["qcfg"]
        p = fvars["params"][node.name]
        if qcfg.q_weight:
            alpha = jnp.maximum(jnp.max(jnp.abs(p["kernel"])), 1e-8)
            p["kernel"] = fake_quant_weight(p["kernel"], alpha, qcfg.qlvl_w)
            p["alpha_w"] = alpha
        if qcfg.q_act:
            p["alpha_act"] = jnp.float32(1.0)
    ig, iv = to_int8_inference(fgraph, fvars, pallas=True)
    cg = channels_first_tail(ig)
    sg, sv, stem = s2d_stem_serving(cg, iv)
    assert stem is not None and stem.op == "stem_s2d"
    return cg, iv, sg, sv, stem


def test_s2d_serving_end_to_end(serving_graphs):
    cg, iv, sg, sv, stem = serving_graphs
    vol_shape = (39, 48, 48)  # odd z start in the grid
    patch, overlap = (32, 32, 32), (8, 8, 8)
    starts = patch_grid(vol_shape, patch, overlap)
    assert s2d_supported(starts, patch, vol_shape, stem.attrs)
    vol = np.random.RandomState(0).randn(1, *vol_shape, 4).astype(np.float32)
    vj = jnp.asarray(vol)

    def run(g, v, extract_fn=None):
        def model_fn(xb):
            return nnir.apply(g, v, xb, mode="quantized",
                              compute_dtype=jnp.bfloat16)

        return sliding_window_inference(
            model_fn, vj, patch, overlap, patch_batch=8, channels_first=True,
            normalize=False, extract_fn=extract_fn)

    base = run(cg, iv)
    s2d = run(sg, sv, extract_fn=extract_s2d_patches)
    # stem bf16 reduction order differs from the XLA conv; downstream 2-bit
    # codes absorb it except for rare quantizer-tie flips
    np.testing.assert_allclose(np.asarray(s2d), np.asarray(base), atol=0.05)
    p1 = pred_brats_con_merge(base[-1], axis=1)
    p2 = pred_brats_con_merge(s2d[-1], axis=1)
    assert float(jnp.mean((p1 != p2).astype(jnp.float32))) < 1e-3


def test_s2d_rewrite_skips_non_matching_graphs(serving_graphs):
    cg, iv, *_ = serving_graphs
    # a bf16 graph (no int8 consumer) must be left unchanged
    cfg = UResQConfig(num_mod=1, num_classes=2, depth_config=[1, 1, 1],
                      width_config=[4, 8, 4], dilation_config=[1, 1, 1],
                      init_stride=(1, 1, 1), drop_rate=0.0, blk_type="mid",
                      ds=None, quantize=True, qlvl_w=4, qlvl_act=4,
                      q_first=(256, -1), q_last=(256, -1))
    g = build_uresq(cfg)
    v = nnir.init(g, jax.random.PRNGKey(0))
    fg, fv = fold_bn(g, v)
    g2, v2, stem = s2d_stem_serving(fg, fv)  # stride-1 stem: unsupported
    assert stem is None and g2 is fg


def test_host_s2d_matches_device_transform():
    """data/native.py::s2d_bf16 (C++ and the NumPy fallback) is
    bit-identical to the device-side s2d_volume + bf16 cast (RTNE)."""
    import efficientq_tpu.data.native as nat

    rng = np.random.RandomState(3)
    for shape, minp in (((1, 5, 8, 8, 2), 0), ((2, 6, 8, 8, 4), 0),
                        ((1, 7, 16, 16, 1), 5)):
        vol = (rng.randn(*shape) * 10).astype(np.float32)
        want = np.asarray(
            s2d_volume(jnp.asarray(vol), min_planes=minp,
                       dtype=jnp.bfloat16)).view(np.uint16)
        got = nat.s2d_bf16(vol, min_planes=minp)
        assert got.shape == want.shape
        np.testing.assert_array_equal(got.view(np.uint16), want)
        if nat.available():
            # force the NumPy fallback too (non-f32 dtype routes around C++)
            got_np = nat.s2d_bf16(vol.astype(np.float64), min_planes=minp)
            np.testing.assert_array_equal(got_np.view(np.uint16), want)


def test_pre_s2d_extract_matches_in_graph_s2d(serving_graphs):
    """Serving from a HOST-transformed s2d volume (extract_pre_s2d_patches
    + the vol_shape override) is bit-identical to the in-graph s2d path —
    the device-side pad/reshape/transpose never runs."""
    import efficientq_tpu.data.native as nat
    from efficientq_tpu.pallas.stem import (extract_pre_s2d_patches,
                                            s2d_need_planes)

    _, _, sg, sv, stem = serving_graphs
    vol_shape = (39, 48, 48)
    patch, overlap = (32, 32, 32), (8, 8, 8)
    starts = patch_grid(vol_shape, patch, overlap)
    vol = np.random.RandomState(1).randn(1, *vol_shape, 4).astype(np.float32)

    def model_fn(xb):
        return nnir.apply(sg, sv, xb, mode="quantized",
                          compute_dtype=jnp.bfloat16)

    base = sliding_window_inference(
        model_fn, jnp.asarray(vol), patch, overlap, patch_batch=8,
        channels_first=True, normalize=False,
        extract_fn=extract_s2d_patches)

    svol = jnp.asarray(nat.s2d_bf16(vol, s2d_need_planes(starts, patch)))
    got = sliding_window_inference(
        model_fn, svol, patch, overlap, patch_batch=8,
        channels_first=True, normalize=False,
        extract_fn=extract_pre_s2d_patches, vol_shape=vol_shape)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(base))


def test_host_prestack_matches_device_extract():
    """data/native.py::s2d_patches_bf16 (fused s2d + patch extraction, C++
    and NumPy fallback) is bit-identical to extract_s2d_patches, and the
    prestacked serving path (prestacked_s2d_extract) is bit-identical to
    the device-extract path — zero device-side extraction work."""
    import efficientq_tpu.data.native as nat
    from efficientq_tpu.pallas.stem import prestacked_s2d_extract

    vol_shape = (39, 48, 48)
    patch, overlap = (32, 32, 32), (8, 8, 8)
    starts = patch_grid(vol_shape, patch, overlap)
    vol = np.random.RandomState(7).randn(1, *vol_shape, 4).astype(np.float32)

    want, want_par = extract_s2d_patches(jnp.asarray(vol), starts, patch)
    got = nat.s2d_patches_bf16(vol, starts, patch)
    np.testing.assert_array_equal(
        np.asarray(got).view(np.uint16), np.asarray(want).view(np.uint16))
    if nat.available():  # NumPy fallback leg (f64 input routes around C++)
        got_np = nat.s2d_patches_bf16(vol.astype(np.float64), starts, patch)
        np.testing.assert_array_equal(np.asarray(got_np).view(np.uint16),
                                      np.asarray(want).view(np.uint16))
    # the extract_fn wrapper: identity on the stack + derived parities
    stack, par = prestacked_s2d_extract(jnp.asarray(got), starts, patch)
    assert stack is not None and stack.shape == want.shape
    np.testing.assert_array_equal(np.asarray(par), np.asarray(want_par))


def test_prestacked_serving_end_to_end(serving_graphs):
    import efficientq_tpu.data.native as nat
    from efficientq_tpu.pallas.stem import prestacked_s2d_extract

    _, _, sg, sv, stem = serving_graphs
    vol_shape = (39, 48, 48)
    patch, overlap = (32, 32, 32), (8, 8, 8)
    starts = patch_grid(vol_shape, patch, overlap)
    vol = np.random.RandomState(1).randn(1, *vol_shape, 4).astype(np.float32)

    def model_fn(xb):
        return nnir.apply(sg, sv, xb, mode="quantized",
                          compute_dtype=jnp.bfloat16)

    base = sliding_window_inference(
        model_fn, jnp.asarray(vol), patch, overlap, patch_batch=8,
        channels_first=True, normalize=False,
        extract_fn=extract_s2d_patches)
    stack = jnp.asarray(nat.s2d_patches_bf16(vol, starts, patch))
    got = sliding_window_inference(
        model_fn, stack, patch, overlap, patch_batch=8,
        channels_first=True, normalize=False,
        extract_fn=prestacked_s2d_extract, vol_shape=vol_shape)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(base))


def test_make_s2d_volume_inferencer_product_path():
    """--serve_stem s2d product inferencer (ptq/deploy.py): host transform
    + fused stem, same output contract as make_jitted_volume_inferencer;
    hard predictions match the direct path; unsupported volume geometries
    fall back to the direct path exactly."""
    from efficientq_tpu.eval.sliding import make_jitted_volume_inferencer
    from efficientq_tpu.ptq.deploy import make_s2d_volume_inferencer

    cfg = UResQConfig(num_mod=4, num_classes=3, depth_config=[1, 1, 1],
                      width_config=[8, 16, 8], dilation_config=[1, 1, 1],
                      init_stride=(2, 2, 2), drop_rate=0.0, blk_type="mid",
                      ds="simple", quantize=True, qlvl_w=4, qlvl_act=4,
                      q_first=(256, -1), q_last=(256, -1))
    graph = build_uresq(cfg)
    variables = nnir.init(graph, jax.random.PRNGKey(0))
    fg, fv = fold_bn(graph, variables)
    for node in fg.qconv_nodes():
        qcfg = node.attrs["qcfg"]
        p = fv["params"][node.name]
        if qcfg.q_weight:
            alpha = jnp.maximum(jnp.max(jnp.abs(p["kernel"])), 1e-8)
            p["kernel"] = fake_quant_weight(p["kernel"], alpha, qcfg.qlvl_w)
            p["alpha_w"] = alpha
        if qcfg.q_act:
            p["alpha_act"] = jnp.float32(1.0)
    ig, iv = to_int8_inference(fg, fv, pallas=True)

    infer_s2d = make_s2d_volume_inferencer(ig, iv, multilabel=True)
    assert infer_s2d is not None
    infer_direct = make_jitted_volume_inferencer(
        ig, patch_batch=8, mode="quantized", hard_pred=True,
        multilabel=True, compute_dtype=jnp.bfloat16)

    vol = np.random.RandomState(0).randn(1, 39, 48, 48, 4).astype(np.float32)
    got = np.asarray(infer_s2d(None, np.moveaxis(
        np.moveaxis(vol, -1, 1), 1, -1), (32, 32, 32), (8, 8, 8)))
    want = np.asarray(infer_direct(iv, jnp.asarray(vol), (32, 32, 32),
                                   (8, 8, 8)))
    assert got.shape == want.shape
    assert (got == want).mean() > 0.999  # bf16 reduction-order level

    # unsupported geometry (odd H start in the grid): per-volume fallback
    vol_odd = np.random.RandomState(1).randn(1, 39, 47, 48, 4)
    vol_odd = vol_odd.astype(np.float32)
    # H=47 is odd -> s2d_supported False; must still serve (direct path)
    got_f = np.asarray(infer_s2d(None, vol_odd, (32, 32, 32), (8, 8, 8)))
    want_f = np.asarray(infer_direct(iv, jnp.asarray(vol_odd), (32, 32, 32),
                                     (8, 8, 8)))
    np.testing.assert_array_equal(got_f, want_f)

    # final-head-only serving engages the channels-first tail internally
    # (the bench graph's layout, now productized); same output contract,
    # same hard predictions as the direct final-head path
    infer_cf = make_s2d_volume_inferencer(ig, iv, multilabel=True,
                                          heads=slice(-1, None))
    got_cf = np.asarray(infer_cf(None, np.moveaxis(
        np.moveaxis(vol, -1, 1), 1, -1), (32, 32, 32), (8, 8, 8)))
    direct_fh = make_jitted_volume_inferencer(
        ig, patch_batch=8, mode="quantized", hard_pred=True,
        multilabel=True, compute_dtype=jnp.bfloat16, heads=slice(-1, None))
    want_cf = np.asarray(direct_fh(iv, jnp.asarray(vol), (32, 32, 32),
                                   (8, 8, 8)))
    assert got_cf.shape == want_cf.shape
    assert (got_cf == want_cf).mean() > 0.999

    # an FP graph has no eligible stem -> None (validate_seg falls back)
    assert make_s2d_volume_inferencer(fg, fv) is None


def test_cli_serve_stem_flag():
    from efficientq_tpu.cli.entrance import build_parser

    args = build_parser().parse_args(["infer", "--serve_stem", "s2d"])
    assert args.serve_stem == "s2d"
    assert build_parser().parse_args(["ptq"]).serve_stem == "direct"

    from efficientq_tpu.eval.validate import validate_seg
    import pytest

    with pytest.raises(ValueError, match="serve_stem"):
        validate_seg(None, None, [], None, 1, 3, patch_size=16, overlap=4,
                     serve_stem="s2d", serve_grid="column", stride_div=8)


def test_host_s2d_nonfinite_bit_identity():
    """NaN/inf survive the native RTNE conversion exactly like
    jnp.astype(bfloat16): the bare add-trick would carry NaN's mantissa
    into the exponent (NaN -> inf / -0) — review r4 finding."""
    import efficientq_tpu.data.native as nat

    rng = np.random.RandomState(0)
    vol = rng.randn(1, 10, 16, 16, 4).astype(np.float32)
    vol[0, 1, 2, 3, 1] = np.nan
    vol[0, 0, 0, 0, 0] = np.inf
    vol[0, 5, 5, 5, 2] = -np.inf
    vol[0, 7, 1, 1, 3] = -np.nan
    want = np.asarray(s2d_volume(jnp.asarray(vol), min_planes=6,
                                 dtype=jnp.bfloat16)).view(np.uint16)
    got = nat.s2d_bf16(vol, 6)
    np.testing.assert_array_equal(got.view(np.uint16), want)
    starts = patch_grid((10, 16, 16), (8, 8, 8), (2, 2, 2))
    wantp = np.asarray(extract_s2d_patches(
        jnp.asarray(vol), starts, (8, 8, 8))[0]).view(np.uint16)
    gotp = nat.s2d_patches_bf16(vol, starts, (8, 8, 8))
    np.testing.assert_array_equal(gotp.view(np.uint16), wantp)
