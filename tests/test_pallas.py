"""Pallas kernels in interpreter mode vs the XLA reference path."""
import jax
import jax.numpy as jnp
import numpy as np

from efficientq_tpu import ops
from efficientq_tpu.pallas import fused_qact_matmul, qconv1x1_ndhwc
from efficientq_tpu.quant import fake_quant_act


def test_fused_qact_matmul_matches_reference():
    rng = np.random.RandomState(0)
    x = jnp.asarray(np.abs(rng.randn(100, 24)).astype(np.float32))
    w = jnp.asarray(rng.randn(24, 40).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(40).astype(np.float32))
    alpha = 1.3
    ref = fake_quant_act(x, alpha, 4) @ w + b
    got = fused_qact_matmul(x, w, b, alpha, 4, tile_m=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4,
                               rtol=1e-4)


def test_qconv1x1_matches_conv3d():
    rng = np.random.RandomState(1)
    x = jnp.asarray(np.abs(rng.randn(2, 4, 5, 6, 8)).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 1, 1, 8, 16).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.randn(16).astype(np.float32))
    alpha = 0.9
    # exact oracle: explicit matmul over the channel axis
    ref = jnp.einsum("ndhwc,co->ndhwo", fake_quant_act(x, alpha, 16),
                     k[0, 0, 0], precision=jax.lax.Precision.HIGHEST) + b
    got = qconv1x1_ndhwc(x, k, b, alpha, 16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4,
                               rtol=1e-4)
    # XLA's CPU conv is itself only ~1e-2-close to the exact result, so only
    # sanity-bound against it
    conv = ops.conv3d(fake_quant_act(x, alpha, 16), k, b,
                      precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(got), np.asarray(conv), atol=2e-2,
                               rtol=2e-2)


def test_fused_int8_matmul_matches_deploy_semantics():
    """Pallas int8 kernel == the deploy-path math (exact integer conv)."""
    from efficientq_tpu.pallas import fused_int8_matmul

    rng = np.random.RandomState(3)
    M, K, N = 70, 12, 20
    na, nw = 4, 4
    x = jnp.asarray(np.abs(rng.randn(M, K)).astype(np.float32))
    alpha_a, alpha_w = 1.1, 0.3
    codes = rng.randint(-(nw - 1), nw, (K, N))
    codes = codes - (codes % 2 == 0)          # odd symmetric codes
    codes = np.clip(codes, -(nw - 1), nw - 1).astype(np.int8)
    b = jnp.asarray(rng.randn(N).astype(np.float32))
    scale = alpha_a * alpha_w / ((na - 1) * (nw - 1))

    qa = np.round(np.clip(np.asarray(x) / alpha_a, 0, 1) * (na - 1))
    ref = (qa @ codes.astype(np.int64)) * scale + np.asarray(b)

    got = fused_int8_matmul(x, jnp.asarray(codes), b, alpha_a, scale, na,
                            tile_m=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5, rtol=1e-5)


def _tiny_q_model():
    """A tiny quantized graph with 1x1x1 qconvs, post-PTQ-style params."""
    import jax

    from efficientq_tpu import nnir
    from efficientq_tpu.models import UResQConfig, build_uresq
    from efficientq_tpu.ptq import fold_bn
    from efficientq_tpu.quant import fake_quant_weight

    cfg = UResQConfig(num_mod=2, num_classes=3, depth_config=[1, 1, 1],
                      width_config=[4, 8, 4], dilation_config=[1, 1, 1],
                      init_stride=(2, 2, 2), drop_rate=0.0, blk_type="mid",
                      ds="simple", ds_depth_limit=3, fuse_bn=True,
                      quantize=True, qlvl_w=4, qlvl_act=4,
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
            p["alpha_act"] = jnp.float32(0.8)
    return fg, fv


def test_to_pallas_inference_product_path_parity():
    """The in-product dispatch (nnir._eval_conv via to_pallas_inference)
    matches the plain XLA quantized forward — fake-quant and int8 variants."""
    from efficientq_tpu import nnir
    from efficientq_tpu.pallas.qmatmul import to_pallas_inference
    from efficientq_tpu.ptq.deploy import to_int8_inference

    fg, fv = _tiny_q_model()
    pg = to_pallas_inference(fg, include_1x1=True)
    flagged = [n.name for n in pg.nodes if n.attrs.get("pallas")]
    # with include_1x1, the transition/projection 1x1x1 convs are flagged
    assert any("TransDown" in n for n in flagged), flagged

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 8, 8, 8, 2).astype(np.float32))
    ref = nnir.apply(fg, fv, x, mode="quantized",
                     precision=jax.lax.Precision.HIGHEST)
    got = nnir.apply(pg, fv, x, mode="quantized",
                     precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4,
                               rtol=2e-4)

    # int8 deployment composes the pallas flags (default on TPU backends;
    # explicit here since tests run on CPU): the 3x3x3 int8 convs are
    # flagged, the skinny 1x1x1s stay on XLA's int8 dot
    ig, iv = to_int8_inference(fg, fv, pallas=True)
    pig = to_pallas_inference(ig, include_1x1=True)
    assert any(n.attrs.get("pallas") and n.attrs.get("int8")
               and n.attrs["kernel_size"] == (3, 3, 3) for n in ig.nodes)
    assert not any(n.attrs.get("pallas")
                   and n.attrs["kernel_size"] == (1, 1, 1) for n in ig.nodes)
    ref8 = nnir.apply(ig, iv, x, mode="quantized",
                      precision=jax.lax.Precision.HIGHEST)
    got8 = nnir.apply(pig, iv, x, mode="quantized",
                      precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(got8), np.asarray(ref8), atol=2e-4,
                               rtol=2e-4)


def test_qconv3x3_int8_matches_xla_int_conv():
    """Pallas 3^3 im2col-matmul kernel == XLA integer conv, incl. dilation."""
    from efficientq_tpu.pallas.qconv3d import qconv3x3_int8_ndhwc

    rng = np.random.RandomState(0)
    for dil, d in ((1, 5), (2, 5), (1, 8), (2, 8)):  # d=8 exercises z-tiling
        n, h, w, c, o = 2, 6, 7, 5, 9
        x = jnp.asarray(np.abs(rng.randn(n, d, h, w, c)).astype(np.float32))
        codes = jnp.asarray(
            rng.randint(-3, 4, size=(3, 3, 3, c, o)).astype(np.int8))
        b = jnp.asarray(rng.randn(o).astype(np.float32))
        na, alpha, scale = 4, 0.9, 0.37
        qa = jnp.round(jnp.clip(x / alpha, 0, 1) * (na - 1)).astype(jnp.int8)
        ref = ops.conv3d(qa, codes, None, (1, 1, 1), (dil,) * 3, (dil,) * 3,
                         1, preferred_element_type=jnp.int32)
        ref = ref.astype(jnp.float32) * scale + b
        got = qconv3x3_int8_ndhwc(x, codes, b, alpha, scale, na, dilation=dil,
                                  interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)


def test_qconv3x3_epilogues_match_oracles():
    """Kernel-level residual / relu+act-quant epilogues vs explicit math."""
    from efficientq_tpu.pallas.qconv3d import qconv3x3_int8_ndhwc

    rng = np.random.RandomState(7)
    n, d, h, w, c, o = 1, 4, 6, 6, 5, 5
    x = jnp.asarray(np.abs(rng.randn(n, d, h, w, c)).astype(np.float32))
    codes = jnp.asarray(
        rng.randint(-3, 4, size=(3, 3, 3, c, o)).astype(np.int8))
    b = jnp.asarray(rng.randn(o).astype(np.float32))
    na, alpha, scale = 4, 0.9, 0.37
    base = qconv3x3_int8_ndhwc(x, codes, b, alpha, scale, na, interpret=True)

    # residual epilogue
    res = jnp.asarray(rng.randn(n, d, h, w, o).astype(np.float32))
    got = qconv3x3_int8_ndhwc(x, codes, b, alpha, scale, na, interpret=True,
                              residual=res)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base + res),
                               atol=1e-5, rtol=1e-5)

    # relu + next act-quant epilogue: int8 codes of the downstream conv
    a2, na2 = 1.7, 8
    ref = np.round(np.clip(np.asarray(base) / a2, 0, 1) * (na2 - 1))
    got = qconv3x3_int8_ndhwc(x, codes, b, alpha, scale, na, interpret=True,
                              quant_alpha=a2, quant_qlvl=na2)
    assert got.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(got), ref.astype(np.int8))

    # pre-quantized input: skip the XLA act-quant, same result
    qa = jnp.round(jnp.clip(x / alpha, 0, 1) * (na - 1)).astype(jnp.int8)
    got = qconv3x3_int8_ndhwc(qa, codes, b, alpha, scale, na, interpret=True,
                              x_quantized=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               atol=1e-5, rtol=1e-5)


def test_relu_elision_structure_and_parity():
    """fuse_int8_epilogues rewrite #3: a relu whose consumers are (a) an
    int8 conv's act-quant (clip-at-0 == relu) and (b) a fused residual
    stream gets elided — consumers read the pre-relu value, the residual
    conv gains ``residual_relu``, and the relu node goes dead.  Output must
    stay bit-exact vs the unfused int8 graph (f32 interpret mode)."""
    from efficientq_tpu import nnir
    from efficientq_tpu.ptq.deploy import to_int8_inference

    fg, fv = _tiny_q_model()
    ig, iv = to_int8_inference(fg, fv, pallas=True, fuse_epilogues=False)
    igf, ivf = to_int8_inference(fg, fv, pallas=True, fuse_epilogues=True)

    cons = {}
    for n in igf.nodes:
        for i in n.inputs:
            cons.setdefault(i, []).append(n.name)
    dead_relus = [n.name for n in igf.nodes
                  if n.op == "relu" and not cons.get(n.name)]
    nrr = sum(1 for n in igf.nodes if n.attrs.get("residual_relu"))
    assert dead_relus, "expected at least one elided ResBlock-entry relu"
    assert nrr >= 1, "expected a residual_relu-flagged fused conv"
    for n in igf.nodes:
        if n.attrs.get("residual_relu"):
            assert n.attrs.get("residual") and n.attrs.get("pallas")

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 8, 8, 8, 2).astype(np.float32))
    ref = nnir.apply(ig, iv, x, mode="quantized",
                     precision=jax.lax.Precision.HIGHEST)
    got = nnir.apply(igf, ivf, x, mode="quantized",
                     precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_epilogue_fusion_graph_parity():
    """fuse_int8_epilogues: structural rewrites + bit-exact whole-net
    output vs the unfused int8 deploy graph (f32, interpret mode)."""
    from efficientq_tpu import nnir
    from efficientq_tpu.ptq.deploy import to_int8_inference

    fg, fv = _tiny_q_model()
    ig, iv = to_int8_inference(fg, fv, pallas=True, fuse_epilogues=False)
    igf, ivf = to_int8_inference(fg, fv, pallas=True, fuse_epilogues=True)

    nquant = sum(1 for n in igf.nodes if n.attrs.get("epilogue_quant_for"))
    nres = sum(1 for n in igf.nodes if n.attrs.get("residual"))
    ninq = sum(1 for n in igf.nodes if n.attrs.get("input_quantized"))
    assert nquant >= 1 and nres >= 1 and ninq == nquant
    # every fused residual conv gained its operand as a second input
    for node in igf.nodes:
        if node.attrs.get("residual"):
            assert len(node.inputs) == 2

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 8, 8, 8, 2).astype(np.float32))
    ref = nnir.apply(ig, iv, x, mode="quantized",
                     precision=jax.lax.Precision.HIGHEST)
    got = nnir.apply(igf, ivf, x, mode="quantized",
                     precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_epilogue_fusion_dilated_graph_parity():
    """Dilated stages (the LiTS preset geometry) through the fused int8
    deploy graph == unfused, exactly."""
    from efficientq_tpu import nnir
    from efficientq_tpu.models import UResQConfig, build_uresq
    from efficientq_tpu.ptq import fold_bn
    from efficientq_tpu.ptq.deploy import to_int8_inference
    from efficientq_tpu.quant import fake_quant_weight

    cfg = UResQConfig(num_mod=1, num_classes=3, depth_config=[1, 1, 1],
                      width_config=[4, 8, 4], dilation_config=[1, 2, 1],
                      init_stride=(2, 2, 2), drop_rate=0.0, blk_type="mid",
                      ds=None, fuse_bn=True, quantize=True, qlvl_w=4,
                      qlvl_act=4, q_first=(256, -1), q_last=(256, -1))
    graph = build_uresq(cfg)
    variables = nnir.init(graph, jax.random.PRNGKey(1))
    fg, fv = fold_bn(graph, variables)
    for node in fg.qconv_nodes():
        q = node.attrs["qcfg"]
        p = fv["params"][node.name]
        if q.q_weight:
            a = jnp.maximum(jnp.max(jnp.abs(p["kernel"])), 1e-8)
            p["kernel"] = fake_quant_weight(p["kernel"], a, q.qlvl_w)
            p["alpha_w"] = a
        if q.q_act:
            p["alpha_act"] = jnp.float32(0.8)

    ig, iv = to_int8_inference(fg, fv, pallas=True, fuse_epilogues=False)
    igf, ivf = to_int8_inference(fg, fv, pallas=True, fuse_epilogues=True)
    assert any(n.attrs.get("pallas") and n.attrs["dilation"] == (2, 2, 2)
               for n in igf.nodes)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 16, 16, 16, 1).astype(np.float32))
    ref = nnir.apply(ig, iv, x, mode="quantized",
                     precision=jax.lax.Precision.HIGHEST)
    got = nnir.apply(igf, ivf, x, mode="quantized",
                     precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_qconv3x3_pool_epilogue_matches_oracle():
    """pool=True dual output: (y, maxpool2(y)) — bit-exact vs the separate
    reduce_window, on both the in-kernel path (even tz: 32x32 planes,
    d % tz == 0) and the fallback (tiny planes -> tz=1 -> XLA pool)."""
    from efficientq_tpu.pallas.qconv3d import _xla_maxpool2, qconv3x3_int8_ndhwc

    rng = np.random.RandomState(7)
    for n, d, h, w, c, o in ((1, 4, 32, 32, 4, 6),   # in-kernel, tz=4
                             (1, 4, 8, 8, 4, 6),     # tz=1: cross-program
                             (1, 5, 8, 8, 4, 6)):    # odd d: XLA fallback
        x = jnp.asarray(np.abs(rng.randn(n, d, h, w, c)).astype(np.float32))
        codes = jnp.asarray(
            rng.randint(-3, 4, size=(3, 3, 3, c, o)).astype(np.int8))
        b = jnp.asarray(rng.randn(o).astype(np.float32))
        res = jnp.asarray(rng.randn(n, d, h, w, o).astype(np.float32))
        na, alpha, scale = 4, 0.9, 0.37
        for residual in (None, res):
            for dt in (jnp.float32, jnp.bfloat16):  # bf16 = serving dtype
                r = (residual.astype(dt) if residual is not None
                     and dt == jnp.bfloat16 else residual)
                y_ref = qconv3x3_int8_ndhwc(x, codes, b, alpha, scale, na,
                                            interpret=True, residual=r,
                                            out_dtype=dt)
                y, yp = qconv3x3_int8_ndhwc(x, codes, b, alpha, scale, na,
                                            interpret=True, residual=r,
                                            pool=True, out_dtype=dt)
                np.testing.assert_array_equal(np.asarray(y),
                                              np.asarray(y_ref))
                np.testing.assert_array_equal(
                    np.asarray(yp), np.asarray(_xla_maxpool2(y_ref)))


def test_pool_epilogue_graph_rewrite_and_parity():
    """_fuse_pools: the TransDown maxpool becomes tuple_get(1) of the
    stage's exit conv; whole-net output bit-exact vs the unfused deploy."""
    from efficientq_tpu import nnir
    from efficientq_tpu.ptq.deploy import to_int8_inference

    fg, fv = _tiny_q_model()
    ig, iv = to_int8_inference(fg, fv, pallas=True, fuse_epilogues=False)
    igf, ivf = to_int8_inference(fg, fv, pallas=True, fuse_epilogues=True)
    pooled = [n for n in igf.nodes if n.attrs.get("epilogue_pool")]
    assert pooled, "no pool epilogue fused on the encoder TransDown edge"
    tgs = [n for n in igf.nodes
           if n.op == "tuple_get" and n.attrs.get("idx") == 1]
    assert len(tgs) == len(pooled)
    assert not any(n.op == "maxpool" and n.inputs[0] in
                   {p.name for p in pooled} for n in igf.nodes)

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(1, 8, 8, 8, 2).astype(np.float32))
    ref = nnir.apply(ig, iv, x, mode="quantized",
                     precision=jax.lax.Precision.HIGHEST)
    got = nnir.apply(igf, ivf, x, mode="quantized",
                     precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_vmem_guard_falls_back_to_xla_semantics():
    """Geometries whose planes exceed the per-program VMEM budget (e.g. the
    128^2-plane stages of a whole-volume serving pass) must route to the
    XLA realization with identical semantics — including the residual /
    quant / pool epilogues — instead of dying in the Mosaic allocator."""
    from efficientq_tpu.pallas.qconv3d import _xla_maxpool2, qconv3x3_int8_ndhwc

    rng = np.random.RandomState(3)
    # h*w*pad128(c)*2*3 = 12.58 MB > the 12 MB tz=1 budget -> XLA fallback
    n, d, h, w, c, o = 1, 4, 128, 128, 8, 6
    x = jnp.asarray(np.abs(rng.randn(n, d, h, w, c)).astype(np.float32))
    codes = jnp.asarray(
        rng.randint(-3, 4, size=(3, 3, 3, c, o)).astype(np.int8))
    b = jnp.asarray(rng.randn(o).astype(np.float32))
    na, alpha, scale = 4, 0.8, 0.21
    qa = jnp.round(jnp.clip(x / alpha, 0, 1) * (na - 1)).astype(jnp.int8)
    ref = ops.conv3d(qa, codes, None, (1, 1, 1), (1, 1, 1), (1, 1, 1), 1,
                     preferred_element_type=jnp.int32)
    ref = ref.astype(jnp.float32) * scale + b

    got = qconv3x3_int8_ndhwc(x, codes, b, alpha, scale, na, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4,
                               rtol=1e-4)

    # residual(+relu) epilogue
    r = jnp.asarray(rng.randn(n, d, h, w, o).astype(np.float32))
    got = qconv3x3_int8_ndhwc(x, codes, b, alpha, scale, na, interpret=True,
                              residual=r, residual_relu=True)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(ref + jnp.maximum(r, 0)),
                               atol=1e-4, rtol=1e-4)

    # next-layer act-quant epilogue
    got = qconv3x3_int8_ndhwc(x, codes, b, alpha, scale, na, interpret=True,
                              quant_alpha=0.5, quant_qlvl=4)
    want = jnp.round(jnp.clip(ref / 0.5, 0, 1) * 3).astype(jnp.int8)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # pool epilogue: (y, maxpool2(y))
    y, yp = qconv3x3_int8_ndhwc(x, codes, b, alpha, scale, na,
                                interpret=True, pool=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-4,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(yp),
                               np.asarray(_xla_maxpool2(jnp.asarray(ref))),
                               atol=1e-4, rtol=1e-4)


def test_qconv3x3_ring_variant_bit_exact():
    """Ring-accumulator kernel (kd packed into the dot's N dim, rotating
    VMEM slots across the sequential grid) == the plane-per-output kernel,
    bit-for-bit, across every epilogue combination, batch > 1 (the
    accumulator must reset per batch item) and boundary depths."""
    from efficientq_tpu.pallas.qconv3d import qconv3x3_int8_ndhwc

    rng = np.random.RandomState(21)
    na, alpha, scale = 4, 0.9, 0.37
    for n, d, h, w, c, o in ((2, 5, 6, 6, 5, 7),    # batch 2, odd depth
                             (1, 2, 6, 6, 5, 7),    # minimum depth
                             (1, 4, 8, 8, 4, 6),    # pool dims; ring TZ=2
                             (2, 8, 8, 8, 4, 6)):   # ring TZ=4 + batch
        x = jnp.asarray(np.abs(rng.randn(n, d, h, w, c)).astype(np.float32))
        codes = jnp.asarray(
            rng.randint(-3, 4, size=(3, 3, 3, c, o)).astype(np.int8))
        b = jnp.asarray(rng.randn(o).astype(np.float32))
        res = jnp.asarray(rng.randn(n, d, h, w, o).astype(np.float32))
        cases = [dict(), dict(residual=res), dict(residual=res,
                                                  residual_relu=True),
                 dict(quant_alpha=1.7, quant_qlvl=8),
                 dict(out_dtype=jnp.bfloat16),
                 dict(residual=res.astype(jnp.bfloat16),
                      out_dtype=jnp.bfloat16)]
        if d % 2 == 0 and h % 2 == 0 and w % 2 == 0:
            cases += [dict(pool=True), dict(pool=True, residual=res)]
        for kw in cases:
            ref = qconv3x3_int8_ndhwc(x, codes, b, alpha, scale, na,
                                      interpret=True, ring="off", **kw)
            # 'force' engages the multi-plane (TZ) ring where depth
            # divides; 'ring1' pins the single-plane kernel; 'k9' packs
            # all taps into one K=9C dot — all bit-identical to the
            # z-tiled reference
            for mode in ("force", "ring1", "taps", "k9"):
                got = qconv3x3_int8_ndhwc(x, codes, b, alpha, scale, na,
                                          interpret=True, ring=mode, **kw)
                if kw.get("pool"):
                    for rr, gg in zip(ref, got):
                        np.testing.assert_array_equal(np.asarray(gg),
                                                      np.asarray(rr))
                else:
                    np.testing.assert_array_equal(np.asarray(got),
                                                  np.asarray(ref))
