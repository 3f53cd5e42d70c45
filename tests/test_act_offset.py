"""Offset (signed-asymmetric) activation grids (--act_offset).

The reference's activation quantizer is unsigned
(src/models/layer_helper.py:25-37): negative inputs saturate at zero —
the measured W2A2 tail-collapse mechanism (docs/quantization.md).  The
offset grid shifts k of the qlvl_act levels below zero; zero stays ON the
grid so int8 deployment needs no zero-point correction (codes become
q - k, the scale epilogue is unchanged).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

jax.config.update("jax_platforms", "cpu")


def test_k0_matches_unsigned_grid_bitwise():
    from efficientq_tpu.quant import fake_quant_act, fake_quant_act_k

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 5, 6).astype(np.float32))
    for n in (4, 16):
        a = fake_quant_act(x, 0.73, n)
        b = fake_quant_act_k(x, 0.73, n, jnp.int32(0))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_offset_grid_keeps_negative_mass():
    from efficientq_tpu.quant import fake_quant_act_k

    x = jnp.asarray(np.linspace(-1.0, 1.0, 41, dtype=np.float32))
    y1 = np.asarray(fake_quant_act_k(x, 1.0, 4, jnp.int32(1)))
    # grid levels: (-1, 0, 1, 2)/3 — negatives survive, bounded at -1/3
    assert y1.min() == pytest.approx(-1.0 / 3.0, abs=1e-6)
    assert y1.max() == pytest.approx(2.0 / 3.0, abs=1e-6)
    assert len(np.unique(y1)) == 4
    # unsigned grid for contrast: clips every negative to exactly 0
    y0 = np.asarray(fake_quant_act_k(x, 1.0, 4, jnp.int32(0)))
    assert y0.min() == 0.0


def test_calibrate_layer_search_prefers_offset_on_signed_data():
    from efficientq_tpu.ptq.admm import PTQHyperParams, calibrate_layer

    rng = np.random.RandomState(1)
    # input with substantial negative mass (e.g. a pre-relu fuse output)
    x = jnp.asarray(rng.randn(1, 6, 6, 6, 4).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, 4, 5).astype(np.float32) * 0.1)
    y = jnp.asarray(rng.randn(1, 6, 6, 6, 5).astype(np.float32))
    kw = dict(ksize=(3, 3, 3), stride=(1, 1, 1), padding=(1, 1, 1),
              dilation=(1, 1, 1), qlvl_w=4, has_bias=False,
              hp=PTQHyperParams(admm_iter=5), qlvl_act=4)
    res = calibrate_layer(x, y, k, None, None, act_search=3, **kw)
    assert int(res["act_k"]) > 0  # symmetric-ish data wants levels below 0
    # nonnegative (post-relu) data keeps the unsigned grid
    xp = jnp.abs(x)
    res0 = calibrate_layer(xp, y, k, None, None, act_search=3, **kw)
    assert int(res0["act_k"]) == 0
    # and the searched grid reconstructs the signed input strictly better
    # than the unsigned grid does
    from efficientq_tpu.quant import fake_quant_act_k, project_by_iter

    a0, b0 = project_by_iter(x, 4, 0.0, 1.0)
    err0 = float(jnp.sum((x - a0 * b0) ** 2))
    xq = fake_quant_act_k(x, res["alpha_act"], 4, res["act_k"])
    errk = float(jnp.sum((x - xq) ** 2))
    assert errk < err0


def _tiny_quantized_net():
    from efficientq_tpu import nnir
    from efficientq_tpu.models import UResQConfig, build_uresq

    cfg = UResQConfig(num_mod=1, num_classes=2, depth_config=[1, 1, 1],
                      width_config=[4, 8, 4], dilation_config=[1, 1, 1],
                      init_stride=(2, 2, 2), drop_rate=0.0, blk_type="mid",
                      ds=None, quantize=True, qlvl_w=4, qlvl_act=4,
                      q_first=(256, -1), q_last=(256, -1))
    g = build_uresq(cfg)
    v = nnir.init(g, jax.random.PRNGKey(0))
    return g, v


def test_run_ptq_act_offset_e2e_fq_deploy_export():
    from efficientq_tpu import nnir
    from efficientq_tpu.models import torch_io
    from efficientq_tpu.ptq import run_ptq
    from efficientq_tpu.ptq.admm import PTQHyperParams
    from efficientq_tpu.ptq.deploy import to_int8_inference
    from efficientq_tpu.ptq.engine import tail_sensitive_convs

    g, v = _tiny_quantized_net()
    rng = np.random.RandomState(2)
    calib = jnp.asarray(rng.randn(1, 16, 16, 16, 1).astype(np.float32))
    tail = set(tail_sensitive_convs(g))
    assert tail
    fg, qv, _ = run_ptq(g, v, calib, task="lits", init_stride=(2, 2, 2),
                        hp=PTQHyperParams(admm_iter=5), act_offset=3,
                        act_offset_convs=tail)
    # every tail conv got an act_k; others did not
    for name in tail:
        assert "act_k" in qv["params"][name], name
    others = [n.name for n in fg.qconv_nodes()
              if n.name not in tail and n.attrs["qcfg"].q_act]
    for name in others:
        assert "act_k" not in qv["params"][name], name

    x = jnp.asarray(rng.randn(1, 16, 16, 16, 1).astype(np.float32))
    out_fq = nnir.apply(fg, qv, x, mode="quantized")

    # int8 deployment bakes act_k as a static attr; forward must agree
    ig, iv = to_int8_inference(fg, qv, pallas=False)
    baked = {n.name: n.attrs.get("act_k", 0) for n in ig.nodes
             if n.attrs.get("int8")}
    assert any(baked.get(name, 0) > 0 or "act_k" in qv["params"][name]
               for name in tail)
    out_int8 = nnir.apply(ig, iv, x, mode="quantized")
    np.testing.assert_allclose(np.asarray(out_int8), np.asarray(out_fq),
                               atol=2e-4, rtol=2e-4)

    # export round-trip preserves act_k (torch-style flat dict)
    sd = torch_io.to_torch_state_dict(fg, qv)
    keys = [k for k in sd if k.endswith(".act_k")]
    assert sorted(k.rsplit(".", 1)[0] for k in keys) == sorted(tail)
    v2 = nnir.init(g, jax.random.PRNGKey(1))
    from efficientq_tpu.ptq import fold_bn

    fg2, fv2 = fold_bn(g, v2)
    loaded = torch_io.load_torch_state_dict(fg2, fv2, sd)
    for name in tail:
        assert int(loaded["params"][name]["act_k"]) == int(
            np.asarray(qv["params"][name]["act_k"]))
    out2 = nnir.apply(fg2, loaded, x, mode="quantized")
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out_fq),
                               atol=1e-5, rtol=1e-5)
