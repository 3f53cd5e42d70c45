"""Bit-level PTQ parity vs the reference's EfficientQConv.ptq on one layer.

Feeds identical inputs/weights/attention to the reference ADMM (torch CPU)
and to our calibrate_layer: quantized codes, alpha scales, bias and the
reconstruction MSE must agree.  (Full-network sweeps diverge only through
best-iterate selection ties under f32 noise, with equivalent reconstruction
quality — verified separately in scripts/cross_check_reference_ptq.py.)
"""
import os.path as P
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/src"
pytestmark = pytest.mark.skipif(not P.isdir(REF),
                                reason="reference tree not mounted")


def test_single_layer_admm_matches_reference():
    import torch

    if "pytz" not in sys.modules:
        fake = types.ModuleType("pytz")
        fake.timezone = lambda tz: None
        sys.modules["pytz"] = fake
    sys.path.insert(0, REF)
    try:
        from models.EfficientQConv import EfficientQConv
    finally:
        sys.path.remove(REF)

    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    x = np.abs(rng.randn(1, 4, 10, 10, 10)).astype(np.float32)
    w = (rng.randn(6, 4, 3, 3, 3) * 0.2).astype(np.float32)
    b = (rng.randn(6) * 0.05).astype(np.float32)
    att = np.abs(rng.randn(1, 10, 10, 10)).astype(np.float32) + 0.5
    n_iter = 60

    conv = EfficientQConv(4, 6, 3, 1, 1, bias=True, q_weight=True, qlvl=4,
                          q_act=True, qlvl_act=4)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w))
        conv.bias.copy_(torch.from_numpy(b))
    conv.eval()
    conv.set_fp()
    with torch.no_grad():
        out_fp = conv(torch.from_numpy(x))
    conv.output_fp = out_fp
    conv.mask_pyramid = [torch.from_numpy(att)]
    conv.layer_loss = []
    conv.name = "test"
    conv.lwq_iter = n_iter
    conv.set_quantizing()
    with torch.no_grad():
        conv(torch.from_numpy(x))
    ref_G = conv.weight.detach().numpy()
    ref_b = conv.bias.detach().numpy()
    ref_aa = float(conv.alpha_act)

    import jax.numpy as jnp

    from efficientq_tpu.ptq.admm import PTQHyperParams, calibrate_layer
    from efficientq_tpu.quant import project_by_iter

    x_j = jnp.asarray(x.transpose(0, 2, 3, 4, 1))
    y_j = jnp.asarray(out_fp.numpy().transpose(0, 2, 3, 4, 1))
    aa, bb = project_by_iter(x_j, 4, 0.0, 1.0)
    assert abs(float(aa) - ref_aa) / ref_aa < 1e-4
    res = calibrate_layer(
        aa * bb, y_j, jnp.asarray(w.transpose(2, 3, 4, 1, 0)),
        jnp.asarray(b), jnp.asarray(att), ksize=(3, 3, 3), stride=(1, 1, 1),
        padding=(1, 1, 1), dilation=(1, 1, 1), qlvl_w=4, has_bias=True,
        hp=PTQHyperParams(admm_iter=n_iter))
    our_G = np.transpose(np.asarray(res["kernel"]), (4, 3, 0, 1, 2))
    scale = np.abs(ref_G).max()
    # every quantized value identical (same grid point chosen)
    assert np.mean(np.abs(our_G - ref_G) < 1e-3 * scale) == 1.0
    np.testing.assert_allclose(np.asarray(res["bias"]), ref_b, atol=1e-3)

    import torch.nn.functional as F

    xq = torch.from_numpy(np.array(aa * bb).transpose(0, 4, 1, 2, 3))
    ref_mse = float(F.mse_loss(
        F.conv3d(xq, torch.from_numpy(ref_G), torch.from_numpy(ref_b), 1, 1),
        out_fp))
    our_mse = float(F.mse_loss(
        F.conv3d(xq, torch.from_numpy(our_G),
                 torch.from_numpy(np.asarray(res["bias"])), 1, 1), out_fp))
    assert abs(ref_mse - our_mse) / ref_mse < 1e-3
