"""Oracle tests of XLA primitives against torch CPU (the trusted
implementation the reference delegates to; pattern per solver.py:348-365)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from efficientq_tpu import ops

HI = jax.lax.Precision.HIGHEST


def rand(shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


@pytest.mark.parametrize("stride,padding,dilation", [
    (1, 1, 1), (2, 1, 1), ((2, 2, 1), 1, 1), (1, 2, 2), (1, 0, 1),
])
def test_conv3d_vs_torch(stride, padding, dilation):
    x = rand((2, 8, 9, 10, 5), 1)
    w = rand((4, 5, 3, 3, 3), 2)  # OIDHW
    b = rand((4,), 3)
    ref = F.conv3d(torch.from_numpy(x).permute(0, 4, 1, 2, 3),
                   torch.from_numpy(w), torch.from_numpy(b),
                   stride=stride, padding=padding, dilation=dilation)
    got = ops.conv3d(jnp.asarray(x), ops.oidhw_to_dhwio(jnp.asarray(w)),
                     jnp.asarray(b), stride, padding, dilation, precision=HI)
    got_ncdhw = np.asarray(ops.ndhwc_to_ncdhw(got))
    np.testing.assert_allclose(got_ncdhw, ref.numpy(), atol=2e-4, rtol=1e-4)


def test_maxpool_vs_torch():
    x = rand((2, 8, 8, 6, 3), 5)
    ref = F.max_pool3d(torch.from_numpy(x).permute(0, 4, 1, 2, 3), 2, 2)
    got = ops.max_pool3d(jnp.asarray(x), 2)
    np.testing.assert_allclose(np.asarray(ops.ndhwc_to_ncdhw(got)), ref.numpy(),
                               atol=1e-6)


def test_avgpool_vs_torch():
    x = rand((1, 8, 8, 8, 4), 6)
    ref = F.avg_pool3d(torch.from_numpy(x).permute(0, 4, 1, 2, 3), 2)
    got = ops.avg_pool3d(jnp.asarray(x), 2)
    np.testing.assert_allclose(np.asarray(ops.ndhwc_to_ncdhw(got)), ref.numpy(),
                               atol=1e-6)


@pytest.mark.parametrize("scale", [2, (2, 2, 1), (4, 4, 2)])
def test_trilinear_upsample_vs_torch(scale):
    x = rand((2, 4, 5, 6, 3), 7)
    up = torch.nn.Upsample(scale_factor=scale, mode="trilinear")
    ref = up(torch.from_numpy(x).permute(0, 4, 1, 2, 3))
    got = ops.upsample3d(jnp.asarray(x), scale)
    np.testing.assert_allclose(np.asarray(ops.ndhwc_to_ncdhw(got)), ref.numpy(),
                               atol=1e-5, rtol=1e-5)


def test_batchnorm_eval_vs_torch():
    x = rand((2, 4, 5, 6, 7), 8)
    bn = torch.nn.BatchNorm3d(7)
    bn.eval()
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(rand((7,), 9)))
        bn.bias.copy_(torch.from_numpy(rand((7,), 10)))
        bn.running_mean.copy_(torch.from_numpy(rand((7,), 11)))
        bn.running_var.copy_(torch.from_numpy(np.abs(rand((7,), 12)) + 0.5))
        ref = bn(torch.from_numpy(x).permute(0, 4, 1, 2, 3))
    got = ops.batch_norm(jnp.asarray(x), jnp.asarray(bn.weight.detach().numpy()),
                         jnp.asarray(bn.bias.detach().numpy()),
                         jnp.asarray(bn.running_mean.numpy()),
                         jnp.asarray(bn.running_var.numpy()))
    np.testing.assert_allclose(np.asarray(ops.ndhwc_to_ncdhw(got)), ref.numpy(),
                               atol=1e-5, rtol=1e-4)


def test_batchnorm_train_vs_torch():
    x = rand((3, 4, 4, 4, 5), 13)
    bn = torch.nn.BatchNorm3d(5)
    bn.train()
    with torch.no_grad():
        ref = bn(torch.from_numpy(x).permute(0, 4, 1, 2, 3))
    y, m, v = ops.batch_norm_train(
        jnp.asarray(x), jnp.ones(5), jnp.zeros(5), jnp.zeros(5), jnp.ones(5))
    np.testing.assert_allclose(np.asarray(ops.ndhwc_to_ncdhw(y)), ref.numpy(),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(m), bn.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v), bn.running_var.numpy(),
                               atol=1e-4, rtol=1e-4)


def test_dropout3d_channelwise():
    x = jnp.ones((4, 6, 6, 6, 16))
    y = ops.dropout3d(x, 0.5, jax.random.PRNGKey(0))
    arr = np.asarray(y)
    # each (n, c) volume is either all zeros or all 2.0
    per_chan = arr.reshape(4, -1, 16)
    for n in range(4):
        for c in range(16):
            vals = np.unique(per_chan[n, :, c])
            assert len(vals) == 1 and vals[0] in (0.0, 2.0)


@pytest.mark.parametrize("stride", [(2, 2, 2), (2, 2, 1), (1, 2, 2)])
def test_stem_s2d_conv3d_matches_conv3d(stride):
    # odd spatial dims exercise the ragged-tail padding of the phase split
    x = rand((2, 7, 9, 10, 4), 7)
    w = rand((3, 3, 3, 4, 6), 8)
    b = rand((6,), 9)
    ref = ops.conv3d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                     stride=stride, padding=1, precision=HI)
    got = ops.stem_s2d_conv3d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                              stride=stride, precision=HI)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)
