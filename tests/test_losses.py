"""Loss oracle tests vs torch (reference criteria src/utils/losses.py)."""
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from efficientq_tpu.train import losses as L


def rand(shape, seed):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def test_cross_entropy_vs_torch():
    logits = rand((2, 3, 4, 4, 4), 0)
    target = np.random.RandomState(1).randint(0, 3, (2, 4, 4, 4))
    ref = nn.CrossEntropyLoss()(torch.from_numpy(logits),
                                torch.from_numpy(target))
    got = float(L.cross_entropy(jnp.asarray(logits), jnp.asarray(target)))
    assert abs(got - float(ref)) < 1e-5


def test_focal_vs_torch_formula():
    logits = rand((2, 3, 4, 4, 4), 2)
    target = np.random.RandomState(3).randint(0, 3, (2, 4, 4, 4))
    lt = torch.from_numpy(logits)
    tt = torch.from_numpy(target)
    log_p = F.log_softmax(lt, dim=1)
    log_p = torch.pow(1 - torch.exp(log_p), 2.0) * log_p
    ref = F.nll_loss(log_p, tt, reduction="sum") / (tt >= 0).sum().float()
    got = float(L.focal_loss(jnp.asarray(logits), jnp.asarray(target)))
    assert abs(got - float(ref)) < 1e-5


def test_bce_vs_torch():
    logits = rand((2, 2, 4, 4, 4), 4)
    target = (rand((2, 2, 4, 4, 4), 5) > 0).astype(np.float32)
    ref = nn.BCEWithLogitsLoss()(torch.from_numpy(logits),
                                 torch.from_numpy(target))
    got = float(L.bce_with_logits(jnp.asarray(logits), jnp.asarray(target)))
    assert abs(got - float(ref)) < 1e-5


def test_general_dice_vs_reference_formula():
    logits = rand((2, 3, 4, 4, 4), 6)
    target = np.random.RandomState(7).randint(0, 3, (2, 4, 4, 4))
    # replicate losses.py:32-64 in torch
    inp = F.softmax(torch.from_numpy(logits), dim=1)
    t_oh = torch.stack([(torch.from_numpy(target) == i) for i in range(3)],
                       dim=1).float()
    w = torch.tensor([0.0, 1.0, 1.0])
    num = 2 * ((inp * t_oh).permute(0, 2, 3, 4, 1) * w).sum(dim=[1, 2, 3, 4]) + 1e-6
    den = ((inp + t_oh).permute(0, 2, 3, 4, 1) * w).sum(dim=[1, 2, 3, 4]) + 1e-6
    ref = (1 - num / den).mean()
    got = float(L.general_dice_loss(jnp.asarray(logits), jnp.asarray(target)))
    assert abs(got - float(ref)) < 1e-5


def test_multilabel_dice_vs_reference_formula():
    logits = rand((2, 3, 4, 4, 4), 8)
    target = (rand((2, 3, 4, 4, 4), 9) > 0).astype(np.float32)
    pred = torch.sigmoid(torch.from_numpy(logits))
    tt = torch.from_numpy(target)
    ref = 0.0
    for i in range(2):
        for j in range(3):
            eps = 1e-6
            d = (2 * (pred[i, j] * tt[i, j]).sum() + eps) / (
                tt[i, j].sum() + pred[i, j].sum() + eps)
            ref += (1 - d)
    ref /= 2
    got = float(L.multilabel_dice_loss(jnp.asarray(logits),
                                       jnp.asarray(target)))
    assert abs(got - float(ref)) < 1e-5


def test_head_loss_weights():
    w = np.asarray(L.head_loss_weights(3))
    np.testing.assert_allclose(w, [1 / 7, 2 / 7, 4 / 7], rtol=1e-6)
    w5 = np.asarray(L.head_loss_weights(5))
    assert w5[0] == 0 and w5[1] == 0
    np.testing.assert_allclose(w5[2:], [1 / 7, 2 / 7, 4 / 7], rtol=1e-6)


def test_multi_output_loss_weighting():
    logits = jnp.asarray(rand((3, 2, 3, 4, 4, 4), 10))
    target = jnp.asarray(np.random.RandomState(11).randint(0, 3, (2, 4, 4, 4)))
    hw = L.head_loss_weights(3)
    total, arr = L.multi_output_loss(L.cross_entropy, hw, logits, target)
    assert arr.shape == (3,)
    assert abs(float(total) - float(jnp.sum(arr * hw))) < 1e-6
