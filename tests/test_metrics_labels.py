"""Metrics + label split/merge parity tests."""
import numpy as np

from efficientq_tpu.data import labels as LB
from efficientq_tpu.eval import metrics as M


def test_dice_simple():
    p = np.zeros((4, 4, 4)); t = np.zeros((4, 4, 4))
    p[:2] = 1; t[1:3] = 1
    # |p|=32, |t|=32, inter=16 -> dice 0.5
    assert abs(M.dice(p, t) - 0.5) < 1e-5
    assert abs(M.sensitivity(p, t) - 0.5) < 1e-4
    assert abs(M.specificity(p, t) - 0.5) < 1e-4
    assert abs(M.accuracy(p, t) - 0.5) < 1e-6


def test_lesion_counts():
    t = np.zeros((10, 10, 10), np.int32)
    t[1:3, 1:3, 1:3] = 1   # lesion A
    t[6:8, 6:8, 6:8] = 1   # lesion B
    p = np.zeros_like(t)
    p[1:3, 1:3, 1:3] = 1   # hits A
    p[4:5, 1:2, 1:2] = 1   # false positive
    assert M.num_positive(p, t) == 2
    assert M.num_false_positive(p, t) == 1
    assert M.num_false_negative(p, t) == 1


def test_seg_metric_mc_argmax_path():
    sm = M.SegMetricMC(n_class=3, sn_list=["a"])
    logits = np.zeros((3, 4, 4, 4), np.float32)
    label = np.random.RandomState(0).randint(0, 3, (4, 4, 4))
    for c in range(3):
        logits[c][label == c] = 10.0
    pred = sm.evaluate_append(logits, label)
    assert (pred == label).all()
    m = sm.get_metric()
    assert abs(m["dsc"] - 1.0) < 1e-5
    assert abs(m["dsc/1"] - 1.0) < 1e-5


def test_seg_metric_mc_multilabel_path_with_fusion():
    sm = M.SegMetricMC(n_class=2, sn_list=["a"])
    label = np.zeros((2, 4, 4, 4), np.float32)
    label[0, :2] = 1
    label[1, :1] = 1
    logits = np.where(label > 0, 10.0, -10.0).astype(np.float32)
    # break hierarchy in the raw pred; 'con' fusion must restore it
    logits[1, 3, 0, 0] = 10.0
    pred = sm.evaluate_append(logits, label, multilabel_fusetype="con")
    assert pred[1, 3, 0, 0] == 0  # suppressed by conservative fusion
    m = sm.get_metric()
    assert m["dsc"] > 0.99


def test_hard_pred_path_matches_logits_path():
    """evaluate_append_pred fed the DEVICE hard-pred rule (sliding.py
    ``hard_pred``: sign test / last-axis argmax, uint8) accumulates the
    exact same metrics as evaluate_append fed raw f32 logits — the
    eval-loop pipelining (validate.py) must not change any number."""
    rng = np.random.RandomState(3)

    # multilabel (sigmoid >= 0.5 <=> logit >= 0), with fusion
    logits = rng.randn(2, 5, 6, 7).astype(np.float32)
    label = (rng.rand(2, 5, 6, 7) > 0.5).astype(np.float32)
    label[1] *= label[0]  # hierarchical, as BraTS labels are
    sm_ref = M.SegMetricMC(n_class=2, sn_list=["a"])
    pred_ref = sm_ref.evaluate_append(logits, label, multilabel_fusetype="con")
    # device rule operates channel-minor then the host moveaxis restores (C,...)
    hard = np.moveaxis((np.moveaxis(logits, 0, -1) >= 0).astype(np.uint8),
                       -1, 0)
    sm_hard = M.SegMetricMC(n_class=2, sn_list=["a"])
    pred_hard = sm_hard.evaluate_append_pred(hard, label, multilabel=True,
                                             multilabel_fusetype="con")
    np.testing.assert_array_equal(pred_ref, pred_hard)
    assert sm_ref.get_metric() == sm_hard.get_metric()

    # argmax path (class ids), including exact-tie voxels
    logits = rng.randn(3, 5, 6, 7).astype(np.float32)
    logits[0, 0, 0, 0] = logits[1, 0, 0, 0]  # tie: both take first-max
    label = rng.randint(0, 3, (5, 6, 7))
    sm_ref = M.SegMetricMC(n_class=3, sn_list=["a"])
    pred_ref = sm_ref.evaluate_append(logits, label)
    hard = np.argmax(np.moveaxis(logits, 0, -1), axis=-1).astype(np.uint8)
    sm_hard = M.SegMetricMC(n_class=3, sn_list=["a"])
    pred_hard = sm_hard.evaluate_append_pred(hard, label, multilabel=False)
    np.testing.assert_array_equal(pred_ref, pred_hard)
    assert sm_ref.get_metric() == sm_hard.get_metric()


def test_brats_label_roundtrip():
    # on-disk labels use the remapped convention {0,1=NCR,2=ED,3=ET}
    # (split_label_brats, misc.py:260-266); merge emits the BraTS eval
    # convention {0,1,2,4} (misc.py:234-246)
    rng = np.random.RandomState(0)
    lbl = rng.choice([0, 1, 2, 3], size=(6, 6, 6)).astype(np.uint8)
    split = LB.split_label_brats(lbl)
    assert split.shape == (3, 6, 6, 6)
    np.testing.assert_array_equal(split[0], (lbl > 0))       # WT
    np.testing.assert_array_equal(split[2], (lbl == 3))      # ET
    merged = LB.merge_label_brats(split.astype(np.int32))
    expect = np.where(lbl == 1, 1, np.where(lbl == 2, 2,
                                            np.where(lbl == 3, 4, 0)))
    np.testing.assert_array_equal(merged, expect)


def test_lits_label_roundtrip():
    rng = np.random.RandomState(1)
    lbl = rng.choice([0, 1, 2], size=(6, 6, 6)).astype(np.uint8)
    split = LB.split_label_lits(lbl)
    merged = LB.merge_label_lits(split.astype(np.int32))
    np.testing.assert_array_equal(merged, lbl)


def test_fusion_modes():
    pred = np.array([[0, 1], [1, 1], [1, 0]])[:, :, None]  # (C=3, 2, 1)
    agg = LB.merge_label_basic(pred, "agg")
    # agg: p[i] = any(p[j], j>=i)
    np.testing.assert_array_equal(agg[:, :, 0], [[1, 1], [1, 1], [1, 0]])
    con = LB.merge_label_basic(pred, "con")
    # con: p[i] = all(p[j], j<=i)
    np.testing.assert_array_equal(con[:, :, 0], [[0, 1], [0, 1], [0, 0]])


def test_pred_brats_con_merge():
    import jax.numpy as jnp
    from efficientq_tpu.ptq.attention import pred_brats_con_merge

    # logits: WT on, TC off, ET on -> ET must be suppressed by cascade
    out = np.full((1, 1, 1, 1, 3), -10.0, np.float32)
    out[0, 0, 0, 0, 0] = 10.0
    out[0, 0, 0, 0, 2] = 10.0
    pred = np.asarray(pred_brats_con_merge(jnp.asarray(out)))
    assert pred[0, 0, 0, 0] == 1  # only WT survives
    # all channels on -> deepest label wins
    out[0, 0, 0, 0, 1] = 10.0
    pred = np.asarray(pred_brats_con_merge(jnp.asarray(out)))
    assert pred[0, 0, 0, 0] == 3


def test_auc():
    prob = np.array([0.1, 0.9, 0.8, 0.2])
    target = np.array([0, 1, 1, 0])
    assert abs(M.auc(prob, target) - 1.0) < 1e-6
    assert M.auc(prob, np.ones(4)) == 1.0  # single-class fallback
