"""Training smoke test: tiny UResQ on synthetic LiTS-like data; loss must
decrease and checkpoints must roundtrip."""
import os.path as P

import jax
import numpy as np
import pytest

from efficientq_tpu import nnir
from efficientq_tpu.data.datahub import DataHub
from efficientq_tpu.data.synthetic import make_synthetic_dataset, task_modalities
from efficientq_tpu.models import UResQConfig, build_uresq
from efficientq_tpu.train import Trainer
from efficientq_tpu.train.schedule import poly_warmup_schedule


def test_poly_warmup_schedule_values():
    s = poly_warmup_schedule(1.0, 100, 10)
    # warmup ramp
    assert float(s(0)) == pytest.approx(0.1 * (1 - 0 / 100) ** 0.9, rel=1e-4)
    assert float(s(9)) == pytest.approx(1.0 * (1 - 9 / 100) ** 0.9, rel=1e-4)
    # poly decay after warmup
    assert float(s(50)) == pytest.approx((1 - 50 / 100) ** 0.9, rel=1e-4)
    assert float(s(100)) == pytest.approx(0.0, abs=1e-7)


def make_hub(tmp_path, n_subjects=3):
    data_dir, split_dir = make_synthetic_dataset(
        str(tmp_path), task="lits", n_subjects=n_subjects,
        vol_shape=(16, 16, 16))
    return DataHub(
        data_dir, task_modalities("lits"),
        train_split=f"{split_dir}/round1/train.txt",
        val_split=f"{split_dir}/round1/val.txt",
        train_batchsize=2, test_batchsize=1, access_type="npy",
        crop_type="random", crop_size_img=(8, 8, 8),
        slide_patch_size=(8, 8, 8), slide_overlap=(2, 2, 2))


def test_train_loss_decreases(tmp_path):
    hub = make_hub(tmp_path)
    cfg = UResQConfig(num_mod=1, num_classes=3, depth_config=[1, 1, 1],
                      width_config=[4, 8, 4], dilation_config=[1, 1, 1],
                      init_stride=(2, 2, 2), drop_rate=0.0, blk_type="mid",
                      ds="simple", ds_depth_limit=3)
    graph = build_uresq(cfg)
    variables = nnir.init(graph, jax.random.PRNGKey(0))
    tr = Trainer(graph, variables, hub, loss_name="hybrid",
                 num_mo=len(graph.outputs),
                 n_class=3, base_lr=0.01, max_epoch=8,
                 snapshot_root=str(tmp_path / "snap"), test_interval=100,
                 display_interval=4)
    first = tr.train_epoch()["loss"]
    for _ in range(7):
        last = tr.train_epoch()["loss"]
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first, (first, last)

    # checkpoint roundtrip
    fname = tr.snapshot(8, "latest")
    assert P.isfile(fname)
    w_before = np.asarray(tr.variables["params"]["conv0.conv"]["kernel"])
    tr.variables = nnir.init(graph, jax.random.PRNGKey(9))
    tr.resume(fname)
    w_after = np.asarray(tr.variables["params"]["conv0.conv"]["kernel"])
    np.testing.assert_allclose(w_after, w_before, atol=1e-6)
    assert tr.start_epoch == 9


def test_validate_online_returns_metrics(tmp_path):
    hub = make_hub(tmp_path)
    cfg = UResQConfig(num_mod=1, num_classes=3, depth_config=[1, 1, 1],
                      width_config=[4, 8, 4], dilation_config=[1, 1, 1],
                      init_stride=(2, 2, 2), drop_rate=0.0, blk_type="mid",
                      ds="simple", ds_depth_limit=3)
    graph = build_uresq(cfg)
    variables = nnir.init(graph, jax.random.PRNGKey(0))
    tr = Trainer(graph, variables, hub, loss_name="ce",
                 num_mo=len(graph.outputs), n_class=3,
                 base_lr=0.01, max_epoch=1, snapshot_root=str(tmp_path / "s2"))
    md = tr.validate_online(1)
    assert "val/seg_dsc" in md
    assert 0.0 <= md["val/seg_dsc"] <= 1.0


def test_exponential_warmup_variant():
    s = poly_warmup_schedule(1.0, 1000, 10, warmup="exponential")
    # 1 - exp(-(t+1)/period), matching pytorch_warmup ExponentialWarmup
    got = float(s(4)) / (1 - 4 / 1000) ** 0.9
    assert got == pytest.approx(1 - np.exp(-5 / 10), rel=1e-4)


def test_interrupt_mid_step_leaves_snapshotable_state(tmp_path):
    """The train step donates its carried buffers; a SIGINT landing inside
    the dispatch+reassign window must be deferred past the reassignment so
    the KeyboardInterrupt emergency snapshot (train()) still reads live
    arrays instead of raising 'Array has been deleted'."""
    import os
    import signal

    hub = make_hub(tmp_path)
    cfg = UResQConfig(num_mod=1, num_classes=3, depth_config=[1, 1, 1],
                      width_config=[4, 8, 4], dilation_config=[1, 1, 1],
                      init_stride=(2, 2, 2), drop_rate=0.0, blk_type="mid",
                      ds="simple", ds_depth_limit=3)
    graph = build_uresq(cfg)
    variables = nnir.init(graph, jax.random.PRNGKey(0))
    tr = Trainer(graph, variables, hub, loss_name="ce",
                 num_mo=len(graph.outputs), n_class=3, base_lr=0.01,
                 max_epoch=1, snapshot_root=str(tmp_path / "snap"),
                 test_interval=100, display_interval=100)
    tr.train_epoch()  # compile

    orig_step = tr._train_step

    def interrupting_step(*a):
        os.kill(os.getpid(), signal.SIGINT)  # lands inside _defer_sigint
        return orig_step(*a)

    tr._train_step = interrupting_step
    import pytest

    with pytest.raises(KeyboardInterrupt):
        tr.train_epoch()
    path = tr.snapshot(tr.epoch, "KeyboardInterrupt")
    assert P.isfile(path)
