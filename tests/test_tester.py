"""Tester facade + multi-volume calibration batch."""
import os.path as P

import jax
import jax.numpy as jnp
import numpy as np

from efficientq_tpu import nnir
from efficientq_tpu.data.datahub import DataHub
from efficientq_tpu.data.synthetic import make_synthetic_dataset, task_modalities
from efficientq_tpu.models import UResQConfig, build_uresq
from efficientq_tpu.ptq import PTQHyperParams, run_ptq
from efficientq_tpu.train.tester import PTQTester, Tester


def small_setup(tmp_path):
    data_dir, split_dir = make_synthetic_dataset(
        str(tmp_path), task="lits", n_subjects=3, vol_shape=(16, 16, 16))
    hub = DataHub(data_dir, task_modalities("lits"),
                  train_split=f"{split_dir}/round1/train.txt",
                  val_split=f"{split_dir}/round1/val.txt",
                  train_batchsize=1, test_batchsize=1, access_type="npy",
                  slide_patch_size=(8, 8, 8), slide_overlap=(2, 2, 2))
    cfg = UResQConfig(num_mod=1, num_classes=3, depth_config=[1, 1, 1],
                      width_config=[4, 8, 4], dilation_config=[1, 1, 1],
                      init_stride=(2, 2, 2), drop_rate=0.0, blk_type="mid",
                      ds=None)
    graph = build_uresq(cfg)
    variables = nnir.init(graph, jax.random.PRNGKey(0))
    return hub, graph, variables


def test_tester_test_as_is_and_snapshot(tmp_path):
    hub, graph, variables = small_setup(tmp_path)
    tester = Tester(graph, variables, hub, num_mo=1, n_class=3,
                    root=str(tmp_path / "t"))
    results = tester.test_as_is("fp")
    assert "val" in results
    assert P.isfile(P.join(str(tmp_path / "t"), "fp", "val_seg.txt"))
    p1 = tester.snapshot("state.pkl")
    p2 = tester.snapshot("state_c.npz", compress=True)
    assert P.isfile(p1) and P.isfile(p2)
    sd = np.load(p2, allow_pickle=True)["state_dict"].item()
    assert "conv0.conv.weight" in sd


def test_run_ptq_multi_volume_batch():
    cfg = UResQConfig(num_mod=1, num_classes=2, depth_config=[1, 1, 1],
                      width_config=[4, 8, 4], dilation_config=[1, 1, 1],
                      init_stride=(2, 2, 2), drop_rate=0.0, blk_type="mid",
                      ds=None, quantize=True, qlvl_w=4, qlvl_act=4)
    graph = build_uresq(cfg)
    variables = nnir.init(graph, jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 8, 1)
                    .astype(np.float32))  # lwq_batchsz = 2
    fg, fv, report = run_ptq(graph, variables, x, task="lits",
                             init_stride=(2, 2, 2),
                             hp=PTQHyperParams(admm_iter=5))
    assert report.output_q.shape[1] == 2
    assert all(np.isfinite(l) for _, l in report.layer_losses)
