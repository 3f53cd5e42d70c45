"""Data pipeline: synthetic dataset, datasets/loaders, transforms."""
import numpy as np
import pytest

from efficientq_tpu.data import transforms as T
from efficientq_tpu.data.datahub import DataHub
from efficientq_tpu.data.datasets import Loader, SegDataset
from efficientq_tpu.data.synthetic import make_synthetic_dataset, task_modalities


@pytest.fixture(scope="module")
def lits_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("lits")
    return make_synthetic_dataset(str(root), task="lits", n_subjects=4,
                                  vol_shape=(24, 24, 24))


def test_dataset_and_loader(lits_dir):
    data_dir, split_dir = lits_dir
    ds = SegDataset(data_dir, f"{split_dir}/round1/train.txt",
                    task_modalities("lits"), access_type="npy",
                    transform_fix=T.Compose([T.ToArray()]))
    img, label = ds[0]
    assert img.shape == (1, 24, 24, 24) and img.dtype == np.float32
    assert label.shape == (24, 24, 24) and label.dtype == np.int64
    assert set(np.unique(label)) <= {0, 1, 2}
    loader = Loader(ds, batch_size=2, shuffle=True)
    batches = list(loader)
    assert batches[0][0].shape[0] == 2


def test_datahub_builds_loaders(lits_dir):
    data_dir, split_dir = lits_dir
    hub = DataHub(
        data_dir, task_modalities("lits"),
        train_split=f"{split_dir}/round1/train.txt",
        val_split=f"{split_dir}/round1/val.txt",
        test_split=f"{split_dir}/round1/test.txt",
        train_batchsize=2, test_batchsize=1, access_type="npy",
        crop_type="balance", balance_rate=0.8,
        balance_mask_func=lambda label: label == 2,
        crop_size_img=(16, 16, 16), random_noise_prob=0.5,
        slide_patch_size=(16, 16, 16), slide_overlap=(4, 4, 4))
    assert hub.trainloader is not None and hub.valloader is not None
    img, label = next(iter(hub.trainloader))
    assert img.shape == (2, 1, 16, 16, 16)
    assert label.shape == (2, 16, 16, 16)
    # sequential loader yields full volumes once switched to the fix
    # transform (the calibration-path protocol, src/ptqer.py:86)
    hub.trainseqloader.dataset.use_fix_transform()
    img2, _ = next(iter(hub.trainseqloader))
    assert img2.shape[2:] == (24, 24, 24)
    hub.trainseqloader.dataset.use_random_transform()


def test_center_crop_pads_when_small():
    arr = np.arange(2 * 4 * 4 * 4, dtype=np.float32).reshape(2, 4, 4, 4)
    out = T.center_crop(arr, (8, 8, 8))
    assert out.shape == (2, 8, 8, 8)
    np.testing.assert_allclose(out[:, 2:6, 2:6, 2:6], arr)
    out2 = T.center_crop(arr, (2, 2, 2))
    np.testing.assert_allclose(out2, arr[:, 1:3, 1:3, 1:3])


def test_balance_crop_centers_on_positive():
    rng = np.random.default_rng(0)
    label = np.zeros((16, 16, 16), np.int64)
    label[10, 11, 12] = 2
    img = np.zeros((1, 16, 16, 16), np.float32)
    bc = T.BalanceCrop(1.0, (4, 4, 4), mask_func=lambda l: l == 2,
                       rng=rng)
    ic, lc = bc(img, label)
    assert ic.shape == (1, 4, 4, 4)
    assert (lc == 2).sum() == 1


def test_modality_dropout_keeps_one():
    rng = np.random.default_rng(0)
    t = T.RandomModalityDropout(0.999, rng=rng)
    img = np.ones((4, 4, 4, 4), np.float32)
    out, _ = t(img, np.zeros((4, 4, 4), np.int64))
    kept = (out.reshape(4, -1).sum(1) > 0)
    assert kept.sum() >= 1
    # survivors rescaled by C / kept
    assert np.isclose(out.max(), 4 / kept.sum())


def test_random_scale_crop_shapes():
    rng = np.random.default_rng(3)
    t = T.RandomScaleCrop(0.7, 1.4, (8, 8, 8), scale_order=1, p=1.0, rng=rng)
    img = np.random.default_rng(1).standard_normal((2, 16, 16, 16)).astype(np.float32)
    label = np.random.default_rng(2).integers(0, 3, (16, 16, 16))
    for _ in range(5):
        ic, lc = t(img, label)
        assert ic.shape == (2, 8, 8, 8)
        assert lc.shape == (8, 8, 8)
        assert set(np.unique(lc)) <= {0, 1, 2}


def test_flip_applies_to_both(lits_dir):
    rng = np.random.default_rng(5)
    t = T.RandomFlip((1, 1, 1), rng=rng)
    img = np.random.default_rng(0).standard_normal((1, 4, 4, 4)).astype(np.float32)
    label = (img[0] > 0).astype(np.int64)
    for _ in range(8):
        ic, lc = t(img, label)
        np.testing.assert_array_equal((ic[0] > 0).astype(np.int64), lc)
