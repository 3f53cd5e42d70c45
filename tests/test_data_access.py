"""memmap access + meanstd.txt normalization paths."""
import os
import os.path as P
import pickle

import numpy as np

from efficientq_tpu.data.datahub import DataHub
from efficientq_tpu.data.datasets import SegDataset
from efficientq_tpu.data import transforms as T


def make_memmap_dataset(root):
    os.makedirs(P.join(root, "ct"), exist_ok=True)
    os.makedirs(P.join(root, "seg"), exist_ok=True)
    shapes = {}
    rng = np.random.RandomState(0)
    for sn in ("a", "b"):
        vol = rng.randn(6, 6, 6).astype(np.float32)
        lab = rng.randint(0, 3, (6, 6, 6)).astype(np.uint8)
        vol.tofile(P.join(root, "ct", f"{sn}.dat"))
        lab.tofile(P.join(root, "seg", f"{sn}.dat"))
        shapes[sn] = (6, 6, 6)
    with open(P.join(root, "shapes.pickle"), "wb") as f:
        pickle.dump(shapes, f)
    split = P.join(root, "split.txt")
    with open(split, "w") as f:
        f.write("a\nb\n")
    return split


def test_memmap_access(tmp_path):
    root = str(tmp_path)
    split = make_memmap_dataset(root)
    ds = SegDataset(root, split, ("seg", "ct"), access_type="memmap",
                    transform_fix=T.Compose([T.ToArray()]))
    img, lab = ds[0]
    assert img.shape == (1, 6, 6, 6) and img.dtype == np.float32
    assert lab.shape == (6, 6, 6)


def test_meanstd_txt_applied(tmp_path):
    root = str(tmp_path)
    os.makedirs(P.join(root, "ct"))
    os.makedirs(P.join(root, "seg"))
    vol = np.full((4, 4, 4), 10.0, np.float32)
    np.save(P.join(root, "ct", "a.npy"), vol)
    np.save(P.join(root, "seg", "a.npy"), np.zeros((4, 4, 4), np.uint8))
    with open(P.join(root, "split.txt"), "w") as f:
        f.write("a\n")
    with open(P.join(root, "meanstd.txt"), "w") as f:
        f.write("mean 10.0\nstd 2.0\n")
    hub = DataHub(root, ("seg", "ct"), train_split=P.join(root, "split.txt"),
                  access_type="npy", crop_type=None, rand_flip=None)
    hub.trainseqloader.dataset.use_fix_transform()
    img, _ = next(iter(hub.trainseqloader))
    # (10 - 10) / 2 = 0
    np.testing.assert_allclose(img, 0.0, atol=1e-6)
