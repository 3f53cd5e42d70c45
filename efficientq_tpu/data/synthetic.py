"""Synthetic dataset generator in the reference's on-disk layout.

Creates ``<root>/<modality>/<sn>.npy|.npz`` volumes + split files
(``<split_dir>/round<k>/{train,val,test}.txt``) with blob-shaped lesions so
the full train/PTQ/eval pipeline can be exercised end-to-end without the
real BraTS/LiTS data (whose layout this mimics: seg labels {0,1,2[,4]} and
one or four image modalities)."""
from __future__ import annotations

import os
import os.path as P

import numpy as np


def _blob(shape, center, radius):
    zz, yy, xx = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    dist = ((zz - center[0]) ** 2 + (yy - center[1]) ** 2
            + (xx - center[2]) ** 2) ** 0.5
    return dist <= radius


def make_synthetic_dataset(root, task="lits", n_subjects=4,
                           vol_shape=(32, 32, 32), seed=0, access_type="npy",
                           splits=(0.5, 0.25, 0.25), round_id="1"):
    """Returns (data_dir, split_dir)."""
    rng = np.random.default_rng(seed)
    task = task.lower()
    if task == "brats":
        mods = ["flair", "t1", "t1ce", "t2"]
        labels_vals = [1, 2, 4]
    else:
        mods = ["ct"]
        labels_vals = [1, 2]
    data_dir = P.join(root, "data")
    split_dir = P.join(root, "split")
    os.makedirs(P.join(data_dir, "seg"), exist_ok=True)
    for m in mods:
        os.makedirs(P.join(data_dir, m), exist_ok=True)

    sns = [f"sub{idx:03d}" for idx in range(n_subjects)]
    for sn in sns:
        label = np.zeros(vol_shape, np.uint8)
        # big organ blob + small lesion blob inside
        c1 = [int(rng.integers(s // 3, 2 * s // 3)) for s in vol_shape]
        r1 = int(min(vol_shape) // 3)
        organ = _blob(vol_shape, c1, r1)
        label[organ] = labels_vals[0]
        c2 = [int(np.clip(c + rng.integers(-r1 // 2, r1 // 2 + 1), 0, s - 1))
              for c, s in zip(c1, vol_shape)]
        lesion = _blob(vol_shape, c2, max(2, r1 // 3))
        label[lesion & organ] = labels_vals[1]
        if task == "brats":
            core = _blob(vol_shape, c2, max(1, r1 // 5))
            label[core & organ] = labels_vals[2]

        for m in mods:
            img = rng.standard_normal(vol_shape).astype(np.float32) * 0.1
            img += organ * (1.0 + 0.2 * rng.standard_normal())
            img += lesion * (0.8 + 0.2 * rng.standard_normal())
            # BraTS body mask convention: modality 0 nonzero inside body
            if access_type == "npz":
                np.savez_compressed(P.join(data_dir, m, f"{sn}.npz"), img)
            else:
                np.save(P.join(data_dir, m, f"{sn}.npy"), img)
        if access_type == "npz":
            np.savez_compressed(P.join(data_dir, "seg", f"{sn}.npz"), label)
        else:
            np.save(P.join(data_dir, "seg", f"{sn}.npy"), label)

    # sn -> source-NIfTI map used for affine lookup on export
    # (datahub sn_fn_file; missing files fall back to an identity affine)
    with open(P.join(data_dir, "sn_fn.txt"), "w") as f:
        for sn in sns:
            f.write(f"{sn},{P.join(data_dir, mods[0], sn + '.nii.gz')}\n")

    rdir = P.join(split_dir, f"round{round_id}")
    os.makedirs(rdir, exist_ok=True)
    n_tr = max(1, int(len(sns) * splits[0]))
    n_val = max(1, int(len(sns) * splits[1]))
    parts = {
        "train.txt": sns[:n_tr],
        "val.txt": sns[n_tr:n_tr + n_val] or sns[:1],
        "test.txt": sns[n_tr + n_val:] or sns[-1:],
        # true-test split (label-free inference target); reuse the test
        # subjects — the loader drops the label modality anyway
        "true_test.txt": sns[n_tr + n_val:] or sns[-1:],
    }
    for fname, lst in parts.items():
        with open(P.join(rdir, fname), "w") as f:
            f.write("\n".join(lst) + "\n")
    return data_dir, split_dir


def task_modalities(task: str):
    """Modalities tuple with the label first (definer.py:42,56)."""
    if task.lower() == "brats":
        return ("seg", "flair", "t1", "t1ce", "t2")
    return ("seg", "ct")
