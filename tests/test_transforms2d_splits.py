"""2D transform variants + split-generation helpers, oracle-checked against
the reference implementations where importable."""
import os.path as P
import sys

import numpy as np
import pytest

from efficientq_tpu.data import transforms as T
from efficientq_tpu.data.splits import (cross_validation_random_split,
                                        list_join, random_split,
                                        write_split_files)

REF = "/root/reference/src"
HAVE_REF = P.isdir(REF)


def test_pad_center_random_crop2d():
    rng = np.random.default_rng(0)
    img = np.arange(2 * 5 * 6, dtype=np.float32).reshape(2, 5, 6)
    lab = (img[0] > 10).astype(np.int64)
    pimg, plab = T.Pad2d(2)(img, lab)
    assert pimg.shape == (2, 9, 10) and plab.shape == (9, 10)
    cimg, clab = T.CenterCrop2d((3, 4))(img, lab)
    assert cimg.shape == (2, 3, 4) and clab.shape == (3, 4)
    np.testing.assert_array_equal(cimg, img[:, 1:4, 1:5])
    # pad-to-size when target is larger
    big, _ = T.CenterCrop2d((7, 8))(img, lab)
    assert big.shape == (2, 7, 8) and big.sum() == img.sum()
    rimg, rlab = T.RandomCrop2d((3, 3), rng=rng)(img, lab)
    assert rimg.shape == (2, 3, 3) and rlab.shape == (3, 3)
    # image/label windows coincide
    assert ((rimg[0] > 10).astype(np.int64) == rlab).all()


def test_random_rotate2d_pairs_image_and_label():
    rng = np.random.default_rng(3)
    img = np.random.default_rng(0).normal(size=(2, 4, 6)).astype(np.float32)
    lab = (img[0] > 0).astype(np.int64)
    seen = set()
    for _ in range(20):
        rimg, rlab = T.RandomRotate2d(rng=rng)(img, lab)
        seen.add(rimg.shape)
        # rotation applied identically to both
        assert ((rimg[0] > 0).astype(np.int64) == rlab).all()
    assert (2, 4, 6) in seen and (2, 6, 4) in seen


def test_random_flip_black_scale2d():
    rng = np.random.default_rng(1)
    img = np.abs(np.random.default_rng(0).normal(size=(1, 8, 8))) + 1.0
    lab = np.ones((8, 8), np.int64)
    fimg, flab = T.RandomFlip2d(rng=rng)(img, lab)
    assert fimg.shape == img.shape and flab.shape == lab.shape
    bimg, _ = T.RandomBlack2d(max_frac=0.5, rng=rng)(img, lab)
    assert bimg.shape == img.shape and (bimg == 0).sum() >= 0
    simg, slab = T.RandomScaleCrop2d((1.3, 1.3), rng=rng)(img, lab)
    assert simg.shape == img.shape and slab.shape == lab.shape


def test_patch2d_roundtrip_matches_reference():
    """Our grid rule + stitch vs the reference's image_to_patch2d /
    patch_to_image2d on the same tensor."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 13, 11)).astype(np.float32)
    patches = T.image_to_patch2d(x, (6, 5), (2, 2))
    recon = T.patch_to_image2d(x, patches, (6, 5), (2, 2))
    np.testing.assert_allclose(recon, x, atol=1e-6)

    if not HAVE_REF:
        pytest.skip("reference tree not mounted")
    import types

    import torch

    if "pytz" not in sys.modules:
        fake = types.ModuleType("pytz")
        fake.timezone = lambda tz: None
        sys.modules["pytz"] = fake
    sys.path.insert(0, REF)
    try:
        from utils.transforms import image_to_patch2d as ref_split
        from utils.transforms import patch_to_image2d as ref_stitch
    finally:
        sys.path.remove(REF)
    xt = torch.from_numpy(x)
    ref_patches = ref_split(xt, (6, 5), (2, 2))
    assert len(ref_patches) == len(patches)
    for ours, ref in zip(patches, ref_patches):
        np.testing.assert_array_equal(ours, ref.numpy())
    ref_recon = ref_stitch(xt, ref_patches, (6, 5), (2, 2))
    np.testing.assert_allclose(recon, ref_recon.numpy(), atol=1e-6)


def test_random_split_matches_reference():
    files = [f"sub{i:03d}" for i in range(23)]
    ours = random_split(files, (3, 1, 1), seed=7)
    assert sorted(list_join(*ours)) == files
    assert [len(s) for s in ours] == [14, 4, 5]
    if HAVE_REF:
        sys.path.insert(0, REF)
        try:
            import types

            if "pytz" not in sys.modules:
                fake = types.ModuleType("pytz")
                fake.timezone = lambda tz: None
                sys.modules["pytz"] = fake
            from utils.misc import random_split as ref_split
        finally:
            sys.path.remove(REF)
        np.testing.assert_array_equal(
            np.array(ours, dtype=object), np.array(ref_split(files, (3, 1, 1), seed=7), dtype=object))


def test_cross_validation_split_and_writing(tmp_path):
    files = [f"sub{i:03d}" for i in range(12)]
    rounds = cross_validation_random_split(files, num_rounds=3, num_splits=3,
                                           seed=0)
    assert len(rounds) == 3
    for splits in rounds:
        assert sorted(list_join(*splits)) == files
    # every subject is held out (val/test) exactly num_splits-1 times
    # across the rotation
    heldout = list_join(*[list_join(*r[1:]) for r in rounds])
    assert sorted(heldout) == sorted(files * 2)

    write_split_files(str(tmp_path), 1, rounds[0])
    for name in ("train", "val", "test"):
        assert (tmp_path / "round1" / f"{name}.txt").is_file()

    if HAVE_REF:
        sys.path.insert(0, REF)
        try:
            from utils.misc import cross_validation_random_split as ref_cv
        finally:
            sys.path.remove(REF)
        ref = ref_cv(files, 3, 3, seed=0)
        assert rounds == ref
