"""Paired (image, label) transforms, host-side NumPy.

Mirrors src/dataloader/transforms.py.  Images are (C, D, H, W) float32,
labels (D, H, W) integer (or (C', D, H, W) float after a label-split
Lambda).  Transforms are callables (img, label) -> (img, label); random ones
draw from an explicit ``numpy.random.Generator`` for reproducibility.
"""
from __future__ import annotations

import numbers
from typing import Callable, List, Optional

import numpy as np
from scipy import ndimage


def _triple(v):
    if isinstance(v, numbers.Number):
        return (int(v),) * 3
    return tuple(int(x) for x in v)


def crop_size_correct(sp, ep, size):
    """Shift an out-of-range crop window back inside
    (dataloader/transforms.py:29-37)."""
    assert ep - sp <= size, f"Invalid crop size: {sp}..{ep} vs {size}"
    if sp < 0:
        ep -= sp
        sp = 0
    elif ep > size:
        sp -= ep - size
        ep = size
    return sp, ep


def crop(arr: np.ndarray, loc) -> np.ndarray:
    """Crop the inner-most 3 dims with boundary correction."""
    x1, y1, z1, x2, y2, z2 = loc
    s = arr.shape
    x1, x2 = crop_size_correct(x1, x2, s[-3])
    y1, y2 = crop_size_correct(y1, y2, s[-2])
    z1, z2 = crop_size_correct(z1, z2, s[-1])
    return arr[..., x1:x2, y1:y2, z1:z2]


def center_crop(arr: np.ndarray, size) -> np.ndarray:
    """Center crop with zero pad-to-size when smaller
    (dataloader/transforms.py:60-83)."""
    size = _triple(size)
    d, h, w = arr.shape[-3:]
    td, th, tw = size
    if (d, h, w) == (td, th, tw):
        return arr
    pads = []
    for cur, tgt in zip((d, h, w), (td, th, tw)):
        if cur < tgt:
            lo = (tgt - cur) // 2
            pads.append((lo, tgt - cur - lo))
        else:
            pads.append((0, 0))
    if any(p != (0, 0) for p in pads):
        full = [(0, 0)] * (arr.ndim - 3) + pads
        arr = np.pad(arr, full)
        d, h, w = arr.shape[-3:]
    x1, y1, z1 = (d - td) // 2, (h - th) // 2, (w - tw) // 2
    return crop(arr, (x1, y1, z1, x1 + td, y1 + th, z1 + tw))


def crop_centroid(arr: np.ndarray, centroid, size) -> np.ndarray:
    s = [int(x) // 2 for x in size]
    sp = [int(c) - si for c, si in zip(centroid, s)]
    ep = [p + int(sz) for p, sz in zip(sp, size)]
    return crop(arr, (sp[0], sp[1], sp[2], ep[0], ep[1], ep[2]))


class Compose:
    def __init__(self, transforms: List[Callable]):
        self.transforms = list(transforms)

    def __call__(self, img, label):
        for t in self.transforms:
            img, label = t(img, label)
        return img, label


class ToArray:
    """ToTensor analogue: float32 image, int64 label."""

    def __call__(self, img, label):
        return np.asarray(img, np.float32), np.asarray(label, np.int64)


class Normalize:
    """Per-channel (x - mean) / std when provided
    (dataloader/transforms.py:160-178)."""

    def __init__(self, mean=None, std=None):
        self.mean = mean
        self.std = std

    def __call__(self, img, label):
        if self.mean is None:
            return img, label
        img = img.copy()
        if isinstance(self.mean, (list, tuple, np.ndarray)):
            for c, (m, s) in enumerate(zip(self.mean, self.std)):
                img[c] = (img[c] - m) / s
        else:
            img = (img - self.mean) / self.std
        return img, label


class Lambda:
    def __init__(self, fn):
        self.fn = fn

    def __call__(self, img, label):
        return self.fn(img, label)


class Pad:
    """Pad to at least ``size``, centered (dataloader/transforms.py:221-254)."""

    def __init__(self, size, pad_value=0):
        self.size = _triple(size)
        self.pad_value = pad_value

    def __call__(self, img, label):
        d, h, w = img.shape[-3:]
        tgt = [max(c, t) for c, t in zip((d, h, w), self.size)]
        if tuple(tgt) == (d, h, w):
            return img, label
        pads = []
        for cur, t in zip((d, h, w), tgt):
            lo = (t - cur) // 2
            pads.append((lo, t - cur - lo))
        img = np.pad(img, [(0, 0)] * (img.ndim - 3) + pads,
                     constant_values=self.pad_value)
        label = np.pad(label, [(0, 0)] * (label.ndim - 3) + pads)
        return img, label


class CenterCrop:
    def __init__(self, size, size_label=None):
        self.size = _triple(size)
        self.size_label = _triple(size_label) if size_label else self.size

    def __call__(self, img, label):
        return center_crop(img, self.size), center_crop(label, self.size_label)


class RandomCrop:
    def __init__(self, size, rng: Optional[np.random.Generator] = None):
        self.size = _triple(size)
        self.rng = rng or np.random.default_rng()

    def __call__(self, img, label):
        d, h, w = img.shape[-3:]
        td, th, tw = self.size
        assert td <= d and th <= h and tw <= w
        if (d, h, w) == (td, th, tw):
            return img, label
        x1 = int(self.rng.integers(0, d - td + 1))
        y1 = int(self.rng.integers(0, h - th + 1))
        z1 = int(self.rng.integers(0, w - tw + 1))
        loc = (x1, y1, z1, x1 + td, y1 + th, z1 + tw)
        return crop(img, loc), crop(label, loc)


class BalanceCrop:
    """Crop centered on a positive-mask voxel w.p. ``positive_prob``
    (dataloader/transforms.py:429-470)."""

    def __init__(self, positive_prob, img_size, label_size=None,
                 mask_func=None, rng: Optional[np.random.Generator] = None):
        self.prob = positive_prob
        self.img_size = _triple(img_size)
        self.label_size = _triple(label_size) if label_size else self.img_size
        self.mask_func = mask_func or (lambda label: label > 0)
        self.rng = rng or np.random.default_rng()

    def __call__(self, img, label):
        from .native import sample_mask_voxel

        mask = np.asarray(self.mask_func(label))
        seed = int(self.rng.integers(1, 2 ** 62))
        # native single-pass reservoir sampling (NumPy fallback inside)
        n_pos, pos_c = sample_mask_voxel(mask, True, seed)
        n_neg, neg_c = sample_mask_voxel(mask, False, seed + 1)
        if n_pos == 0 and n_neg == 0:
            raise RuntimeError("Invalid patch size.")
        if n_neg == 0:
            is_pos = True
        elif n_pos == 0:
            is_pos = False
        else:
            is_pos = self.rng.random() <= self.prob
        center = (pos_c if is_pos else neg_c)[-3:]  # mask may carry channels
        return (crop_centroid(img, center, self.img_size),
                crop_centroid(label, center, self.label_size))


class RandomFlip:
    """Independent coin-flip per spatial axis
    (dataloader/transforms.py:504-521)."""

    def __init__(self, axis_switch=(1, 1, 1),
                 rng: Optional[np.random.Generator] = None):
        self.axis_switch = axis_switch
        self.rng = rng or np.random.default_rng()

    def __call__(self, img, label):
        for ax_i, on in enumerate(self.axis_switch):
            if on and self.rng.integers(0, 2) == 1:
                axis = ax_i - 3
                img = np.flip(img, axis).copy()
                if label.ndim >= 3:
                    label = np.flip(label, axis).copy()
        return img, label


class RandomScaleCrop:
    """Random zoom then crop (dataloader/transforms.py:539-628): with prob p,
    crop ceil(size/factor) then scipy-zoom to >= size and crop to size; else
    plain random crop."""

    def __init__(self, l_scale, h_scale, size, scale_order=1, p=0.5,
                 rng: Optional[np.random.Generator] = None):
        self.l_scale = l_scale
        self.h_scale = h_scale
        self.size = _triple(size)
        self.order = scale_order
        self.p = p
        self.rng = rng or np.random.default_rng()
        self.crop_only = RandomCrop(size, self.rng)

    def __call__(self, img, label):
        if self.rng.random() >= self.p:
            return self.crop_only(img, label)
        crop_size = np.array(self.size)
        d, h, w = img.shape[-3:]
        fmin = (crop_size[0] / d, crop_size[1] / h, crop_size[2] / w)
        factor = (float(self.rng.uniform(max(self.l_scale, max(fmin)),
                                         self.h_scale)),) * 3
        td, th, tw = [int(np.ceil(x / y)) for x, y in zip(crop_size, factor)]
        x1 = int(self.rng.integers(0, d - td + 1))
        y1 = int(self.rng.integers(0, h - th + 1))
        z1 = int(self.rng.integers(0, w - tw + 1))
        loc = (x1, y1, z1, x1 + td, y1 + th, z1 + tw)
        ip, lp = crop(img, loc), crop(label, loc)
        ip = np.stack([ndimage.zoom(c, factor, order=self.order) for c in ip])
        pmax, pmin = lp.max(), lp.min()
        if lp.ndim == 3:
            lp = ndimage.zoom(lp, factor, order=0)
        else:
            lp = np.stack([ndimage.zoom(c, factor, order=0) for c in lp])
        if self.order >= 2:
            lp = np.clip(lp, pmin, pmax)
        return (crop(ip, (0, 0, 0, *crop_size)).astype(np.float32),
                crop(lp, (0, 0, 0, *crop_size)))


class RandomNoise:
    """Additive Gaussian noise w.p. ``prob``, sigma ~ U(0, max_scale)
    (dataloader/transforms.py:766-778)."""

    def __init__(self, prob, max_scale=0.3,
                 rng: Optional[np.random.Generator] = None):
        self.prob = prob
        self.max_scale = max_scale
        self.rng = rng or np.random.default_rng()

    def __call__(self, img, label):
        if self.rng.random() < self.prob:
            scale = self.max_scale * self.rng.random()
            img = img + self.rng.standard_normal(img.shape).astype(np.float32) * scale
        return img, label


class RandomModalityDropout:
    """Zero whole input channels w.p. drop_rate each (at least one kept),
    rescaling survivors by C/(C-dropped) (dataloader/transforms.py:691-715)."""

    def __init__(self, drop_rate=0.5, rng: Optional[np.random.Generator] = None):
        self.drop_rate = drop_rate
        self.rng = rng or np.random.default_rng()

    def __call__(self, img, label):
        if self.drop_rate <= 0:
            return img, label
        C = img.shape[0]
        flags = self.rng.random(C) < self.drop_rate
        if flags.all():
            flags[int(self.rng.integers(0, C))] = False
        img = img.copy()
        img[flags] = 0.0
        img *= C / (C - flags.sum())
        return img, label


class RandomBlack:
    """Zero a random image patch (dataloader/transforms.py:731-745)."""

    def __init__(self, patch_size, rng: Optional[np.random.Generator] = None):
        self.patch_size = _triple(patch_size)
        self.rng = rng or np.random.default_rng()

    def __call__(self, img, label):
        td, th, tw = self.patch_size
        d, h, w = img.shape[-3:]
        x1 = int(self.rng.integers(0, d - td + 1))
        y1 = int(self.rng.integers(0, h - th + 1))
        z1 = int(self.rng.integers(0, w - tw + 1))
        img = img.copy()
        img[..., x1:x1 + td, y1:y1 + th, z1:z1 + tw] = 0
        return img, label


# ---------------------------------------------------------------------------
# 2D variants (src/utils/transforms.py:245-778,856-910).  Unused by the BraTS
# / LiTS presets (both are 3-D tasks) but part of the reference's transform
# surface.  Images are (C, H, W); labels (H, W) or (C', H, W).
# ---------------------------------------------------------------------------


def _pair(v):
    if isinstance(v, numbers.Number):
        return (int(v),) * 2
    return tuple(int(x) for x in v)


def crop2d(arr: np.ndarray, loc) -> np.ndarray:
    x1, y1, x2, y2 = loc
    s = arr.shape
    x1, x2 = crop_size_correct(x1, x2, s[-2])
    y1, y2 = crop_size_correct(y1, y2, s[-1])
    return arr[..., x1:x2, y1:y2]


def center_crop2d(arr: np.ndarray, size) -> np.ndarray:
    th, tw = _pair(size)
    h, w = arr.shape[-2:]
    if (h, w) == (th, tw):
        return arr
    pads = []
    for cur, tgt in zip((h, w), (th, tw)):
        lo = max(0, (tgt - cur) // 2)
        pads.append((lo, max(0, tgt - cur) - lo))
    if any(p != (0, 0) for p in pads):
        arr = np.pad(arr, [(0, 0)] * (arr.ndim - 2) + pads)
        h, w = arr.shape[-2:]
    x1, y1 = (h - th) // 2, (w - tw) // 2
    return crop2d(arr, (x1, y1, x1 + th, y1 + tw))


class Pad2d:
    """Symmetric zero pad of the two trailing axes (transforms.py:245-282)."""

    def __init__(self, pad):
        self.pad = _pair(pad)

    def __call__(self, img, label):
        ph, pw = self.pad
        pads = [(ph, ph), (pw, pw)]
        img = np.pad(img, [(0, 0)] * (img.ndim - 2) + pads)
        label = np.pad(label, [(0, 0)] * (label.ndim - 2) + pads)
        return img, label


class CenterCrop2d:
    def __init__(self, size):
        self.size = _pair(size)

    def __call__(self, img, label):
        return center_crop2d(img, self.size), center_crop2d(label, self.size)


class RandomCrop2d:
    """Uniform random window, same window on image and label
    (transforms.py:396-470)."""

    def __init__(self, size, rng: Optional[np.random.Generator] = None):
        self.size = _pair(size)
        self.rng = rng or np.random.default_rng()

    def __call__(self, img, label):
        th, tw = self.size
        h, w = img.shape[-2:]
        x1 = int(self.rng.integers(0, max(h - th, 0) + 1))
        y1 = int(self.rng.integers(0, max(w - tw, 0) + 1))
        loc = (x1, y1, x1 + th, y1 + tw)
        return crop2d(img, loc), crop2d(label, loc)


class RandomFlip2d:
    """Independent per-axis flips (transforms.py:521-536)."""

    def __init__(self, flips=(1, 1), rng: Optional[np.random.Generator] = None):
        self.flips = _pair(flips)
        self.rng = rng or np.random.default_rng()

    def __call__(self, img, label):
        for ax_off, enabled in enumerate(self.flips):
            if enabled and self.rng.random() < 0.5:
                ax = -2 + ax_off
                img = np.flip(img, axis=ax)
                label = np.flip(label, axis=ax)
        return np.ascontiguousarray(img), np.ascontiguousarray(label)


class RandomRotate2d:
    """Random multiple-of-90-degree rotation of the trailing 2 axes, same k
    for image and label (transforms.py:678-686 rot90_tensor)."""

    def __init__(self, rng: Optional[np.random.Generator] = None):
        self.rng = rng or np.random.default_rng()

    def __call__(self, img, label):
        k = int(self.rng.integers(0, 4))
        if k == 0:
            return img, label
        return (np.ascontiguousarray(np.rot90(img, k, (-2, -1))),
                np.ascontiguousarray(np.rot90(label, k, (-2, -1))))


class RandomBlack2d:
    """Zero a random sub-rectangle of every channel (transforms.py:733-778)."""

    def __init__(self, max_frac=0.5, rng: Optional[np.random.Generator] = None):
        self.max_frac = float(max_frac)
        self.rng = rng or np.random.default_rng()

    def __call__(self, img, label):
        h, w = img.shape[-2:]
        bh = int(self.rng.integers(0, int(h * self.max_frac) + 1))
        bw = int(self.rng.integers(0, int(w * self.max_frac) + 1))
        if bh and bw:
            x1 = int(self.rng.integers(0, h - bh + 1))
            y1 = int(self.rng.integers(0, w - bw + 1))
            img = img.copy()
            img[..., x1:x1 + bh, y1:y1 + bw] = 0.0
        return img, label


class RandomScaleCrop2d:
    """Random zoom then center crop back to the original size
    (transforms.py:627-677)."""

    def __init__(self, scale_bound=(0.8, 1.25), order=1,
                 rng: Optional[np.random.Generator] = None):
        self.lo, self.hi = scale_bound
        self.order = order
        self.rng = rng or np.random.default_rng()

    def __call__(self, img, label):
        s = float(self.rng.uniform(self.lo, self.hi))
        if abs(s - 1.0) < 1e-3:
            return img, label
        size = img.shape[-2:]
        zoom_img = [1.0] * (img.ndim - 2) + [s, s]
        img = ndimage.zoom(img, zoom_img, order=self.order)
        zoom_lab = [1.0] * (label.ndim - 2) + [s, s]
        label = ndimage.zoom(label, zoom_lab, order=0)
        return center_crop2d(img, size), center_crop2d(label, size)


def grid_starts2d(size: int, patch: int, overlap: int) -> List[int]:
    return list(range(0, size - patch, patch - overlap)) + [size - patch]


def image_to_patch2d(images: np.ndarray, patch_sz, overlap) -> List[np.ndarray]:
    """Overlapped 2D patch grid of a (..., H, W) array
    (transforms.py:856-877)."""
    if patch_sz is None or overlap is None:
        return images
    ph, pw = _pair(patch_sz)
    oh, ow = _pair(overlap)
    h, w = images.shape[-2:]
    return [images[..., j:j + ph, k:k + pw]
            for j in grid_starts2d(h, ph, oh)
            for k in grid_starts2d(w, pw, ow)]


def patch_to_image2d(images: np.ndarray, patch_list, patch_sz, overlap):
    """Sum-and-average stitch of an overlapped 2D patch grid
    (transforms.py:879-910)."""
    if patch_sz is None or overlap is None:
        return images
    ph, pw = _pair(patch_sz)
    oh, ow = _pair(overlap)
    h, w = images.shape[-2:]
    shape = tuple(patch_list[0].shape[:-2]) + (h, w)
    recon = np.zeros(shape, np.float32)
    counter = np.zeros(shape, np.float32)
    idx = 0
    for j in grid_starts2d(h, ph, oh):
        for k in grid_starts2d(w, pw, ow):
            recon[..., j:j + ph, k:k + pw] += patch_list[idx]
            counter[..., j:j + ph, k:k + pw] += 1
            idx += 1
    return recon / counter
