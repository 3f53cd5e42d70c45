"""Native C++ runtime kernels vs NumPy/scipy oracles."""
import numpy as np
import pytest

from efficientq_tpu.data import native
from efficientq_tpu.data.prefetch import PrefetchLoader, device_feed


def test_native_builds_and_loads():
    # g++ is in the image; the library must auto-build
    assert native.available()


def test_sample_mask_voxel_counts_and_membership():
    rng = np.random.RandomState(0)
    mask = rng.rand(10, 12, 14) < 0.1
    n_pos, pos = native.sample_mask_voxel(mask, True, 123)
    n_neg, neg = native.sample_mask_voxel(mask, False, 456)
    assert n_pos == int(mask.sum())
    assert n_neg == int((~mask).sum())
    assert mask[pos]
    assert not mask[neg]


def test_sample_mask_voxel_distribution_roughly_uniform():
    mask = np.zeros((4, 4, 4), bool)
    mask[0, 0, 0] = mask[3, 3, 3] = True
    hits = {True: 0, False: 0}
    for seed in range(200):
        _, c = native.sample_mask_voxel(mask, True, seed * 7 + 1)
        hits[c == (0, 0, 0)] += 1
    assert 40 < hits[True] < 160  # both voxels get sampled


def test_sample_empty_mask():
    mask = np.zeros((4, 4, 4), bool)
    n, c = native.sample_mask_voxel(mask, True, 1)
    assert n == 0 and c is None


def test_zoom3d_linear_close_to_scipy():
    from scipy import ndimage

    rng = np.random.RandomState(1)
    src = rng.rand(9, 10, 11).astype(np.float32)
    out = native.zoom3d(src, (14, 15, 16), order=1)
    assert out.shape == (14, 15, 16)
    ref = ndimage.zoom(src, (14 / 9, 15 / 10, 16 / 11), order=1)
    ref = np.pad(ref, [(0, max(0, t - c)) for t, c in
                       zip((14, 15, 16), ref.shape)])[:14, :15, :16]
    # coordinate conventions differ slightly at edges; interiors must agree
    d = np.abs(out[1:-1, 1:-1, 1:-1] - ref[1:-1, 1:-1, 1:-1])
    assert np.median(d) < 0.1


def test_zoom3d_nearest_preserves_labels():
    src = np.random.RandomState(2).randint(0, 4, (8, 8, 8)).astype(np.uint8)
    out = native.zoom3d(src, (12, 12, 12), order=0)
    assert out.shape == (12, 12, 12)
    assert set(np.unique(out)) <= set(np.unique(src))


def test_prefetch_loader_yields_all_batches():
    batches = [(np.ones((2, 3)) * i, np.zeros(2)) for i in range(7)]

    class L:
        dataset = None

        def __len__(self):
            return len(batches)

        def __iter__(self):
            return iter(batches)

    got = list(PrefetchLoader(L(), depth=2))
    assert len(got) == 7
    np.testing.assert_allclose(got[3][0], batches[3][0])


def test_prefetch_loader_propagates_errors():
    class Bad:
        dataset = None

        def __iter__(self):
            yield (np.zeros(2), np.zeros(2))
            raise ValueError("boom")

    with pytest.raises(ValueError, match="boom"):
        list(PrefetchLoader(Bad()))


def test_device_feed_double_buffers():
    batches = [(np.full((2, 2), i, np.float32),) for i in range(4)]
    out = [np.asarray(b[0]) for b in device_feed(batches)]
    assert len(out) == 4
    np.testing.assert_allclose(out[2], 2.0)
