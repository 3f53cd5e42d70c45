"""Minimal NIfTI-1 writer/reader roundtrip."""
import numpy as np

from efficientq_tpu.utils.nifti import load_nifti, save_nifti


def test_nifti_roundtrip_gz(tmp_path):
    data = np.random.RandomState(0).randint(0, 5, (7, 9, 11)).astype(np.uint8)
    affine = np.diag([2.0, 2.0, 3.0, 1.0])
    path = str(tmp_path / "x.nii.gz")
    save_nifti(path, data, affine)
    img = load_nifti(path)
    np.testing.assert_array_equal(np.asarray(img.dataobj), data)
    np.testing.assert_allclose(img.affine[:3, :3], affine[:3, :3], atol=1e-6)


def test_nifti_float_and_plain(tmp_path):
    data = np.random.RandomState(1).randn(4, 5, 6).astype(np.float32)
    path = str(tmp_path / "y.nii")
    save_nifti(path, data)
    img = load_nifti(path)
    np.testing.assert_allclose(np.asarray(img.dataobj), data, atol=1e-6)
