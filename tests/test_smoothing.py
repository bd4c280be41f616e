"""Gaussian smoothing parity vs the reference construction (scipy + torch conv)."""

import numpy as np
import pytest

from b2txt_tpu.ops.smoothing import gauss_smooth, kernel_array


def _reference_kernel(std, size):
    from scipy.ndimage import gaussian_filter1d

    inp = np.zeros(size, dtype=np.float32)
    inp[size // 2] = 1
    k = gaussian_filter1d(inp, std)
    valid = np.argwhere(k > 0.01)
    k = k[valid]
    return np.squeeze(k / np.sum(k))


@pytest.mark.parametrize("std,size", [(2.0, 100), (1.0, 100), (3.0, 50), (0.8, 20)])
def test_kernel_matches_scipy_construction(std, size):
    ours = kernel_array(std, size)
    ref = _reference_kernel(std, size)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)


def _reference_smooth(x, std, size, padding):
    import torch
    import torch.nn.functional as F

    k = _reference_kernel(std, size).astype(np.float32)
    kt = torch.tensor(k).view(1, 1, -1)
    B, T, C = x.shape
    xt = torch.tensor(x).permute(0, 2, 1)
    kt = kt.repeat(C, 1, 1)
    out = F.conv1d(xt, kt, padding=padding, groups=C)
    return out.permute(0, 2, 1).numpy()


@pytest.mark.parametrize("padding", ["same", "valid"])
def test_smooth_matches_torch_conv(rng, padding):
    x = rng.standard_normal((3, 57, 16)).astype(np.float32)
    ours = np.asarray(gauss_smooth(x, std=2.0, size=100, padding=padding))
    ref = _reference_smooth(x, 2.0, 100, padding)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_smooth_2d_input(rng):
    x = rng.standard_normal((57, 16)).astype(np.float32)
    out3 = np.asarray(gauss_smooth(x[None], std=2.0, size=100))
    out2 = np.asarray(gauss_smooth(x, std=2.0, size=100))
    np.testing.assert_allclose(out2, out3[0], rtol=1e-6)
