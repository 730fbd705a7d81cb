"""Sobel filtering parity vs. torch conv2d with the reference's kernels
(code/utils/cluster/transforms.py:47-96)."""

import numpy as np
import jax.numpy as jnp
import pytest

from iic_tpu.ops.sobel import sobel_filter, sobel_process

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def test_sobel_matches_torch():
    rng = np.random.default_rng(0)
    grey = rng.uniform(0, 1, (2, 1, 24, 24)).astype(np.float32)

    out_j = np.asarray(sobel_filter(jnp.asarray(grey)))

    k1 = torch.tensor([[1.0, 0, -1], [2, 0, -2], [1, 0, -1]]).view(1, 1, 3, 3)
    k2 = torch.tensor([[1.0, 2, 1], [0, 0, 0], [-1, -2, -1]]).view(1, 1, 3, 3)
    t = torch.from_numpy(grey)
    dx = F.conv2d(t, k1, padding=1).numpy()
    dy = F.conv2d(t, k2, padding=1).numpy()

    np.testing.assert_allclose(out_j[:, 0:1], dx, atol=1e-5)
    np.testing.assert_allclose(out_j[:, 1:2], dy, atol=1e-5)


def test_sobel_process_channel_layouts():
    rng = np.random.default_rng(1)
    n, h, w = 2, 16, 16

    out = sobel_process(
        jnp.asarray(rng.uniform(0, 1, (n, 1, h, w)).astype(np.float32)),
        include_rgb=False)
    assert out.shape == (n, 2, h, w)

    imgs4 = rng.uniform(0, 1, (n, 4, h, w)).astype(np.float32)
    out = sobel_process(jnp.asarray(imgs4), include_rgb=True)
    assert out.shape == (n, 5, h, w)
    np.testing.assert_allclose(np.asarray(out)[:, :3], imgs4[:, :3])

    out = sobel_process(
        jnp.asarray(rng.uniform(0, 1, (n, 2, h, w)).astype(np.float32)),
        include_rgb=False, using_IR=True)
    assert out.shape == (n, 3, h, w)

    imgs5 = rng.uniform(0, 1, (n, 5, h, w)).astype(np.float32)
    out = sobel_process(jnp.asarray(imgs5), include_rgb=True, using_IR=True)
    assert out.shape == (n, 6, h, w)
    np.testing.assert_allclose(np.asarray(out)[:, :3], imgs5[:, :3])
    np.testing.assert_allclose(np.asarray(out)[:, 5:6], imgs5[:, 4:5])
