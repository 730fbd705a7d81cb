"""Parity tests for affine_grid / grid_sample against torch (CPU) with
align_corners=True — the torch-0.4 semantics the reference relies on
(code/utils/segmentation/transforms.py:131-143)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iic_tpu.ops.affine import affine_grid, grid_sample, perform_affine_tf

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _rand_theta(rng, n):
    """Random rotation+shear+scale 2x3 matrices like the reference's
    random_affine (code/utils/segmentation/transforms.py:111-121)."""
    thetas = []
    for _ in range(n):
        a = np.radians(rng.uniform(-30, 30))
        shear = np.radians(rng.uniform(-10, 10))
        scale = rng.uniform(0.8, 1.2)
        m = np.array([
            [np.cos(a) * scale, -np.sin(a + shear) * scale, 0.0],
            [np.sin(a) * scale, np.cos(a + shear) * scale, 0.0],
        ], dtype=np.float32)
        thetas.append(m)
    return np.stack(thetas)


@pytest.mark.parametrize("n,c,h,w", [(2, 3, 16, 16), (1, 4, 9, 13),
                                     (3, 1, 32, 32)])
def test_affine_grid_matches_torch(n, c, h, w):
    rng = np.random.default_rng(0)
    theta = _rand_theta(rng, n)
    grid_j = np.asarray(affine_grid(jnp.asarray(theta), (n, c, h, w)))
    grid_t = F.affine_grid(torch.from_numpy(theta),
                           torch.Size((n, c, h, w)),
                           align_corners=True).numpy()
    np.testing.assert_allclose(grid_j, grid_t, atol=1e-5)


@pytest.mark.parametrize("n,c,h,w", [(2, 3, 16, 16), (1, 5, 20, 20),
                                     (4, 2, 15, 17)])
def test_grid_sample_matches_torch(n, c, h, w):
    rng = np.random.default_rng(1)
    data = rng.standard_normal((n, c, h, w)).astype(np.float32)
    theta = _rand_theta(rng, n)

    out_j = np.asarray(
        perform_affine_tf(jnp.asarray(data), jnp.asarray(theta),
                          impl="gather"))

    grid_t = F.affine_grid(torch.from_numpy(theta),
                           torch.Size((n, c, h, w)), align_corners=True)
    out_t = F.grid_sample(torch.from_numpy(data), grid_t,
                          mode="bilinear", padding_mode="zeros",
                          align_corners=True).numpy()
    np.testing.assert_allclose(out_j, out_t, atol=1e-4)


def test_identity_warp_is_identity():
    rng = np.random.default_rng(2)
    data = rng.standard_normal((2, 3, 12, 12)).astype(np.float32)
    theta = np.tile(
        np.array([[1.0, 0, 0], [0, 1.0, 0]], dtype=np.float32), (2, 1, 1))
    out = np.asarray(perform_affine_tf(jnp.asarray(data),
                                       jnp.asarray(theta)))
    np.testing.assert_allclose(out, data, atol=1e-5)


def test_warp_roundtrip_inverse():
    """Warping by A then by inv(A) approximately restores the interior
    (boundary pixels lose mass to zero padding)."""
    yy, xx = np.mgrid[0:48, 0:48].astype(np.float32) / 48.0
    smooth = np.stack([np.sin(3 * xx) * np.cos(2 * yy), xx * yy])
    data = smooth[None].astype(np.float32)  # smooth: bilinear is ~lossless
    a = np.radians(15.0)
    m3 = np.array([[np.cos(a), -np.sin(a), 0],
                   [np.sin(a), np.cos(a), 0],
                   [0, 0, 1]], dtype=np.float32)
    inv = np.linalg.inv(m3).astype(np.float32)
    fwd = jnp.asarray(m3[:2][None])
    bwd = jnp.asarray(inv[:2][None])
    out = perform_affine_tf(perform_affine_tf(jnp.asarray(data), fwd), bwd)
    interior = (slice(None), slice(None), slice(12, 36), slice(12, 36))
    np.testing.assert_allclose(
        np.asarray(out)[interior], data[interior], atol=0.08)


def test_grid_sample_differentiable():
    rng = np.random.default_rng(4)
    data = rng.standard_normal((1, 2, 8, 8)).astype(np.float32)
    theta = _rand_theta(rng, 1)

    def f(d):
        return jnp.sum(perform_affine_tf(d, jnp.asarray(theta)) ** 2)

    g = jax.grad(f)(jnp.asarray(data))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_matmul_exact_matches_gather():
    """affine_warp_matmul_exact: bit-level (fp) parity with the gather
    path in both values and input gradients, on aggressive affines where
    the fast two-pass warp deviates."""
    from iic_tpu.ops.affine import affine_warp_matmul_exact

    rng = np.random.default_rng(7)
    n, c, h, w = 4, 3, 24, 24
    data = jnp.asarray(rng.uniform(0, 1, (n, c, h, w)).astype(np.float32))
    ths = []
    for _ in range(n):
        a = rng.uniform(-0.6, 0.6)
        sh = rng.uniform(-0.2, 0.2)
        s = rng.uniform(0.8, 1.2)
        ths.append([[s * np.cos(a), -np.sin(a) + sh, rng.uniform(-.3, .3)],
                    [np.sin(a), s * np.cos(a), rng.uniform(-.3, .3)]])
    theta = jnp.asarray(np.asarray(ths, np.float32))

    ref = perform_affine_tf(data, theta, impl="gather")
    got = affine_warp_matmul_exact(data, theta)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    g_ref = jax.grad(lambda d: (perform_affine_tf(
        d, theta, impl="gather") ** 2).sum())(data)
    g_got = jax.grad(lambda d: (affine_warp_matmul_exact(
        d, theta) ** 2).sum())(data)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)
