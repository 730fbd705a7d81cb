"""Parity tests for the segmentation IID losses against a torch
transcription of the reference math (code/utils/segmentation/IID_losses.py),
plus internal consistency of the box-sum reformulation vs. the conv path."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iic_tpu.ops.iid_seg_loss import (
    IID_segmentation_loss,
    IID_segmentation_loss_uncollapsed,
    displacement_joint_collapsed,
    displacement_joint_dense,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

EPS = sys.float_info.epsilon


def _rand_inputs(rng, n=3, k=4, h=16, w=16):
    def softmax_maps():
        logits = rng.standard_normal((n, k, h, w)).astype(np.float32)
        e = np.exp(logits - logits.max(axis=1, keepdims=True))
        return e / e.sum(axis=1, keepdims=True)

    x1 = softmax_maps()
    x2 = softmax_maps()
    thetas = []
    for _ in range(n):
        a = np.radians(rng.uniform(-20, 20))
        scale = rng.uniform(0.9, 1.1)
        m = np.array([
            [np.cos(a) * scale, -np.sin(a) * scale, 0.0],
            [np.sin(a) * scale, np.cos(a) * scale, 0.0],
        ], dtype=np.float32)
        thetas.append(m)
    affine2_to_1 = np.stack(thetas)
    mask = (rng.uniform(0, 1, (n, h, w)) > 0.2).astype(np.float32)
    return x1, x2, affine2_to_1, mask


def _torch_seg_loss_tensor(x1, x2, aff, mask, lamb, half_t, collapsed=True):
    """Torch transcription of the reference seg loss math (not imported),
    operating on torch tensors so autograd gradients can be compared too.
    The collapsed variant divides by ``float(p.sum())`` — a detached Python
    scalar, exactly as the reference does
    (code/utils/segmentation/IID_losses.py:60-61)."""
    grid = F.affine_grid(aff, x2.shape, align_corners=True)
    x2_inv = F.grid_sample(x2, grid, padding_mode="zeros",
                           align_corners=True)

    bn, k, h, w = x1.shape
    m = mask.view(bn, 1, h, w)
    x1 = x1 * m
    x2_inv = x2_inv * m

    x1p = x1.permute(1, 0, 2, 3).contiguous()
    x2p = x2_inv.permute(1, 0, 2, 3).contiguous()
    p = F.conv2d(x1p, weight=x2p, padding=(half_t, half_t))

    if collapsed:
        p = p.sum(dim=2).sum(dim=2)
        p = p / float(p.sum())
        p = (p + p.t()) / 2.0
        p_i = p.sum(dim=1).unsqueeze(1).clone()
        p_j = p.sum(dim=0).unsqueeze(0).clone()
        p = p.clone()
        p[p < EPS] = EPS
        p_i[p_i < EPS] = EPS
        p_j[p_j < EPS] = EPS
        return (-p * (torch.log(p) - lamb * torch.log(p_i)
                      - lamb * torch.log(p_j))).sum()
    else:
        t_side = 2 * half_t + 1
        p = p.permute(2, 3, 0, 1)
        p = p / p.sum(dim=3, keepdim=True).sum(dim=2, keepdim=True)
        p = (p + p.permute(0, 1, 3, 2)) / 2.0
        p_i = p.sum(dim=2, keepdim=True).repeat(1, 1, k, 1).clone()
        p_j = p.sum(dim=3, keepdim=True).repeat(1, 1, 1, k).clone()
        p = p.clone()
        p[p < EPS] = EPS
        p_i[p_i < EPS] = EPS
        p_j[p_j < EPS] = EPS
        return (-p * (torch.log(p) - lamb * torch.log(p_i)
                      - lamb * torch.log(p_j))).sum() / (t_side * t_side)


def torch_seg_loss(x1, x2, aff, mask, lamb, half_t, collapsed=True):
    loss = _torch_seg_loss_tensor(
        torch.from_numpy(x1), torch.from_numpy(x2), torch.from_numpy(aff),
        torch.from_numpy(mask), lamb, half_t, collapsed=collapsed)
    return float(loss)


def torch_seg_loss_grads(x1, x2, aff, mask, lamb, half_t, collapsed=True):
    """Input gradients of the transcribed reference loss via autograd."""
    x1t = torch.from_numpy(x1).requires_grad_(True)
    x2t = torch.from_numpy(x2).requires_grad_(True)
    loss = _torch_seg_loss_tensor(
        x1t, x2t, torch.from_numpy(aff), torch.from_numpy(mask),
        lamb, half_t, collapsed=collapsed)
    g1, g2 = torch.autograd.grad(loss, (x1t, x2t))
    return g1.numpy(), g2.numpy()


@pytest.mark.parametrize("half_t", [0, 1, 3])
def test_boxsum_equals_dense_sum(half_t):
    rng = np.random.default_rng(0)
    x1, x2, _, _ = _rand_inputs(rng)
    pc = np.asarray(displacement_joint_collapsed(
        jnp.asarray(x1), jnp.asarray(x2), half_t))
    pd = np.asarray(displacement_joint_dense(
        jnp.asarray(x1), jnp.asarray(x2), half_t)).sum(axis=(2, 3))
    np.testing.assert_allclose(pc, pd, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("half_t,lamb", [(0, 1.0), (1, 1.0), (2, 1.5)])
def test_collapsed_loss_matches_torch(half_t, lamb):
    rng = np.random.default_rng(1)
    x1, x2, aff, mask = _rand_inputs(rng)
    ref = torch_seg_loss(x1, x2, aff, mask, lamb, half_t, collapsed=True)
    loss, _ = IID_segmentation_loss(
        jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(aff),
        jnp.asarray(mask), lamb=lamb, half_T_side_dense=half_t,
        half_T_side_sparse_min=0, half_T_side_sparse_max=0)
    np.testing.assert_allclose(float(loss), ref, rtol=2e-4, atol=2e-6)


@pytest.mark.parametrize("half_t,lamb", [(1, 1.0), (2, 1.2)])
def test_uncollapsed_loss_matches_torch(half_t, lamb):
    rng = np.random.default_rng(2)
    x1, x2, aff, mask = _rand_inputs(rng)
    ref = torch_seg_loss(x1, x2, aff, mask, lamb, half_t, collapsed=False)
    loss, _ = IID_segmentation_loss_uncollapsed(
        jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(aff),
        jnp.asarray(mask), lamb=lamb, half_T_side_dense=half_t,
        half_T_side_sparse_min=0, half_T_side_sparse_max=0)
    np.testing.assert_allclose(float(loss), ref, rtol=2e-4, atol=2e-6)


def test_fast_warp_loss_close_to_exact():
    """The TPU-native matmul warp gives a loss within a tight tolerance of
    the exact gather warp (error confined to the 1-px source-boundary
    band)."""
    rng = np.random.default_rng(7)
    x1, x2, aff, mask = _rand_inputs(rng, n=4, k=4, h=32, w=32)
    kwargs = dict(lamb=1.0, half_T_side_dense=2,
                  half_T_side_sparse_min=0, half_T_side_sparse_max=0)
    exact, _ = IID_segmentation_loss(
        jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(aff),
        jnp.asarray(mask), warp_impl="gather", **kwargs)
    fast, _ = IID_segmentation_loss(
        jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(aff),
        jnp.asarray(mask), warp_impl="matmul", **kwargs)
    np.testing.assert_allclose(float(fast), float(exact), rtol=0.02,
                               atol=1e-4)


def test_matmul_warp_identity_exact():
    from iic_tpu.ops.affine import perform_affine_tf
    rng = np.random.default_rng(8)
    data = jnp.asarray(rng.uniform(0, 1, (2, 3, 16, 16)).astype(np.float32))
    ident = jnp.tile(jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]]), (2, 1, 1))
    out = perform_affine_tf(data, ident, impl="matmul")
    np.testing.assert_allclose(np.asarray(out), np.asarray(data), atol=1e-5)


def test_matmul_warp_close_to_gather_on_smooth_maps():
    from iic_tpu.ops.affine import perform_affine_tf
    yy, xx = np.mgrid[0:48, 0:48].astype(np.float32) / 48
    data = np.tile(np.stack([np.sin(3 * xx) * np.cos(2 * yy)])[None],
                   (3, 1, 1, 1)).astype(np.float32)
    rng = np.random.default_rng(9)
    thetas = []
    for _ in range(3):
        ang = np.radians(rng.uniform(-30, 30))
        sh = np.radians(rng.uniform(-10, 10))
        s = rng.uniform(0.8, 1.2)
        thetas.append([[np.cos(ang) * s, -np.sin(ang + sh) * s, 0],
                       [np.sin(ang) * s, np.cos(ang + sh) * s, 0]])
    theta = jnp.asarray(np.array(thetas, np.float32))
    exact = np.asarray(perform_affine_tf(jnp.asarray(data), theta,
                                         impl="gather"))
    fast = np.asarray(perform_affine_tf(jnp.asarray(data), theta,
                                        impl="matmul"))
    diff = np.abs(exact - fast)
    assert diff.mean() < 1e-3  # tiny everywhere except the boundary band
    assert (diff > 0.05).mean() < 0.01  # band covers <1% of pixels


def test_sparse_translation_runs_and_is_finite():
    rng = np.random.default_rng(3)
    x1, x2, aff, mask = _rand_inputs(rng)
    loss, nl = IID_segmentation_loss(
        jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(aff),
        jnp.asarray(mask), lamb=1.0, half_T_side_dense=1,
        half_T_side_sparse_min=1, half_T_side_sparse_max=2,
        key=jax.random.PRNGKey(0))
    assert np.isfinite(float(loss)) and np.isfinite(float(nl))


@pytest.mark.parametrize("collapsed,half_t,lamb",
                         [(True, 0, 1.0), (True, 2, 1.3),
                          (False, 1, 1.0), (False, 2, 1.2)])
def test_seg_loss_input_gradients_match_torch(collapsed, half_t, lamb):
    """Gradient-exact parity: jax.grad of both seg-loss variants equals
    torch autograd of the transcribed reference — incl. the collapsed
    variant's DETACHED normaliser (float(p.sum()), reference
    code/utils/segmentation/IID_losses.py:60-61)."""
    rng = np.random.default_rng(11)
    x1, x2, aff, mask = _rand_inputs(rng, n=2, k=3, h=12, w=12)
    tg1, tg2 = torch_seg_loss_grads(x1, x2, aff, mask, lamb, half_t,
                                    collapsed=collapsed)

    loss_fn = (IID_segmentation_loss if collapsed
               else IID_segmentation_loss_uncollapsed)

    def f(a, b):
        loss, _ = loss_fn(
            a, b, jnp.asarray(aff), jnp.asarray(mask), lamb=lamb,
            half_T_side_dense=half_t, half_T_side_sparse_min=0,
            half_T_side_sparse_max=0)
        return loss

    g1, g2 = jax.grad(f, argnums=(0, 1))(jnp.asarray(x1), jnp.asarray(x2))
    # f32 cancellation in the entropy terms needs an atol floor.
    scale = max(np.abs(tg1).max(), np.abs(tg2).max())
    np.testing.assert_allclose(np.asarray(g1), tg1, rtol=2e-3,
                               atol=2e-4 * scale)
    np.testing.assert_allclose(np.asarray(g2), tg2, rtol=2e-3,
                               atol=2e-4 * scale)


def test_seg_loss_gradients_flow():
    rng = np.random.default_rng(4)
    x1, x2, aff, mask = _rand_inputs(rng, n=2, k=3, h=12, w=12)

    def f(a, b):
        loss, _ = IID_segmentation_loss(
            a, b, jnp.asarray(aff), jnp.asarray(mask), lamb=1.0,
            half_T_side_dense=1, half_T_side_sparse_min=0,
            half_T_side_sparse_max=0)
        return loss

    g1, g2 = jax.grad(f, argnums=(0, 1))(jnp.asarray(x1), jnp.asarray(x2))
    for g in (g1, g2):
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0


def test_seg_loss_jits():
    rng = np.random.default_rng(5)
    x1, x2, aff, mask = _rand_inputs(rng, n=2, k=3, h=12, w=12)
    fn = jax.jit(lambda a, b, c, d: IID_segmentation_loss(
        a, b, c, d, lamb=1.0, half_T_side_dense=1,
        half_T_side_sparse_min=0, half_T_side_sparse_max=0))
    loss, _ = fn(jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(aff),
                 jnp.asarray(mask))
    assert np.isfinite(float(loss))
