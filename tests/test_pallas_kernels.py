"""Fused Pallas IID-loss kernel vs the pure-jax path (CPU interpret mode;
the TPU path is exercised by bench/verify drives)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iic_tpu.ops.iid_loss import IID_loss


def _rand_softmax(rng, bn, k):
    logits = rng.standard_normal((bn, k)).astype(np.float32)
    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    return e / e.sum(axis=1, keepdims=True)


def _fused(z, zt, lamb=1.0):
    from jax.experimental.pallas import tpu as pltpu
    from iic_tpu.ops.pallas import iid_loss_fused

    with pltpu.force_tpu_interpret_mode():
        return iid_loss_fused(jnp.asarray(z), jnp.asarray(zt), lamb)


@pytest.mark.parametrize("bn,k,lamb", [(64, 10, 1.0), (300, 10, 1.3),
                                       (128, 70, 1.0)])
def test_fused_matches_xla(bn, k, lamb):
    rng = np.random.default_rng(0)
    z = _rand_softmax(rng, bn, k)
    zt = _rand_softmax(rng, bn, k)
    ref_loss, ref_nl = IID_loss(jnp.asarray(z), jnp.asarray(zt), lamb=lamb)
    loss, nl = _fused(z, zt, lamb)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(float(nl), float(ref_nl), rtol=1e-5,
                               atol=1e-5)


def test_fused_gradients_match_autodiff():
    from jax.experimental.pallas import tpu as pltpu
    from iic_tpu.ops.pallas import iid_loss_fused

    rng = np.random.default_rng(1)
    z = jnp.asarray(_rand_softmax(rng, 96, 10))
    zt = jnp.asarray(_rand_softmax(rng, 96, 10))

    g_ref = jax.grad(lambda a, b: IID_loss(a, b, lamb=1.2)[0],
                     argnums=(0, 1))(z, zt)
    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(lambda a, b: iid_loss_fused(a, b, 1.2)[0],
                           argnums=(0, 1))(z, zt)
    for a, b in zip(g_ref, g_fused):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-6)


def test_fused_gradients_no_lamb_branch():
    from jax.experimental.pallas import tpu as pltpu
    from iic_tpu.ops.pallas import iid_loss_fused

    rng = np.random.default_rng(2)
    z = jnp.asarray(_rand_softmax(rng, 64, 5))
    zt = jnp.asarray(_rand_softmax(rng, 64, 5))

    g_ref = jax.grad(lambda a: IID_loss(a, zt)[1])(z)
    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(lambda a: iid_loss_fused(a, zt, 1.0)[1])(z)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-6)


# --------------------------- displacement joint (seg) fused GEMM kernel

def _seg_inputs(rng, n=3, k=4, h=12, w=12):
    def sm():
        logits = rng.standard_normal((n, k, h, w)).astype(np.float32)
        e = np.exp(logits - logits.max(axis=1, keepdims=True))
        return e / e.sum(axis=1, keepdims=True)
    return jnp.asarray(sm()), jnp.asarray(sm())


@pytest.mark.parametrize("half_t,k,hw", [(0, 3, 8), (2, 4, 12), (3, 5, 16)])
def test_seg_joint_pallas_matches_conv(half_t, k, hw):
    """Interpret-mode forward parity vs the exact conv formulation
    (reference F.conv2d activations-as-filters semantics). bf16 operand
    tiles -> ~1e-3 relative tolerance."""
    from iic_tpu.ops.iid_seg_loss import displacement_joint_dense
    from iic_tpu.ops.pallas import displacement_joint_dense_pallas
    rng = np.random.default_rng(0)
    x1, x2 = _seg_inputs(rng, n=3, k=k, h=hw, w=hw)
    ref = np.asarray(displacement_joint_dense(x1, x2, half_t))
    got = np.asarray(displacement_joint_dense_pallas(x1, x2, half_t))
    assert got.shape == ref.shape == (k, k, 2 * half_t + 1, 2 * half_t + 1)
    np.testing.assert_allclose(got, ref, rtol=5e-3,
                               atol=5e-3 * ref.max())


def test_seg_joint_pallas_gradients_match_conv_autodiff():
    """The custom VJP (spectral correlations) equals autodiff through the
    conv path for an arbitrary cotangent contraction."""
    from iic_tpu.ops.iid_seg_loss import displacement_joint_dense
    from iic_tpu.ops.pallas import displacement_joint_dense_pallas
    rng = np.random.default_rng(1)
    x1, x2 = _seg_inputs(rng, n=2, k=3, h=10, w=10)
    half_t = 2
    t = 2 * half_t + 1
    w_cot = jnp.asarray(
        rng.standard_normal((3, 3, t, t)).astype(np.float32))

    def scalar_of(joint_fn):
        def f(a, b):
            return jnp.sum(joint_fn(a, b, half_t) * w_cot)
        return jax.grad(f, argnums=(0, 1))

    g1_ref, g2_ref = scalar_of(displacement_joint_dense)(x1, x2)
    g1, g2 = scalar_of(displacement_joint_dense_pallas)(x1, x2)
    scale = float(jnp.abs(g1_ref).max())
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g1_ref),
                               rtol=5e-3, atol=5e-3 * scale)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g2_ref),
                               rtol=5e-3, atol=5e-3 * scale)


def test_uncollapsed_loss_pallas_joint_close_to_conv():
    """joint_impl='pallas' wired through the uncollapsed seg loss: loss and
    gradients track the conv implementation."""
    from iic_tpu.ops.iid_seg_loss import IID_segmentation_loss_uncollapsed
    rng = np.random.default_rng(2)
    x1, x2 = _seg_inputs(rng, n=2, k=3, h=12, w=12)
    a = np.radians(8.0)
    aff = jnp.tile(jnp.asarray(
        [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0]],
        np.float32), (2, 1, 1))
    mask = jnp.ones((2, 12, 12), jnp.float32)

    def loss_with(impl):
        def f(a_, b_):
            loss, _ = IID_segmentation_loss_uncollapsed(
                a_, b_, aff, mask, lamb=1.0, half_T_side_dense=2,
                half_T_side_sparse_min=0, half_T_side_sparse_max=0,
                joint_impl=impl)
            return loss
        return f

    l_ref = float(loss_with("conv")(x1, x2))
    l_pal = float(loss_with("pallas")(x1, x2))
    np.testing.assert_allclose(l_pal, l_ref, rtol=2e-3, atol=1e-5)
    g_ref = jax.grad(loss_with("conv"))(x1, x2)
    g_pal = jax.grad(loss_with("pallas"))(x1, x2)
    scale = float(jnp.abs(g_ref).max())
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=2e-2, atol=2e-2 * scale)
