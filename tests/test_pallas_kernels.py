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
