"""Parity tests for the clustering IID loss against an independent numpy
implementation of the reference formulas (code/utils/cluster/IID_losses.py)
and against torch-computed golden values."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iic_tpu.ops.iid_loss import (
    EPS, IID_loss, compute_joint, iid_loss_multihead)


def numpy_reference_iid_loss(x_out, x_tf_out, lamb=1.0):
    """Independent numpy transcription of the reference math
    (outer-product joint, symmetrise, normalise, clamp, MI)."""
    bn, k = x_out.shape
    p = np.zeros((k, k), dtype=np.float64)
    for b in range(bn):
        p += np.outer(x_out[b], x_tf_out[b])
    p = (p + p.T) / 2.0
    p = p / p.sum()
    p_i = p.sum(axis=1, keepdims=True)
    p_j = p.sum(axis=0, keepdims=True)
    p_c = np.maximum(p, EPS)
    p_i = np.maximum(p_i, EPS)
    p_j = np.maximum(p_j, EPS)
    loss = -(p_c * (np.log(p_c) - lamb * np.log(p_j)
                    - lamb * np.log(p_i))).sum()
    loss_no_lamb = -(p_c * (np.log(p_c) - np.log(p_j)
                            - np.log(p_i))).sum()
    return loss, loss_no_lamb


def _rand_softmax(rng, bn, k):
    logits = rng.standard_normal((bn, k)).astype(np.float32)
    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    return e / e.sum(axis=1, keepdims=True)


@pytest.mark.parametrize("bn,k,lamb", [(16, 10, 1.0), (64, 10, 1.3),
                                       (32, 70, 1.0), (8, 3, 2.0)])
def test_iid_loss_matches_reference_formula(bn, k, lamb):
    rng = np.random.default_rng(0)
    x = _rand_softmax(rng, bn, k)
    xt = _rand_softmax(rng, bn, k)

    ref_loss, ref_nl = numpy_reference_iid_loss(x, xt, lamb)
    loss, nl = jax.jit(lambda a, b: IID_loss(a, b, lamb=lamb))(x, xt)

    # MI is a difference of ~O(1) entropies: near-zero results carry f32
    # cancellation error, so use an absolute floor alongside rtol.
    np.testing.assert_allclose(loss, ref_loss, rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(nl, ref_nl, rtol=1e-4, atol=2e-4)


def test_iid_loss_matches_torch_reference_semantics():
    """Golden comparison against the reference formulas executed in torch
    (same ops the reference uses, reimplemented — not imported)."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    x = _rand_softmax(rng, 24, 10)
    xt = _rand_softmax(rng, 24, 10)

    tx, txt = torch.from_numpy(x), torch.from_numpy(xt)
    p = (tx.unsqueeze(2) * txt.unsqueeze(1)).sum(dim=0)
    p = (p + p.t()) / 2.0
    p = p / p.sum()
    p_i = p.sum(dim=1).view(10, 1).expand(10, 10).clone()
    p_j = p.sum(dim=0).view(1, 10).expand(10, 10).clone()
    p = p.clone()
    p[p < EPS] = EPS
    p_i[p_i < EPS] = EPS
    p_j[p_j < EPS] = EPS
    lamb = 1.1
    t_loss = (-p * (torch.log(p) - lamb * torch.log(p_j)
                    - lamb * torch.log(p_i))).sum().item()

    loss, _ = IID_loss(jnp.asarray(x), jnp.asarray(xt), lamb=lamb)
    np.testing.assert_allclose(float(loss), t_loss, rtol=1e-4, atol=5e-5)


def test_joint_properties():
    rng = np.random.default_rng(2)
    x = _rand_softmax(rng, 50, 7)
    xt = _rand_softmax(rng, 50, 7)
    p = np.asarray(compute_joint(jnp.asarray(x), jnp.asarray(xt)))
    np.testing.assert_allclose(p.sum(), 1.0, rtol=1e-6)
    np.testing.assert_allclose(p, p.T, atol=1e-7)
    assert (p >= 0).all()


def test_identical_distributions_maximise_mi():
    """Perfectly confident, perfectly aligned predictions give the most
    negative loss (MI is maximised); uniform predictions give ~0 MI."""
    k, bn = 10, 40
    eye = np.eye(k, dtype=np.float32)[np.arange(bn) % k]
    loss_perfect, _ = IID_loss(jnp.asarray(eye), jnp.asarray(eye))
    uni = np.full((bn, k), 1.0 / k, dtype=np.float32)
    loss_uniform, _ = IID_loss(jnp.asarray(uni), jnp.asarray(uni))
    # loss = -MI (+ entropy terms with lamb=1): perfect clustering is lower.
    assert float(loss_perfect) < float(loss_uniform) - 1.0


def test_gradients_flow():
    rng = np.random.default_rng(3)
    x = _rand_softmax(rng, 16, 5)
    xt = _rand_softmax(rng, 16, 5)

    def f(a):
        loss, _ = IID_loss(a, jnp.asarray(xt))
        return loss

    g = jax.grad(f)(jnp.asarray(x))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_multihead_vmap_matches_loop():
    rng = np.random.default_rng(4)
    h, bn, k = 5, 16, 10
    xs = np.stack([_rand_softmax(rng, bn, k) for _ in range(h)])
    xts = np.stack([_rand_softmax(rng, bn, k) for _ in range(h)])

    mean_loss, mean_nl, per_head = iid_loss_multihead(
        jnp.asarray(xs), jnp.asarray(xts))
    loop_losses = [float(IID_loss(jnp.asarray(xs[i]), jnp.asarray(xts[i]))[0])
                   for i in range(h)]
    np.testing.assert_allclose(np.asarray(per_head), loop_losses,
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(mean_loss), np.mean(loop_losses),
                               rtol=1e-4, atol=1e-6)


def test_global_joint_psum_equals_concat():
    """psum-of-joint across a sharded batch == joint of the full batch."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    devs = jax.devices()
    assert len(devs) == 8
    mesh = Mesh(np.array(devs), ("data",))

    rng = np.random.default_rng(5)
    x = _rand_softmax(rng, 64, 10)
    xt = _rand_softmax(rng, 64, 10)

    def shard_fn(a, b):
        loss, _ = IID_loss(a, b, axis_name="data")
        return loss

    sharded = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("data"), P("data")), out_specs=P())
    loss_sharded = sharded(jnp.asarray(x), jnp.asarray(xt))
    loss_full, _ = IID_loss(jnp.asarray(x), jnp.asarray(xt))
    np.testing.assert_allclose(float(loss_sharded), float(loss_full),
                               rtol=1e-5)
