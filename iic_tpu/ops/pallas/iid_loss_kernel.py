"""Fused Pallas TPU kernel for the clustering IID loss.

One pass over the batch: the k x k joint accumulates on the MXU in VMEM
scratch tile-by-tile, and the final grid step performs symmetrise /
normalise / clamp / MI reduction in-register — joint, marginals and both
loss scalars never round-trip to HBM (the pure-XLA path materialises the
joint and the log terms between fusions). Exposed through
``IID_loss(..., impl="pallas")``; numerics identical to the pure-jax path
(same clamping order as the reference, code/utils/cluster/IID_losses.py).

Backward: custom VJP. The k x k adjoint dS is derived analytically from
the saved normalised joint (clamp = stop-grad masks, exactly torch's
masked-assign semantics), then dz/dzt are two (bn, k) matmuls — XLA
handles those optimally.
"""

import sys
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = sys.float_info.epsilon

_TILE_BN = 256


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _fwd_kernel(z_ref, zt_ref, loss_ref, loss_nl_ref, p_ref, t_ref,
                s_acc, *, k, lamb):
    i = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        s_acc[:] = jnp.zeros_like(s_acc)

    s_acc[:] += jax.lax.dot_general(
        z_ref[:], zt_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),  # z^T @ zt
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    @pl.when(i == n - 1)
    def _():
        kp = s_acc.shape[0]
        row_valid = jax.lax.broadcasted_iota(jnp.int32, (kp, kp), 0) < k
        col_valid = jax.lax.broadcasted_iota(jnp.int32, (kp, kp), 1) < k
        valid = row_valid & col_valid

        s = jnp.where(valid, s_acc[:], 0.0)
        s = (s + s.T) / 2.0  # symmetrise
        total = jnp.sum(s)
        p = s / total  # normalise

        p_i = jnp.sum(p, axis=1, keepdims=True)  # (kp, 1)
        p_j = jnp.sum(p, axis=0, keepdims=True)  # (1, kp)

        p_c = jnp.maximum(p, EPS)
        p_i_c = jnp.maximum(p_i, EPS)
        p_j_c = jnp.maximum(p_j, EPS)

        log_p = jnp.log(p_c)
        log_pi = jnp.log(p_i_c)
        log_pj = jnp.log(p_j_c)

        terms = -p_c * (log_p - lamb * log_pj - lamb * log_pi)
        terms_nl = -p_c * (log_p - log_pj - log_pi)
        loss_ref[0, 0] = jnp.sum(jnp.where(valid, terms, 0.0))
        loss_nl_ref[0, 0] = jnp.sum(jnp.where(valid, terms_nl, 0.0))
        p_ref[:] = p
        t_ref[0, 0] = total


def _fwd(z, zt, lamb):
    bn, k = z.shape
    kp = _round_up(k, 128)
    bn_p = _round_up(bn, _TILE_BN)
    zp = jnp.pad(z.astype(jnp.float32), ((0, bn_p - bn), (0, kp - k)))
    ztp = jnp.pad(zt.astype(jnp.float32), ((0, bn_p - bn), (0, kp - k)))

    grid = (bn_p // _TILE_BN,)
    loss, loss_nl, p, total = pl.pallas_call(
        partial(_fwd_kernel, k=k, lamb=lamb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE_BN, kp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_BN, kp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((kp, kp), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((kp, kp), jnp.float32)],
    )(zp, ztp)
    return (loss[0, 0], loss_nl[0, 0]), (p[:k, :k], total[0, 0])


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def iid_loss_fused(z, zt, lamb=1.0):
    """Fused-kernel IID loss: (bn, k) softmax pairs -> (loss, loss_no_lamb).
    Matches ``iic_tpu.ops.iid_loss.IID_loss`` numerics."""
    (loss, loss_nl), _ = _fwd(z, zt, lamb)
    return loss, loss_nl


def _vjp_fwd(z, zt, lamb):
    (loss, loss_nl), (p, total) = _fwd(z, zt, lamb)
    return (loss, loss_nl), (z, zt, p, total)


def _vjp_bwd(lamb, res, g):
    z, zt, p, total = res
    g_loss, g_loss_nl = g

    p_i = jnp.sum(p, axis=1, keepdims=True)
    p_j = jnp.sum(p, axis=0, keepdims=True)
    m = (p >= EPS).astype(jnp.float32)
    mi = (p_i >= EPS).astype(jnp.float32)
    mj = (p_j >= EPS).astype(jnp.float32)
    p_c = jnp.maximum(p, EPS)
    p_i_c = jnp.maximum(p_i, EPS)
    p_j_c = jnp.maximum(p_j, EPS)
    log_p = jnp.log(p_c)
    log_pi = jnp.log(p_i_c)
    log_pj = jnp.log(p_j_c)

    def dl_dp(lam, gscale):
        # direct term through the clamped joint
        d = -(log_p + 1.0 - lam * log_pj - lam * log_pi) * m
        # marginal terms (marginals are sums of the unclamped joint)
        row_sum_pc = jnp.sum(p_c, axis=1, keepdims=True)
        col_sum_pc = jnp.sum(p_c, axis=0, keepdims=True)
        d = d + lam * (row_sum_pc / p_i_c) * mi
        d = d + lam * (col_sum_pc / p_j_c) * mj
        return gscale * d

    dP = dl_dp(lamb, g_loss) + dl_dp(1.0, g_loss_nl)

    # P = sym(S)/T with T = sum(S):
    # dS = (dP + dP^T) / (2 T) - (sum(dP * P)) / T
    inner = jnp.sum(dP * p)
    dS = (dP + dP.T) / (2.0 * total) - inner / total

    dz = jnp.dot(zt.astype(jnp.float32), dS.T,
                 precision=jax.lax.Precision.HIGHEST).astype(z.dtype)
    dzt = jnp.dot(z.astype(jnp.float32), dS,
                  precision=jax.lax.Precision.HIGHEST).astype(zt.dtype)
    return dz, dzt


iid_loss_fused.defvjp(_vjp_fwd, _vjp_bwd)
