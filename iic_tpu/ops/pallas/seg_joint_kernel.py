"""Fused Pallas TPU kernel for the segmentation displacement joint.

The reference computes the per-displacement joint with a conv whose filters
are activations (code/utils/segmentation/IID_losses.py:125-126):

    P[i, j, u, v] = sum_{n,p,q} x1zp[n,i,p+u-half,q+v-half] * x2[n,j,p,q]

for all T^2 displacements (T = 2*half+1). With k ~ 15 classes the natural
GEMMs are tiny (k x k outputs) and waste the 128x128 MXU. This kernel
reorganises the whole computation into ONE large matrix product

    P[(i,v), (j,u)] = A @ B^T
    A[(i,v), (n,r,q)] = x1pq[n, i, r, q+v]     (column-shifted x1 stack)
    B[(j,u), (n,r,q)] = x2rp[n, j, r-u, q]     (row-shifted x2 stack)

where x1pq is x1 zero-padded by `half` on all sides (rows r over
R = h + 2*half) and x2rp is x2 zero-padded in rows. Both stacked operands
have k*T >= 128 useful rows, so the MXU runs near-dense; the stacks are
built tile-by-tile in VMEM and never touch HBM, and the (kT, kT) joint
accumulates in a VMEM scratch across the whole grid.

Backward is a custom VJP: each input gradient is a T x T-kernel
cross-correlation of the *other* input with the adjoint, evaluated
spectrally (rfft2 / per-frequency einsum / irfft2) like the forward FFT
path in ops/iid_seg_loss.py.

Operand tiles are stored bf16 (f32 accumulation on the MXU) — the same
trade the bf16 trunk makes; parity vs the f32 conv path is ~1e-3 relative.

Measured on the paper shape (n=120, k=15, 128^2, T=21, one v5e chip):
forward 15.4 ms vs 16.7 ms (FFT) vs 120 ms (conv) — the kernel wins the
forward. With backward (training): FFT 33.4 ms vs pallas 41.9 ms — the
spectral VJP pays two extra image-sized FFT sets, so the TRAINING default
stays joint_impl="fft"; profile: the VPU stack-build traffic (~15 GB per
call, 21x read amplification) bounds the kernel, not the MXU (~3.7 ms).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_RB = 8  # contraction row tile (RB in {8,16,32} measured equal; copies dominate)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _joint_kernel(x1_ref, x2_ref, out_ref, a_ref, b_ref, acc,
                  *, k, t, half, w):
    """Grid (n, R_pad // RB). x1_ref: (1, k, R_pad, C_pad) padded x1;
    x2_ref: (1, k, R_pad + 2*half, w) row-padded x2 (both full-height
    blocks, refetched only when n changes). acc: (k*t, k*t) f32."""
    tile = pl.program_id(1)
    first = (pl.program_id(0) == 0) & (tile == 0)
    last = ((pl.program_id(0) == pl.num_programs(0) - 1)
            & (tile == pl.num_programs(1) - 1))

    @pl.when(first)
    def _():
        acc[:] = jnp.zeros_like(acc)

    r0 = tile * _RB

    # Build the shifted stacks for this row tile (VPU copies, VMEM only).
    for i in range(k):
        for v in range(t):
            a_ref[i * t + v] = x1_ref[
                0, i, pl.ds(r0, _RB), pl.ds(v, w)].astype(a_ref.dtype)
    for j in range(k):
        for u in range(t):
            b_ref[j * t + u] = x2_ref[
                0, j, pl.ds(r0 + 2 * half - u, _RB), :].astype(b_ref.dtype)

    # One MXU pass per contraction row: (kT, w) @ (w, kT). (Mosaic's
    # tpu.matmul supports a single contracting dim only.)
    for rb in range(_RB):
        acc[:] += jax.lax.dot_general(
            a_ref[:, rb, :], b_ref[:, rb, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(last)
    def _():
        out_ref[:] = acc[:]


def _joint_pallas_raw(x1, x2, half_t, interpret):
    n, k, h, w = x1.shape
    t = 2 * half_t + 1
    tk = k * t
    r = h + 2 * half_t
    r_pad = _round_up(max(r, _RB), _RB)
    c_pad = _round_up(w + 2 * half_t, 128)

    # x1 zero-padded `half` on all sides (rows to r_pad, cols to c_pad);
    # x2 zero-padded 2*half rows on top (row-shift buffer) and to
    # r_pad + 2*half rows total so every in-kernel slice is in range.
    # Inputs stay f32 — the kernel's dynamic sublane slices need f32
    # (8, 128) tiling (bf16 input blocks fail to compile); the stack
    # copies convert to bf16 so the MXU still runs single-pass.
    x1p = jnp.pad(x1.astype(jnp.float32),
                  ((0, 0), (0, 0), (half_t, r_pad - h - half_t),
                   (half_t, c_pad - w - half_t)))
    x2p = jnp.pad(x2.astype(jnp.float32),
                  ((0, 0), (0, 0), (2 * half_t, r_pad - h), (0, 0)))

    grid = (n, r_pad // _RB)
    out = pl.pallas_call(
        partial(_joint_kernel, k=k, t=t, half=half_t, w=w),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, k, r_pad, c_pad), lambda ni, ti: (ni, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, r_pad + 2 * half_t, w),
                         lambda ni, ti: (ni, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tk, tk), lambda ni, ti: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tk, tk), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tk, _RB, w), jnp.bfloat16),  # A stack tile
            pltpu.VMEM((tk, _RB, w), jnp.bfloat16),  # B stack tile
            pltpu.VMEM((tk, tk), jnp.float32),       # joint accumulator
        ],
        interpret=interpret,
    )(x1p, x2p)

    # P[(i,v),(j,u)] -> (k, k, T, T)
    return jnp.transpose(out.reshape(k, t, k, t), (0, 2, 3, 1))


def _next_fast_len(n):
    from iic_tpu.ops.iid_seg_loss import _next_fast_len as f
    return f(n)


def _kernel_spectrum(g, half_t, s_h, s_w, flip):
    """rfft2 of the T x T kernel g placed so circular correlation equals the
    zero-padded linear one: kpad[(u-half) mod S, (v-half) mod S] = g[u,v]."""
    t = 2 * half_t + 1
    if flip:
        g = g[..., ::-1, ::-1]
    kpad = jnp.zeros(g.shape[:-2] + (s_h, s_w), jnp.float32)
    kpad = kpad.at[..., :t, :t].set(g.astype(jnp.float32))
    kpad = jnp.roll(kpad, (-half_t, -half_t), axis=(-2, -1))
    return jnp.fft.rfft2(kpad)


def _corr_apply_fft(imgs, g, half_t, contract_axis, flip):
    """out[n,b,p,q] = sum_a g[a,b,u,v] * imgs_zp[n,a,p+u-half,q+v-half]
    (contract_axis=0), or summing over g's second axis (contract_axis=1).
    Spectral evaluation; exact for zero-padded linear correlation."""
    n, k, h, w = imgs.shape
    s_h = _next_fast_len(h + 2 * half_t)
    s_w = _next_fast_len(w + 2 * half_t)
    f_im = jnp.fft.rfft2(jnp.pad(imgs.astype(jnp.float32),
                                 ((0, 0), (0, 0), (0, s_h - h),
                                  (0, s_w - w))))
    f_k = _kernel_spectrum(g, half_t, s_h, s_w, flip)
    sub = "ab" if contract_axis == 0 else "ba"
    spec = jnp.einsum(f"nahw,{sub}hw->nbhw", f_im, jnp.conj(f_k))
    out = jnp.fft.irfft2(spec, s=(s_h, s_w))
    return out[..., :h, :w]


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def displacement_joint_dense_pallas(x1, x2, half_t):
    """Drop-in replacement for ``displacement_joint_dense`` (the reference's
    activations-as-filters conv, code/utils/segmentation/IID_losses.py:125)
    with the fused stacked-shift GEMM kernel. Falls back to interpret mode
    off-TPU so CPU tests exercise the identical lowering."""
    interpret = jax.default_backend() != "tpu"
    return _joint_pallas_raw(x1, x2, half_t, interpret)


def _joint_fwd(x1, x2, half_t):
    interpret = jax.default_backend() != "tpu"
    return _joint_pallas_raw(x1, x2, half_t, interpret), (x1, x2)


def _joint_bwd(half_t, res, g):
    x1, x2 = res
    # dx2[n,j,p,q] = sum_{i,u,v} g[i,j,u,v] x1zp[n,i,p+u-half,q+v-half]
    dx2 = _corr_apply_fft(x1, g, half_t, contract_axis=0, flip=False)
    # dx1[n,i,y,x] = sum_{j,u,v} g[i,j,u,v] x2zp[n,j,y-(u-half),x-(v-half)]
    #             = correlation with the (u,v)-flipped kernel
    dx1 = _corr_apply_fft(x2, g, half_t, contract_axis=1, flip=True)
    return dx1.astype(x1.dtype), dx2.astype(x2.dtype)


displacement_joint_dense_pallas.defvjp(_joint_fwd, _joint_bwd)
