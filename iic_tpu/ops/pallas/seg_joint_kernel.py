"""Fused Pallas TPU kernels for the segmentation displacement joint.

The reference computes the per-displacement joint with a conv whose filters
are activations (code/utils/segmentation/IID_losses.py:125-126):

    P[i, j, u, v] = sum_{n,p,q} x1zp[n,i,p+u-half,q+v-half] * x2[n,j,p,q]

for all T^2 displacements (T = 2*half+1). With k ~ 15 classes the natural
GEMMs are tiny (k x k outputs) and waste the 128x128 MXU. These kernels
reorganise the whole computation into ONE large matrix product

    P[(v,i), (u,j)] = A @ B^T
    A[(v,i), (n,r,q)] = x1pq[n, i, r, q+v]     (column-shifted x1 stack)
    B[(u,j), (n,r,q)] = x2rp[n, j, r-u, q]     (row-shifted x2 stack)

where x1pq is x1 zero-padded by `half` on all sides (rows r over
R = h + 2*half) and x2rp is x2 zero-padded in rows. Both stacked operands
have k*T >= 128 useful rows, so the MXU runs near-dense; the stacks are
built tile-by-tile in VMEM and never touch HBM, and the (kT, kT) joint
accumulates in a VMEM scratch across the whole grid. Stack rows are
SHIFT-MAJOR ((v,i) not (i,v)) so each shift is ONE (k, RB, 128) block copy
instead of k separate (RB, 128) copies — the stack build is the kernel's
bandwidth bound, not the MXU.

Mosaic constraint that shapes the layout: a dynamic sublane (row) slice
only lowers when the sliced memref is a SINGLE 128-lane tile wide. The
grid therefore carries a width-tile dimension — every block the kernels
row-slice dynamically is exactly 128 lanes. x1's column-shift window
(128 + 2*half columns) is assembled in scratch from TWO adjacent 128-wide
blocks of the same padded array (aligned row slices, static lane slices),
and the backward's cross-tile column-unshift is a cheap XLA overlap-add
outside the kernel. Inputs of any width work; zero-padding the width is
exact (every extra column pairs a zero on the row-shifted side).

Backward is fused the same way (no spectral fallback): with adjoint
g[i,j,u,v],

    dx1[n,i,y,x] = sum_{j,u,v} g[i,j,u,v] * x2zp[n,j, y-u+half, x-v+half]
    dx2[n,j,y,x] = sum_{i,u,v} g[i,j,u,v] * x1zp[n,i, y+u-half, x+v-half]

both are the SAME computation: build the row-shifted stack of the *other*
input, multiply by the (kT, kT) reordered adjoint (dA = G @ B, one rank-3
dot per row tile), and column-unshift dA into the output. dx2 reuses
the dx1 kernel through the exact symmetry P[i,j,u,v] =
P_swap[j,i,2h-u,2h-v] (swap inputs, flip both displacement axes of g).

Operand tiles are stored bf16 (f32 accumulation on the MXU) — the same
trade the bf16 trunk makes; parity vs the f32 conv path is ~1e-3 relative
for values and gradients.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_RB = 16   # contraction row tile (sublanes)
_WL = 128  # lane tile


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _interpret():
    return jax.default_backend() != "tpu"


def _row_window(half_t, h):
    """Row tiles overlapping [half, half + h) in the padded frame — rows
    outside are all-padding on the column-shifted side (forward: their
    products are zero; backward: their outputs are sliced away), so the
    grid skips them."""
    t_lo = half_t // _RB
    t_hi = -(-(half_t + h) // _RB)
    return t_lo, t_hi


# ------------------------------------------------------------------ forward

def _joint_kernel(x1a_ref, x1b_ref, x2_ref, out_ref, win, a_ref, b_ref, acc,
                  *, k, t, half, t_lo):
    """Grid (n, width-tile, row-tile window).

    x1a/x1b: (1, k, R_pad, 128) — width tiles wt and wt+1 of padded x1;
    x2_ref: (1, k, R_pad + 2*half, 128) row-padded x2 at width tile wt.
    acc: (k*t, k*t) f32, rows (v, i), cols (u, j), accumulated across the
    whole grid."""
    ids = [pl.program_id(d) for d in range(3)]
    first = (ids[0] == 0) & (ids[1] == 0) & (ids[2] == 0)
    last = ((ids[0] == pl.num_programs(0) - 1)
            & (ids[1] == pl.num_programs(1) - 1)
            & (ids[2] == pl.num_programs(2) - 1))

    @pl.when(first)
    def _():
        acc[:] = jnp.zeros_like(acc)

    r0 = (ids[2] + t_lo) * _RB

    # Column-shift window: 128 + 2*half columns of padded x1, from two
    # adjacent lane tiles (aligned dynamic row slices on 128-wide blocks).
    win[:, :, :_WL] = x1a_ref[0, :, pl.ds(r0, _RB), :].astype(win.dtype)
    win[:, :, _WL:] = x1b_ref[0, :, pl.ds(r0, _RB), :].astype(win.dtype)

    # Shift-major stacks: one (k, RB, 128) block copy per shift.
    for v in range(t):
        a_ref[v * k:(v + 1) * k] = win[:, :, v:v + _WL]
    for u in range(t):
        b_ref[u * k:(u + 1) * k] = x2_ref[
            0, :, pl.ds(r0 + 2 * half - u, _RB), :].astype(b_ref.dtype)

    # ONE wide MXU pass per tile: flatten the (rb, q) contraction pair into
    # a single 1024-lane contracting dim (row-major reshape keeps the sum
    # order identical). Mosaic's tpu.matmul takes a single contracting dim
    # only — the rank-2 reshape is how the two-dim contraction lowers.
    acc[:] += jax.lax.dot_general(
        a_ref[:].reshape(a_ref.shape[0], _RB * _WL),
        b_ref[:].reshape(b_ref.shape[0], _RB * _WL),
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
    w_eff = _round_up(w, _WL)
    wt = w_eff // _WL
    # one extra lane tile so the wt+1 block of the shift window is always
    # in range (2*half <= 128 columns spill into it)
    c_pad = w_eff + _WL
    assert 2 * half_t <= _WL, "shift window exceeds one lane tile"

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
                  ((0, 0), (0, 0), (2 * half_t, r_pad - h),
                   (0, w_eff - w)))

    t_lo, t_hi = _row_window(half_t, h)
    grid = (n, wt, t_hi - t_lo)
    out = pl.pallas_call(
        partial(_joint_kernel, k=k, t=t, half=half_t, t_lo=t_lo),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, k, r_pad, _WL),
                         lambda ni, wi, ti: (ni, 0, 0, wi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, r_pad, _WL),
                         lambda ni, wi, ti: (ni, 0, 0, wi + 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, r_pad + 2 * half_t, _WL),
                         lambda ni, wi, ti: (ni, 0, 0, wi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tk, tk), lambda ni, wi, ti: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tk, tk), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((k, _RB, 2 * _WL), jnp.bfloat16),  # shift window
            pltpu.VMEM((tk, _RB, _WL), jnp.bfloat16),     # A stack tile
            pltpu.VMEM((tk, _RB, _WL), jnp.bfloat16),     # B stack tile
            pltpu.VMEM((tk, tk), jnp.float32),            # joint accumulator
        ],
        interpret=interpret,
    )(x1p, x1p, x2p)

    # P[(v,i),(u,j)] -> (k, k, T, T)
    return jnp.transpose(out.reshape(t, k, t, k), (1, 3, 2, 0))


# ----------------------------------------------------------------- backward

def _dgrad_kernel(g_ref, oth_ref, dx_ref, b_ref, dxl,
                  *, k, t, half, t_lo):
    """Input-gradient kernel, grid (n, width-tile, row-tile window).

    g_ref: (kT, kT) bf16 reordered adjoint, rows (v, i), cols (u, j);
    oth_ref: (1, k, R_pad + 2*half, 128) row-padded OTHER input at width
    tile wt. dx_ref out block: (1, 1, k, RB, 2*128) per (n, wt, tile) —
    the LOCAL column-unshifted frame (global column wt*128 + d); adjacent
    width tiles overlap by 2*half and are overlap-added outside.

    dA[(v,i), rb, q] = sum_{(u,j)} g[(v,i),(u,j)] * B[(u,j), rb, q]
    dx[i, rb, d]     = sum_v dA[(v,i), rb, d - v]   (column-unshift)
    """
    r0 = (pl.program_id(2) + t_lo) * _RB

    for u in range(t):
        b_ref[u * k:(u + 1) * k] = oth_ref[
            0, :, pl.ds(r0 + 2 * half - u, _RB), :].astype(b_ref.dtype)

    # ONE wide MXU pass per tile: (kT, kT) @ (kT, RB*128) with the B stack's
    # (rb, q) pair flattened to a single 1024-lane dim (row-major reshape,
    # same element order), reshaped back afterwards. Faster than both the
    # per-rb slice loop (17 ms/call) and the rank-3 dot (9 ms/call). The
    # dot's f32 result is consumed directly as a value by the unshift adds
    # (a bf16 dA scratch round-trip costs ~0.2 ms/call extra, measured).
    da = jax.lax.dot_general(
        g_ref[:], b_ref[:].reshape(b_ref.shape[0], _RB * _WL),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(t * k, _RB, _WL)

    dxl[:] = jnp.zeros_like(dxl)
    for v in range(t):
        dxl[:, :, v:v + _WL] += da[v * k:(v + 1) * k]
    dx_ref[0, 0] = dxl[:]


def _dgrad_pallas(g2d, other, half_t, interpret):
    """d(input) for the column-shifted operand: ``other`` is the row-shifted
    operand (n, k, h, w); ``g2d`` the (kT, kT) reordered adjoint. Returns
    the gradient in the unpadded (n, k, h, w) frame."""
    n, k, h, w = other.shape
    t = 2 * half_t + 1
    tk = k * t
    r = h + 2 * half_t
    r_pad = _round_up(max(r, _RB), _RB)
    w_eff = _round_up(w, _WL)
    wt = w_eff // _WL
    assert 2 * half_t <= _WL, "shift window exceeds one lane tile"

    othp = jnp.pad(other.astype(jnp.float32),
                   ((0, 0), (0, 0), (2 * half_t, r_pad - h),
                    (0, w_eff - w)))

    t_lo, t_hi = _row_window(half_t, h)
    rows = (t_hi - t_lo) * _RB
    out = pl.pallas_call(
        partial(_dgrad_kernel, k=k, t=t, half=half_t, t_lo=t_lo),
        grid=(n, wt, t_hi - t_lo),
        in_specs=[
            pl.BlockSpec((tk, tk), lambda ni, wi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, r_pad + 2 * half_t, _WL),
                         lambda ni, wi, ti: (ni, 0, 0, wi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, k, _RB, 2 * _WL),
                               lambda ni, wi, ti: (ni, wi, 0, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (n, wt, k, rows, 2 * _WL), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tk, _RB, _WL), jnp.bfloat16),  # B stack tile
            pltpu.VMEM((k, _RB, 2 * _WL), jnp.float32),  # local unshift
        ],
        interpret=interpret,
    )(g2d.astype(jnp.bfloat16), othp)

    # Overlap-add the per-width-tile local frames (static Python loop over
    # wt <= a handful of tiles), then slice back to the input frame.
    dxp = jnp.zeros((n, k, rows, w_eff + _WL), jnp.float32)
    for wi in range(wt):
        dxp = dxp.at[:, :, :, wi * _WL:(wi + 2) * _WL].add(out[:, wi])
    lo = half_t - t_lo * _RB
    return dxp[:, :, lo:lo + h, half_t:half_t + w]


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def displacement_joint_dense_pallas(x1, x2, half_t):
    """Drop-in replacement for ``displacement_joint_dense`` (the reference's
    activations-as-filters conv, code/utils/segmentation/IID_losses.py:125)
    with the fused stacked-shift GEMM kernel — forward AND backward. Falls
    back to interpret mode off-TPU so CPU tests exercise the identical
    lowering."""
    return _joint_pallas_raw(x1, x2, half_t, _interpret())


def _joint_fwd(x1, x2, half_t):
    return _joint_pallas_raw(x1, x2, half_t, _interpret()), (x1, x2)


def _joint_bwd(half_t, res, g):
    x1, x2 = res
    t = 2 * half_t + 1
    tk = t * x1.shape[1]
    interpret = _interpret()
    # dx1: G[(v,i),(u,j)] = g[i,j,u,v]; row-shifted operand is x2
    g2d = jnp.transpose(g, (3, 0, 2, 1)).reshape(tk, tk)
    dx1 = _dgrad_pallas(g2d, x2, half_t, interpret)
    # dx2 via the swap symmetry P[i,j,u,v] = P_swap[j,i,2h-u,2h-v]:
    # G_swap[(v',j),(u',i)] = g[i,j,2h-u',2h-v']; row-shifted operand is x1
    gf = g[:, :, ::-1, ::-1]
    g2d_swap = jnp.transpose(gf, (3, 1, 2, 0)).reshape(tk, tk)
    dx2 = _dgrad_pallas(g2d_swap, x1, half_t, interpret)
    return dx1.astype(x1.dtype), dx2.astype(x2.dtype)


displacement_joint_dense_pallas.defvjp(_joint_fwd, _joint_bwd)
