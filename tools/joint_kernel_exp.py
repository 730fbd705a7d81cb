"""Round-4 experiments for closing the displacement-joint kernel gap.

Candidates measured on the paper shape (n=120, k=15, 128^2, T=21), real
chip:

  E1 conv-bwd:  dx1/dx2 as XLA ``lax.conv`` with the (T, T) reordered
                adjoint as SMALL filters (the favourable conv case — the
                forward's activations-as-filters conv has 128x128 filters
                and is terrible, but the backward's filters are 21x21 with
                k*T = 315 contraction, right in the MXU's lane).
  E2 bf16-fwd:  forward kernel with bf16 operand blocks and fully STATIC
                slices — the row offset moves into the BlockSpec index map
                (three 16-row blocks per tile) so the B-stack build is
                static sublane slices of a (k, 48, 128) window and the
                A-stack build static lane slices, both at half the f32
                copy volume.

Usage: python tools/joint_kernel_exp.py [n k h half_t]
"""

import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from iic_tpu.ops.iid_seg_loss import displacement_joint_dense_fft  # noqa
from iic_tpu.ops.pallas import displacement_joint_dense_pallas  # noqa

_RB = 16
_WL = 128


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _sync(x):
    return np.asarray(x)


def time_fn(fn, *args, iters=20):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


# ------------------------------------------------------------ E1: conv bwd

def bwd_conv(x1, x2, g, half_t):
    """dx1, dx2 via XLA convs with the adjoint as (T, T) filters.

    dx1[n,i,y,x] = sum_{j,u,v} g[i,j,u,v] x2zp[n,j,y-u+h,x-v+h]
                 = conv(x2, rhs=g[:, :, ::-1, ::-1], pad=h)
    dx2[n,j,y,x] = sum_{i,u,v} g[i,j,u,v] x1zp[n,i,y+u-h,x+v-h]
                 = conv(x1, rhs=g.transpose(1,0,2,3), pad=h)
    """
    dn = jax.lax.conv_dimension_numbers(
        x1.shape, (g.shape[0], g.shape[1], g.shape[2], g.shape[3]),
        ("NCHW", "OIHW", "NCHW"))
    dx1 = jax.lax.conv_general_dilated(
        x2, g[:, :, ::-1, ::-1], (1, 1),
        [(half_t, half_t), (half_t, half_t)], dimension_numbers=dn,
        preferred_element_type=jnp.float32)
    dx2 = jax.lax.conv_general_dilated(
        x1, jnp.transpose(g, (1, 0, 2, 3)), (1, 1),
        [(half_t, half_t), (half_t, half_t)], dimension_numbers=dn,
        preferred_element_type=jnp.float32)
    return dx1, dx2


def bwd_conv_bf16(x1, x2, g, half_t):
    dx1, dx2 = bwd_conv(x1.astype(jnp.bfloat16), x2.astype(jnp.bfloat16),
                        g.astype(jnp.bfloat16), half_t)
    return dx1.astype(jnp.float32), dx2.astype(jnp.float32)


# ----------------------------------------------------------- E2: bf16 fwd

def _mm_probe_kernel(out_ref, a2, b2, b2t, acc, *, form):
    """Pure matmul probe on pre-flat scratch (garbage contents): isolates
    the dot's cost from the stack build and the value reshape."""
    ids = [pl.program_id(d) for d in range(3)]
    first = (ids[0] == 0) & (ids[1] == 0) & (ids[2] == 0)
    last = ((ids[0] == pl.num_programs(0) - 1)
            & (ids[1] == pl.num_programs(1) - 1)
            & (ids[2] == pl.num_programs(2) - 1))

    @pl.when(first)
    def _():
        acc[:] = jnp.zeros_like(acc)

    if form == "mk-nk":
        acc[:] += jax.lax.dot_general(
            a2[:], b2[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        acc[:] += jax.lax.dot_general(
            a2[:], b2t[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(last)
    def _():
        out_ref[:] = acc[:]


def mm_probe(n, k, h, half_t, rb, form):
    t = 2 * half_t + 1
    tk = k * t
    t_lo = half_t // rb
    t_hi = -(-(half_t + h) // rb)
    grid = (n, 1, t_hi - t_lo)
    return pl.pallas_call(
        partial(_mm_probe_kernel, form=form),
        grid=grid,
        in_specs=[],
        out_specs=pl.BlockSpec((tk, tk), lambda ni, wi, ti: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tk, tk), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tk, rb * _WL), jnp.bfloat16),
            pltpu.VMEM((tk, rb * _WL), jnp.bfloat16),
            pltpu.VMEM((rb * _WL, tk), jnp.bfloat16),
            pltpu.VMEM((tk, tk), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )()


def _joint_kernel_v2(x1a_ref, x1b_ref, x2a_ref, x2b_ref, x2c_ref, out_ref,
                     win, bwin, a_ref, b_ref, acc, *, k, t, half, rb,
                     mode="full"):
    ids = [pl.program_id(d) for d in range(3)]
    first = (ids[0] == 0) & (ids[1] == 0) & (ids[2] == 0)
    last = ((ids[0] == pl.num_programs(0) - 1)
            & (ids[1] == pl.num_programs(1) - 1)
            & (ids[2] == pl.num_programs(2) - 1))

    @pl.when(first)
    def _():
        acc[:] = jnp.zeros_like(acc)

    # A window: two adjacent 128-lane bf16 blocks, fully aligned copies.
    win[:, :, :_WL] = x1a_ref[0]
    win[:, :, _WL:] = x1b_ref[0]
    # B window: three adjacent rb-row bf16 blocks, aligned copies.
    bwin[:, 0 * rb:1 * rb] = x2a_ref[0]
    bwin[:, 1 * rb:2 * rb] = x2b_ref[0]
    bwin[:, 2 * rb:3 * rb] = x2c_ref[0]

    # Shift-major stacks via STATIC slices.
    if mode != "mm-only":
        for v in range(t):
            shift = v if mode != "aligned-copies" else 0
            a_ref[v * k:(v + 1) * k] = win[:, :, shift:shift + _WL]
        for u in range(t):
            c = (2 * half - u) if mode != "aligned-copies" else rb
            b_ref[u * k:(u + 1) * k] = bwin[:, c:c + rb, :]

    if mode == "copies-only":
        acc[:, :_WL] += a_ref[:, 0, :].astype(jnp.float32)
        acc[:, :_WL] += b_ref[:, 0, :].astype(jnp.float32)
    elif mode == "rank3":
        acc[:] += jax.lax.dot_general(
            a_ref[:], b_ref[:],
            dimension_numbers=(((1, 2), (1, 2)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        acc[:] += jax.lax.dot_general(
            a_ref[:].reshape(a_ref.shape[0], rb * _WL),
            b_ref[:].reshape(b_ref.shape[0], rb * _WL),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(last)
    def _():
        out_ref[:] = acc[:]


def joint_fwd_v2(x1, x2, half_t, mode="full", rb=_RB):
    n, k, h, w = x1.shape
    t = 2 * half_t + 1
    tk = k * t
    r = h + 2 * half_t
    t_lo = half_t // rb
    t_hi = -(-(half_t + h) // rb)
    r_pad = _round_up(max(r, t_hi * rb), rb)
    w_eff = _round_up(w, _WL)
    wt = w_eff // _WL
    c_pad = w_eff + _WL
    assert 2 * half_t <= _WL and 2 * half_t <= 2 * rb

    x1p = jnp.pad(x1.astype(jnp.bfloat16),
                  ((0, 0), (0, 0), (half_t, r_pad - h - half_t),
                   (half_t, c_pad - w - half_t)))
    # x2 padded 2*half rows on top; enough rows so block ti+2 in range.
    x2_rows = (t_hi + 2) * rb
    x2p = jnp.pad(x2.astype(jnp.bfloat16),
                  ((0, 0), (0, 0), (2 * half_t, x2_rows - h - 2 * half_t),
                   (0, w_eff - w)))

    grid = (n, wt, t_hi - t_lo)
    out = pl.pallas_call(
        partial(_joint_kernel_v2, k=k, t=t, half=half_t, rb=rb, mode=mode),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, k, rb, _WL),
                         lambda ni, wi, ti: (ni, 0, ti + t_lo, wi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, rb, _WL),
                         lambda ni, wi, ti: (ni, 0, ti + t_lo, wi + 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, rb, _WL),
                         lambda ni, wi, ti: (ni, 0, ti + t_lo, wi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, rb, _WL),
                         lambda ni, wi, ti: (ni, 0, ti + t_lo + 1, wi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, rb, _WL),
                         lambda ni, wi, ti: (ni, 0, ti + t_lo + 2, wi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tk, tk), lambda ni, wi, ti: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tk, tk), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((k, rb, 2 * _WL), jnp.bfloat16),
            pltpu.VMEM((k, 3 * rb, _WL), jnp.bfloat16),
            pltpu.VMEM((tk, rb, _WL), jnp.bfloat16),
            pltpu.VMEM((tk, rb, _WL), jnp.bfloat16),
            pltpu.VMEM((tk, tk), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(x1p, x1p, x2p, x2p, x2p)

    return jnp.transpose(out.reshape(t, k, t, k), (1, 3, 2, 0))


# ------------------------------------------- V4: slot-split pipelined fwd

def _joint_kernel_v4(x1a_ref, x1b_ref, x2a_ref, x2b_ref, x2c_ref, out_ref,
                     win, bwin, a0, b0, a1, b1, mmout, acc,
                     *, k, t, half, rb):
    """Like v3 but the double-buffer slots are SEPARATE scratch arrays so
    Mosaic's (memref-granular) dependence tracking can overlap the dot on
    slot q with the VPU builds into slot 1-q."""
    ids = [pl.program_id(d) for d in range(3)]
    g1, g2 = pl.num_programs(1), pl.num_programs(2)
    s = (ids[0] * g1 + ids[1]) * g2 + ids[2]
    p = jax.lax.rem(s, 2)
    first = s == 0
    last = ((ids[0] == pl.num_programs(0) - 1) & (ids[1] == g1 - 1)
            & (ids[2] == g2 - 1))

    @pl.when(first)
    def _():
        acc[:] = jnp.zeros_like(acc)

    def dot_of(a_ref, b_ref):
        return jax.lax.dot_general(
            a_ref[:], b_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    # 1) dot on the previous tile's stacks (other slot)
    @pl.when(jnp.logical_not(first) & (p == 1))
    def _():
        mmout[:] = dot_of(a0, b0)

    @pl.when(jnp.logical_not(first) & (p == 0))
    def _():
        mmout[:] = dot_of(a1, b1)

    # 2) build this tile's stacks (VPU) into slot p
    win[:, :, :_WL] = x1a_ref[0]
    win[:, :, _WL:] = x1b_ref[0]
    bwin[:, 0 * rb:1 * rb] = x2a_ref[0]
    bwin[:, 1 * rb:2 * rb] = x2b_ref[0]
    bwin[:, 2 * rb:3 * rb] = x2c_ref[0]

    def build(a_ref, b_ref):
        for v in range(t):
            a_ref[v * k:(v + 1) * k, :] = (
                win[:, :, v:v + _WL].reshape(k, rb * _WL))
        for u in range(t):
            c = 2 * half - u
            b_ref[u * k:(u + 1) * k, :] = (
                bwin[:, c:c + rb, :].reshape(k, rb * _WL))

    @pl.when(p == 0)
    def _():
        build(a0, b0)

    @pl.when(p == 1)
    def _():
        build(a1, b1)

    # 3) accumulate the previous dot
    @pl.when(jnp.logical_not(first))
    def _():
        acc[:] += mmout[:]

    # 4) drain
    @pl.when(last & (p == 0))
    def _():
        out_ref[:] = acc[:] + dot_of(a0, b0)

    @pl.when(last & (p == 1))
    def _():
        out_ref[:] = acc[:] + dot_of(a1, b1)


def joint_fwd_v4(x1, x2, half_t, rb=_RB):
    n, k, h, w = x1.shape
    t = 2 * half_t + 1
    tk = k * t
    r = h + 2 * half_t
    t_lo = half_t // rb
    t_hi = -(-(half_t + h) // rb)
    r_pad = _round_up(max(r, t_hi * rb), rb)
    w_eff = _round_up(w, _WL)
    wt = w_eff // _WL
    c_pad = w_eff + _WL
    assert 2 * half_t <= _WL and 2 * half_t <= 2 * rb

    x1p = jnp.pad(x1.astype(jnp.bfloat16),
                  ((0, 0), (0, 0), (half_t, r_pad - h - half_t),
                   (half_t, c_pad - w - half_t)))
    x2_rows = (t_hi + 2) * rb
    x2p = jnp.pad(x2.astype(jnp.bfloat16),
                  ((0, 0), (0, 0), (2 * half_t, x2_rows - h - 2 * half_t),
                   (0, w_eff - w)))

    grid = (n, wt, t_hi - t_lo)
    out = pl.pallas_call(
        partial(_joint_kernel_v4, k=k, t=t, half=half_t, rb=rb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, k, rb, _WL),
                         lambda ni, wi, ti: (ni, 0, ti + t_lo, wi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, rb, _WL),
                         lambda ni, wi, ti: (ni, 0, ti + t_lo, wi + 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, rb, _WL),
                         lambda ni, wi, ti: (ni, 0, ti + t_lo, wi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, rb, _WL),
                         lambda ni, wi, ti: (ni, 0, ti + t_lo + 1, wi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, rb, _WL),
                         lambda ni, wi, ti: (ni, 0, ti + t_lo + 2, wi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tk, tk), lambda ni, wi, ti: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tk, tk), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((k, rb, 2 * _WL), jnp.bfloat16),
            pltpu.VMEM((k, 3 * rb, _WL), jnp.bfloat16),
            pltpu.VMEM((tk, rb * _WL), jnp.bfloat16),
            pltpu.VMEM((tk, rb * _WL), jnp.bfloat16),
            pltpu.VMEM((tk, rb * _WL), jnp.bfloat16),
            pltpu.VMEM((tk, rb * _WL), jnp.bfloat16),
            pltpu.VMEM((tk, tk), jnp.float32),
            pltpu.VMEM((tk, tk), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(x1p, x1p, x2p, x2p, x2p)

    return jnp.transpose(out.reshape(t, k, t, k), (1, 3, 2, 0))


# --------------------------- V5: 2-unrolled straight-line pipelined fwd

def _joint_kernel_v5(x1a0, x1b0, x2a0, x2b0, x2c0,
                     x1a1, x1b1, x2a1, x2b1, x2c1, out_ref,
                     win0, bwin0, win1, bwin1, a0, b0, a1, b1, mm, acc,
                     *, k, t, half, rb):
    """Two row-tiles per grid step, straight-line (no pl.when around the
    hot ops, distinct scratch memrefs per stage) so the VLIW scheduler can
    bundle MXU passes with the other tile's VPU stack build:

        mm   = dot(a1, b1)     # odd tile built LAST step
        build a0, b0           # even tile (VPU) — overlaps the dot
        acc += mask * mm
        mm   = dot(a0, b0)
        build a1, b1           # odd tile — overlaps the dot
        acc += mm

    The pipeline flows across (n, w) group boundaries (acc is a global
    sum), so only the global first step needs masking and the global last
    step a drain dot."""
    ids = [pl.program_id(d) for d in range(3)]
    g1, g2 = pl.num_programs(1), pl.num_programs(2)
    s = (ids[0] * g1 + ids[1]) * g2 + ids[2]
    first = s == 0
    last = ((ids[0] == pl.num_programs(0) - 1) & (ids[1] == g1 - 1)
            & (ids[2] == g2 - 1))

    @pl.when(first)
    def _():
        # zero acc AND the odd-slot stacks (uninitialised scratch may hold
        # NaN bit patterns; a zeroed stack makes the priming dot a no-op)
        acc[:] = jnp.zeros_like(acc)
        a1[:] = jnp.zeros_like(a1)
        b1[:] = jnp.zeros_like(b1)

    def dot_of(a_ref, b_ref):
        return jax.lax.dot_general(
            a_ref[:], b_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    def build(win, bwin, a_ref, b_ref, x1a, x1b, x2a, x2b, x2c):
        win[:, :, :_WL] = x1a[0]
        win[:, :, _WL:] = x1b[0]
        bwin[:, 0 * rb:1 * rb] = x2a[0]
        bwin[:, 1 * rb:2 * rb] = x2b[0]
        bwin[:, 2 * rb:3 * rb] = x2c[0]
        for v in range(t):
            a_ref[v * k:(v + 1) * k, :] = (
                win[:, :, v:v + _WL].reshape(k, rb * _WL))
        for u in range(t):
            c = 2 * half - u
            b_ref[u * k:(u + 1) * k, :] = (
                bwin[:, c:c + rb, :].reshape(k, rb * _WL))

    mm[:] = dot_of(a1, b1)                   # odd stacks from last step
    build(win0, bwin0, a0, b0, x1a0, x1b0, x2a0, x2b0, x2c0)
    acc[:] += mm[:]
    mm[:] = dot_of(a0, b0)                   # even stacks just built
    build(win1, bwin1, a1, b1, x1a1, x1b1, x2a1, x2b1, x2c1)
    acc[:] += mm[:]

    @pl.when(last)
    def _():
        out_ref[:] = acc[:] + dot_of(a1, b1)


def joint_fwd_v5(x1, x2, half_t, rb=_RB):
    n, k, h, w = x1.shape
    t = 2 * half_t + 1
    tk = k * t
    t_lo = half_t // rb
    t_hi = -(-(half_t + h) // rb)
    nt = t_hi - t_lo
    nt += nt % 2  # even number of row tiles (extra tile is all padding)
    r_pad = _round_up((t_lo + nt) * rb, rb)
    w_eff = _round_up(w, _WL)
    wt = w_eff // _WL
    c_pad = w_eff + _WL
    assert 2 * half_t <= _WL and 2 * half_t <= 2 * rb

    x1p = jnp.pad(x1.astype(jnp.bfloat16),
                  ((0, 0), (0, 0), (half_t, r_pad - h - half_t),
                   (half_t, c_pad - w - half_t)))
    x2_rows = (t_lo + nt + 2) * rb
    x2p = jnp.pad(x2.astype(jnp.bfloat16),
                  ((0, 0), (0, 0), (2 * half_t, x2_rows - h - 2 * half_t),
                   (0, w_eff - w)))

    grid = (n, wt, nt // 2)

    def im(dr, dw=0):
        return lambda ni, wi, ti: (ni, 0, 2 * ti + t_lo + dr, wi + dw)

    out = pl.pallas_call(
        partial(_joint_kernel_v5, k=k, t=t, half=half_t, rb=rb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, k, rb, _WL), im(0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, rb, _WL), im(0, 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, rb, _WL), im(0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, rb, _WL), im(1), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, rb, _WL), im(2), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, rb, _WL), im(1), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, rb, _WL), im(1, 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, rb, _WL), im(1), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, rb, _WL), im(2), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, rb, _WL), im(3), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tk, tk), lambda ni, wi, ti: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tk, tk), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((k, rb, 2 * _WL), jnp.bfloat16),
            pltpu.VMEM((k, 3 * rb, _WL), jnp.bfloat16),
            pltpu.VMEM((k, rb, 2 * _WL), jnp.bfloat16),
            pltpu.VMEM((k, 3 * rb, _WL), jnp.bfloat16),
            pltpu.VMEM((tk, rb * _WL), jnp.bfloat16),
            pltpu.VMEM((tk, rb * _WL), jnp.bfloat16),
            pltpu.VMEM((tk, rb * _WL), jnp.bfloat16),
            pltpu.VMEM((tk, rb * _WL), jnp.bfloat16),
            pltpu.VMEM((tk, tk), jnp.float32),
            pltpu.VMEM((tk, tk), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(x1p, x1p, x2p, x2p, x2p, x1p, x1p, x2p, x2p, x2p)

    return jnp.transpose(out.reshape(t, k, t, k), (1, 3, 2, 0))


# --------------------------------------------------- V3: pipelined forward

def _joint_kernel_v3(x1a_ref, x1b_ref, x2a_ref, x2b_ref, x2c_ref, out_ref,
                     win, bwin, a2, b2, mmout, acc, *, k, t, half, rb,
                     flat):
    """Software-pipelined: the dot for the PREVIOUS tile's stacks issues
    first (MXU crunches asynchronously), then the VPU builds THIS tile's
    stacks into the other buffer slot, then the previous dot's result is
    accumulated. Stack buffers are double-buffered on step parity."""
    ids = [pl.program_id(d) for d in range(3)]
    g1, g2 = pl.num_programs(1), pl.num_programs(2)
    s = (ids[0] * g1 + ids[1]) * g2 + ids[2]
    p = jax.lax.rem(s, 2)
    first = s == 0
    last = ((ids[0] == pl.num_programs(0) - 1) & (ids[1] == g1 - 1)
            & (ids[2] == g2 - 1))

    @pl.when(first)
    def _():
        acc[:] = jnp.zeros_like(acc)

    def dot_slot(q):
        if flat:
            return jax.lax.dot_general(
                a2[q], b2[q], dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        return jax.lax.dot_general(
            a2[q].reshape(a2.shape[1], rb * _WL),
            b2[q].reshape(b2.shape[1], rb * _WL),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    # 1) issue the dot on the previous tile's stacks (slot 1-p)
    @pl.when(jnp.logical_not(first))
    def _():
        mmout[:] = dot_slot(1 - p)

    # 2) build this tile's stacks into slot p (VPU, overlaps the MXU)
    win[:, :, :_WL] = x1a_ref[0]
    win[:, :, _WL:] = x1b_ref[0]
    bwin[:, 0 * rb:1 * rb] = x2a_ref[0]
    bwin[:, 1 * rb:2 * rb] = x2b_ref[0]
    bwin[:, 2 * rb:3 * rb] = x2c_ref[0]
    for v in range(t):
        val = win[:, :, v:v + _WL]
        if flat:
            a2[p, v * k:(v + 1) * k, :] = val.reshape(k, rb * _WL)
        else:
            a2[p, v * k:(v + 1) * k] = val
    for u in range(t):
        c = 2 * half - u
        val = bwin[:, c:c + rb, :]
        if flat:
            b2[p, u * k:(u + 1) * k, :] = val.reshape(k, rb * _WL)
        else:
            b2[p, u * k:(u + 1) * k] = val

    # 3) accumulate the previous dot
    @pl.when(jnp.logical_not(first))
    def _():
        acc[:] += mmout[:]

    # 4) drain at the end: dot + accumulate this tile's stacks too
    @pl.when(last)
    def _():
        out_ref[:] = acc[:] + dot_slot(p)


def joint_fwd_v3(x1, x2, half_t, rb=_RB, flat=True):
    n, k, h, w = x1.shape
    t = 2 * half_t + 1
    tk = k * t
    r = h + 2 * half_t
    t_lo = half_t // rb
    t_hi = -(-(half_t + h) // rb)
    r_pad = _round_up(max(r, (t_hi + 1) * rb), rb)
    w_eff = _round_up(w, _WL)
    wt = w_eff // _WL
    c_pad = w_eff + _WL
    assert 2 * half_t <= _WL and 2 * half_t <= 2 * rb

    x1p = jnp.pad(x1.astype(jnp.bfloat16),
                  ((0, 0), (0, 0), (half_t, r_pad - h - half_t),
                   (half_t, c_pad - w - half_t)))
    x2_rows = (t_hi + 2) * rb
    x2p = jnp.pad(x2.astype(jnp.bfloat16),
                  ((0, 0), (0, 0), (2 * half_t, x2_rows - h - 2 * half_t),
                   (0, w_eff - w)))

    stack_shape = ((2, tk, rb * _WL) if flat else (2, tk, rb, _WL))
    grid = (n, wt, t_hi - t_lo)
    out = pl.pallas_call(
        partial(_joint_kernel_v3, k=k, t=t, half=half_t, rb=rb, flat=flat),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, k, rb, _WL),
                         lambda ni, wi, ti: (ni, 0, ti + t_lo, wi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, rb, _WL),
                         lambda ni, wi, ti: (ni, 0, ti + t_lo, wi + 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, rb, _WL),
                         lambda ni, wi, ti: (ni, 0, ti + t_lo, wi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, rb, _WL),
                         lambda ni, wi, ti: (ni, 0, ti + t_lo + 1, wi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, rb, _WL),
                         lambda ni, wi, ti: (ni, 0, ti + t_lo + 2, wi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tk, tk), lambda ni, wi, ti: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tk, tk), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((k, rb, 2 * _WL), jnp.bfloat16),
            pltpu.VMEM((k, 3 * rb, _WL), jnp.bfloat16),
            pltpu.VMEM(stack_shape, jnp.bfloat16),
            pltpu.VMEM(stack_shape, jnp.bfloat16),
            pltpu.VMEM((tk, tk), jnp.float32),
            pltpu.VMEM((tk, tk), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(x1p, x1p, x2p, x2p, x2p)

    return jnp.transpose(out.reshape(t, k, t, k), (1, 3, 2, 0))


# ------------------ V8: current kernels, parametrised row-tile size (rb)

def _joint_kernel_v8(x1a_ref, x1b_ref, x2_ref, out_ref, win, a_ref, b_ref,
                     acc, *, k, t, half, t_lo, rb, direct_acc):
    ids = [pl.program_id(d) for d in range(3)]
    first = (ids[0] == 0) & (ids[1] == 0) & (ids[2] == 0)
    last = ((ids[0] == pl.num_programs(0) - 1)
            & (ids[1] == pl.num_programs(1) - 1)
            & (ids[2] == pl.num_programs(2) - 1))

    @pl.when(first)
    def _():
        acc[:] = jnp.zeros_like(acc)

    r0 = (ids[2] + t_lo) * rb
    win[:, :, :_WL] = x1a_ref[0, :, pl.ds(r0, rb), :].astype(win.dtype)
    win[:, :, _WL:] = x1b_ref[0, :, pl.ds(r0, rb), :].astype(win.dtype)
    for v in range(t):
        a_ref[v * k:(v + 1) * k] = win[:, :, v:v + _WL]
    for u in range(t):
        b_ref[u * k:(u + 1) * k] = x2_ref[
            0, :, pl.ds(r0 + 2 * half - u, rb), :].astype(b_ref.dtype)

    acc[:] += jax.lax.dot_general(
        a_ref[:].reshape(a_ref.shape[0], rb * _WL),
        b_ref[:].reshape(b_ref.shape[0], rb * _WL),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(last)
    def _():
        out_ref[:] = acc[:]


def joint_fwd_v8(x1, x2, half_t, rb=16):
    n, k, h, w = x1.shape
    t = 2 * half_t + 1
    tk = k * t
    t_lo = half_t // rb
    t_hi = -(-(half_t + h) // rb)
    r_pad = _round_up(max(h + 2 * half_t, (t_hi) * rb), rb)
    w_eff = _round_up(w, _WL)
    wt = w_eff // _WL
    c_pad = w_eff + _WL
    assert 2 * half_t <= _WL and 2 * half_t <= 2 * rb

    x1p = jnp.pad(x1.astype(jnp.float32),
                  ((0, 0), (0, 0), (half_t, r_pad - h - half_t),
                   (half_t, c_pad - w - half_t)))
    x2p = jnp.pad(x2.astype(jnp.float32),
                  ((0, 0), (0, 0), (2 * half_t, r_pad - h),
                   (0, w_eff - w)))

    grid = (n, wt, t_hi - t_lo)
    out = pl.pallas_call(
        partial(_joint_kernel_v8, k=k, t=t, half=half_t, t_lo=t_lo, rb=rb,
                direct_acc=False),
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
            pltpu.VMEM((k, rb, 2 * _WL), jnp.bfloat16),
            pltpu.VMEM((tk, rb, _WL), jnp.bfloat16),
            pltpu.VMEM((tk, rb, _WL), jnp.bfloat16),
            pltpu.VMEM((tk, tk), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(x1p, x1p, x2p)

    return jnp.transpose(out.reshape(t, k, t, k), (1, 3, 2, 0))


def _dgrad_kernel_v8(g_ref, oth_ref, dx_ref, b_ref, dxl,
                     *, k, t, half, t_lo, rb):
    """Like the current dgrad kernel but (a) parametrised rb and (b) the
    dot result is consumed directly as a value (no bf16 dA scratch
    round-trip)."""
    r0 = (pl.program_id(2) + t_lo) * rb

    for u in range(t):
        b_ref[u * k:(u + 1) * k] = oth_ref[
            0, :, pl.ds(r0 + 2 * half - u, rb), :].astype(b_ref.dtype)

    da = jax.lax.dot_general(
        g_ref[:], b_ref[:].reshape(b_ref.shape[0], rb * _WL),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(t * k, rb, _WL)

    dxl[:] = jnp.zeros_like(dxl)
    for v in range(t):
        dxl[:, :, v:v + _WL] += da[v * k:(v + 1) * k]
    dx_ref[0, 0] = dxl[:]


def dgrad_v8(g2d, other, half_t, rb=16):
    n, k, h, w = other.shape
    t = 2 * half_t + 1
    tk = k * t
    t_lo = half_t // rb
    t_hi = -(-(half_t + h) // rb)
    r_pad = _round_up(max(h + 2 * half_t, t_hi * rb), rb)
    w_eff = _round_up(w, _WL)
    wt = w_eff // _WL
    assert 2 * half_t <= _WL and 2 * half_t <= 2 * rb

    othp = jnp.pad(other.astype(jnp.float32),
                   ((0, 0), (0, 0), (2 * half_t, r_pad - h),
                    (0, w_eff - w)))

    rows = (t_hi - t_lo) * rb
    out = pl.pallas_call(
        partial(_dgrad_kernel_v8, k=k, t=t, half=half_t, t_lo=t_lo, rb=rb),
        grid=(n, wt, t_hi - t_lo),
        in_specs=[
            pl.BlockSpec((tk, tk), lambda ni, wi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, r_pad + 2 * half_t, _WL),
                         lambda ni, wi, ti: (ni, 0, 0, wi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, k, rb, 2 * _WL),
                               lambda ni, wi, ti: (ni, wi, 0, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (n, wt, k, rows, 2 * _WL), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tk, rb, _WL), jnp.bfloat16),
            pltpu.VMEM((k, rb, 2 * _WL), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(g2d.astype(jnp.bfloat16), othp)

    dxp = jnp.zeros((n, k, rows, w_eff + _WL), jnp.float32)
    for wi in range(wt):
        dxp = dxp.at[:, :, :, wi * _WL:(wi + 2) * _WL].add(out[:, wi])
    lo = half_t - t_lo * rb
    return dxp[:, :, lo:lo + h, half_t:half_t + w]


def bwd_v8(g, x1, x2, half_t, rb=16):
    t = 2 * half_t + 1
    tk = t * x1.shape[1]
    g2d = jnp.transpose(g, (3, 0, 2, 1)).reshape(tk, tk)
    dx1 = dgrad_v8(g2d, x2, half_t, rb=rb)
    gf = g[:, :, ::-1, ::-1]
    g2d_swap = jnp.transpose(gf, (3, 1, 2, 0)).reshape(tk, tk)
    dx2 = dgrad_v8(g2d_swap, x1, half_t, rb=rb)
    return dx1, dx2


# ------------------- V6: current layout + 2-unroll straight-line pipeline

def _joint_kernel_v6(x1a_ref, x1b_ref, x2_ref, out_ref,
                     win0, win1, a0, b0, a1, b1, mm, acc,
                     *, k, t, half, t_lo, roll_build):
    """Current kernel's memory layout (whole padded arrays as blocks,
    dynamic in-kernel row slices) with TWO row tiles per grid step and a
    straight-line software pipeline: the dot on the stacks built last
    statement overlaps the next stacks' VPU build."""
    ids = [pl.program_id(d) for d in range(3)]
    g1, g2 = pl.num_programs(1), pl.num_programs(2)
    s = (ids[0] * g1 + ids[1]) * g2 + ids[2]
    first = s == 0
    last = ((ids[0] == pl.num_programs(0) - 1) & (ids[1] == g1 - 1)
            & (ids[2] == g2 - 1))

    @pl.when(first)
    def _():
        acc[:] = jnp.zeros_like(acc)
        a1[:] = jnp.zeros_like(a1)
        b1[:] = jnp.zeros_like(b1)

    def dot_of(a_ref, b_ref):
        return jax.lax.dot_general(
            a_ref[:].reshape(a_ref.shape[0], _RB * _WL),
            b_ref[:].reshape(b_ref.shape[0], _RB * _WL),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    def build(win, a_ref, b_ref, r0):
        win[:, :, :_WL] = x1a_ref[0, :, pl.ds(r0, _RB), :].astype(win.dtype)
        win[:, :, _WL:] = x1b_ref[0, :, pl.ds(r0, _RB), :].astype(win.dtype)
        if roll_build:
            # incremental lane-roll: A[v] = roll(A[v-1], -1 lane) with the
            # last lane patched from the window
            a_ref[0:k] = win[:, :, 0:_WL]
            lane = jax.lax.broadcasted_iota(jnp.int32, (k, _RB, _WL), 2)
            for v in range(1, t):
                rolled = pltpu.roll(a_ref[(v - 1) * k:v * k], shift=-1,
                                    axis=2)
                patch = win[:, :, v + _WL - 1:v + _WL]
                a_ref[v * k:(v + 1) * k] = jnp.where(
                    lane == _WL - 1, patch, rolled)
        else:
            for v in range(t):
                a_ref[v * k:(v + 1) * k] = win[:, :, v:v + _WL]
        for u in range(t):
            b_ref[u * k:(u + 1) * k] = x2_ref[
                0, :, pl.ds(r0 + 2 * half - u, _RB), :].astype(b_ref.dtype)

    r0 = (2 * ids[2] + t_lo) * _RB
    mm[:] = dot_of(a1, b1)               # odd stacks from the PREVIOUS step
    build(win0, a0, b0, r0)
    acc[:] += mm[:]
    mm[:] = dot_of(a0, b0)
    build(win1, a1, b1, r0 + _RB)
    acc[:] += mm[:]

    @pl.when(last)
    def _():
        out_ref[:] = acc[:] + dot_of(a1, b1)


def joint_fwd_v6(x1, x2, half_t, roll_build=False):
    n, k, h, w = x1.shape
    t = 2 * half_t + 1
    tk = k * t
    t_lo = half_t // _RB
    t_hi = -(-(half_t + h) // _RB)
    nt = t_hi - t_lo
    nt += nt % 2
    r_pad = _round_up((t_lo + nt) * _RB, _RB)
    w_eff = _round_up(w, _WL)
    wt = w_eff // _WL
    c_pad = w_eff + _WL
    assert 2 * half_t <= _WL

    x1p = jnp.pad(x1.astype(jnp.float32),
                  ((0, 0), (0, 0), (half_t, r_pad - h - half_t),
                   (half_t, c_pad - w - half_t)))
    x2p = jnp.pad(x2.astype(jnp.float32),
                  ((0, 0), (0, 0), (2 * half_t, r_pad - h),
                   (0, w_eff - w)))

    grid = (n, wt, nt // 2)
    out = pl.pallas_call(
        partial(_joint_kernel_v6, k=k, t=t, half=half_t, t_lo=t_lo,
                roll_build=roll_build),
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
            pltpu.VMEM((k, _RB, 2 * _WL), jnp.bfloat16),
            pltpu.VMEM((k, _RB, 2 * _WL), jnp.bfloat16),
            pltpu.VMEM((tk, _RB, _WL), jnp.bfloat16),
            pltpu.VMEM((tk, _RB, _WL), jnp.bfloat16),
            pltpu.VMEM((tk, _RB, _WL), jnp.bfloat16),
            pltpu.VMEM((tk, _RB, _WL), jnp.bfloat16),
            pltpu.VMEM((tk, tk), jnp.float32),
            pltpu.VMEM((tk, tk), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(x1p, x1p, x2p)

    return jnp.transpose(out.reshape(t, k, t, k), (1, 3, 2, 0))


# --------------------------------------------- V7: fused dx1+dx2 backward

def _dgrad_kernel_v7(g1_ref, g2_ref, x1_ref, x2_ref, dx1_ref, dx2_ref,
                     b1_ref, b2_ref, da1, da2, dxl1, dxl2,
                     *, k, t, half, t_lo):
    """Fused input-gradient kernel: one grid pass computes BOTH dx1 and
    dx2. Per tile the statement order interleaves the two independent
    dot/build/unshift chains so the MXU dot of one chain can overlap the
    VPU work of the other."""
    r0 = (pl.program_id(2) + t_lo) * _RB

    # chain 1 build: row-shifted stack of x2
    for u in range(t):
        b2_ref[u * k:(u + 1) * k] = x2_ref[
            0, :, pl.ds(r0 + 2 * half - u, _RB), :].astype(b2_ref.dtype)
    # chain 1 dot (MXU)
    da1[:] = jax.lax.dot_general(
        g1_ref[:], b2_ref[:].reshape(b2_ref.shape[0], _RB * _WL),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(da1.shape).astype(da1.dtype)

    # chain 2 build (VPU — overlaps chain-1 dot)
    for u in range(t):
        b1_ref[u * k:(u + 1) * k] = x1_ref[
            0, :, pl.ds(r0 + 2 * half - u, _RB), :].astype(b1_ref.dtype)
    # chain 2 dot
    da2[:] = jax.lax.dot_general(
        g2_ref[:], b1_ref[:].reshape(b1_ref.shape[0], _RB * _WL),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(da2.shape).astype(da2.dtype)

    # chain 1 unshift (VPU — overlaps chain-2 dot)
    dxl1[:] = jnp.zeros_like(dxl1)
    for v in range(t):
        dxl1[:, :, v:v + _WL] += da1[v * k:(v + 1) * k].astype(dxl1.dtype)
    dx1_ref[0, 0] = dxl1[:]

    dxl2[:] = jnp.zeros_like(dxl2)
    for v in range(t):
        dxl2[:, :, v:v + _WL] += da2[v * k:(v + 1) * k].astype(dxl2.dtype)
    dx2_ref[0, 0] = dxl2[:]


def dgrad_fused_v7(g, x1, x2, half_t):
    """dx1, dx2 in one fused pallas call. g: (k, k, T, T) f32."""
    n, k, h, w = x1.shape
    t = 2 * half_t + 1
    tk = k * t
    r_pad = _round_up(max(h + 2 * half_t, _RB), _RB)
    w_eff = _round_up(w, _WL)
    wt = w_eff // _WL
    assert 2 * half_t <= _WL

    g2d_1 = jnp.transpose(g, (3, 0, 2, 1)).reshape(tk, tk)
    gf = g[:, :, ::-1, ::-1]
    g2d_2 = jnp.transpose(gf, (3, 1, 2, 0)).reshape(tk, tk)

    x1p = jnp.pad(x1.astype(jnp.float32),
                  ((0, 0), (0, 0), (2 * half_t, r_pad - h),
                   (0, w_eff - w)))
    x2p = jnp.pad(x2.astype(jnp.float32),
                  ((0, 0), (0, 0), (2 * half_t, r_pad - h),
                   (0, w_eff - w)))

    t_lo, t_hi = _row_window(half_t, h)
    rows = (t_hi - t_lo) * _RB
    dx1o, dx2o = pl.pallas_call(
        partial(_dgrad_kernel_v7, k=k, t=t, half=half_t, t_lo=t_lo),
        grid=(n, wt, t_hi - t_lo),
        in_specs=[
            pl.BlockSpec((tk, tk), lambda ni, wi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tk), lambda ni, wi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, r_pad + 2 * half_t, _WL),
                         lambda ni, wi, ti: (ni, 0, 0, wi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, r_pad + 2 * half_t, _WL),
                         lambda ni, wi, ti: (ni, 0, 0, wi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, k, _RB, 2 * _WL),
                         lambda ni, wi, ti: (ni, wi, 0, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k, _RB, 2 * _WL),
                         lambda ni, wi, ti: (ni, wi, 0, ti, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, wt, k, rows, 2 * _WL), jnp.float32),
            jax.ShapeDtypeStruct((n, wt, k, rows, 2 * _WL), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tk, _RB, _WL), jnp.bfloat16),
            pltpu.VMEM((tk, _RB, _WL), jnp.bfloat16),
            pltpu.VMEM((tk, _RB, _WL), jnp.bfloat16),
            pltpu.VMEM((tk, _RB, _WL), jnp.bfloat16),
            pltpu.VMEM((k, _RB, 2 * _WL), jnp.float32),
            pltpu.VMEM((k, _RB, 2 * _WL), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(g2d_1.astype(jnp.bfloat16), g2d_2.astype(jnp.bfloat16), x1p, x2p)

    def oadd(out):
        dxp = jnp.zeros((n, k, rows, w_eff + _WL), jnp.float32)
        for wi in range(wt):
            dxp = dxp.at[:, :, :, wi * _WL:(wi + 2) * _WL].add(out[:, wi])
        lo = half_t - t_lo * _RB
        return dxp[:, :, lo:lo + h, half_t:half_t + w]

    return oadd(dx1o), oadd(dx2o)


def _row_window(half_t, h):
    t_lo = half_t // _RB
    t_hi = -(-(half_t + h) // _RB)
    return t_lo, t_hi


def main():
    only = None
    argv = sys.argv[1:]
    if argv and not argv[0].isdigit():
        only = argv[0]
        argv = argv[1:]
    args = [int(a) for a in argv] or [120, 15, 128, 10]
    n, k, h, half_t = args
    w = h
    key = jax.random.PRNGKey(0)
    x1 = jax.nn.softmax(
        jax.random.normal(key, (n, k, h, w), jnp.float32), axis=1)
    x2 = jax.nn.softmax(
        jax.random.normal(jax.random.fold_in(key, 1), (n, k, h, w),
                          jnp.float32), axis=1)
    t = 2 * half_t + 1
    g = jax.random.normal(jax.random.fold_in(key, 2), (k, k, t, t),
                          jnp.float32)

    if only == "v3":
        P_ref = np.asarray(jax.jit(
            lambda a, b: displacement_joint_dense_fft(a, b, half_t))(x1, x2))
        for rb in (16, 32):
            for flat in (True, False):
                try:
                    f = jax.jit(lambda a, b, r=rb, fl=flat: joint_fwd_v3(
                        a, b, half_t, rb=r, flat=fl))
                    P = np.asarray(f(x1, x2))
                    err = float(np.max(np.abs(P - P_ref))
                                / np.max(np.abs(P_ref)))
                    fs = jax.jit(lambda a, b, r=rb, fl=flat: jnp.sum(
                        joint_fwd_v3(a, b, half_t, rb=r, flat=fl)))
                    print(f"V3 rb={rb:2d} flat={flat}: "
                          f"{time_fn(fs, x1, x2):7.2f} ms  rel err {err:.1e}")
                except Exception as e:
                    print(f"V3 rb={rb:2d} flat={flat}: FAILED "
                          f"{type(e).__name__}: {str(e)[:200]}")
        fs0 = jax.jit(lambda a, b: jnp.sum(
            displacement_joint_dense_pallas(a, b, half_t)))
        print(f"E0 pallas-cur fwd {time_fn(fs0, x1, x2):7.2f} ms")
        return

    if only == "kpad":
        P_ref = np.asarray(jax.jit(
            lambda a, b: displacement_joint_dense_fft(a, b, half_t))(x1, x2))

        def padded(fn, a, b, cp=16):
            ap = jnp.pad(a, ((0, 0), (0, cp - k), (0, 0), (0, 0)))
            bp = jnp.pad(b, ((0, 0), (0, cp - k), (0, 0), (0, 0)))
            P = fn(ap, bp, half_t)  # (cp, cp, T, T)
            return P[:k, :k]

        for name, fn in (("v5+kpad16", joint_fwd_v5),
                         ("v2+kpad16", lambda a, b, h2: joint_fwd_v2(
                             a, b, h2, mode="full"))):
            try:
                f = jax.jit(lambda a, b, fn=fn: padded(fn, a, b))
                P = np.asarray(f(x1, x2))
                err = float(np.max(np.abs(P - P_ref))
                            / np.max(np.abs(P_ref)))
                fs = jax.jit(lambda a, b, fn=fn: jnp.sum(padded(fn, a, b)))
                print(f"{name}: {time_fn(fs, x1, x2):7.2f} ms  "
                      f"rel err {err:.1e}")
            except Exception as e:
                print(f"{name} FAILED {type(e).__name__}: {str(e)[:200]}")
        return

    if only == "v8":
        P_ref = np.asarray(jax.jit(
            lambda a, b: displacement_joint_dense_fft(a, b, half_t))(x1, x2))

        @jax.jit
        def ref_grad(a, b, gg):
            _, vjp = jax.vjp(
                lambda p, q: displacement_joint_dense_fft(p, q, half_t),
                a, b)
            return vjp(gg)

        dx1_ref, dx2_ref = ref_grad(x1, x2, g)
        dx1_ref, dx2_ref = np.asarray(dx1_ref), np.asarray(dx2_ref)
        for rb in (16, 32, 64):
            try:
                f = jax.jit(lambda a, b, r=rb: joint_fwd_v8(a, b, half_t,
                                                            rb=r))
                P = np.asarray(f(x1, x2))
                err = float(np.max(np.abs(P - P_ref))
                            / np.max(np.abs(P_ref)))
                fs = jax.jit(lambda a, b, r=rb: jnp.sum(
                    joint_fwd_v8(a, b, half_t, rb=r)))
                print(f"V8 fwd rb={rb:2d}: {time_fn(fs, x1, x2):7.2f} ms  "
                      f"rel err {err:.1e}")
            except Exception as e:
                print(f"V8 fwd rb={rb:2d} FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}")
            try:
                fb = jax.jit(lambda a, b, gg, r=rb: bwd_v8(gg, a, b, half_t,
                                                           rb=r))
                dx1, dx2 = fb(x1, x2, g)
                e1 = float(np.max(np.abs(np.asarray(dx1) - dx1_ref))
                           / np.max(np.abs(dx1_ref)))
                e2 = float(np.max(np.abs(np.asarray(dx2) - dx2_ref))
                           / np.max(np.abs(dx2_ref)))
                fbs = jax.jit(lambda a, b, gg, r=rb: sum(
                    jnp.sum(d) for d in bwd_v8(gg, a, b, half_t, rb=r)))
                print(f"V8 bwd rb={rb:2d}: "
                      f"{time_fn(fbs, x1, x2, g):7.2f} ms  "
                      f"rel err {e1:.1e} / {e2:.1e}")
            except Exception as e:
                print(f"V8 bwd rb={rb:2d} FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}")
        return

    if only == "v6":
        P_ref = np.asarray(jax.jit(
            lambda a, b: displacement_joint_dense_fft(a, b, half_t))(x1, x2))
        for roll in (False, True):
            try:
                f = jax.jit(lambda a, b, r=roll: joint_fwd_v6(
                    a, b, half_t, roll_build=r))
                P = np.asarray(f(x1, x2))
                err = float(np.max(np.abs(P - P_ref))
                            / np.max(np.abs(P_ref)))
                fs = jax.jit(lambda a, b, r=roll: jnp.sum(
                    joint_fwd_v6(a, b, half_t, roll_build=r)))
                print(f"V6 roll={roll}: {time_fn(fs, x1, x2):7.2f} ms  "
                      f"rel err {err:.1e}")
            except Exception as e:
                print(f"V6 roll={roll} FAILED {type(e).__name__}: "
                      f"{str(e)[:300]}")
        return

    if only == "v7":
        @jax.jit
        def ref_grad(a, b, gg):
            _, vjp = jax.vjp(
                lambda p, q: displacement_joint_dense_fft(p, q, half_t),
                a, b)
            return vjp(gg)

        dx1_ref, dx2_ref = ref_grad(x1, x2, g)
        dx1_ref, dx2_ref = np.asarray(dx1_ref), np.asarray(dx2_ref)
        try:
            f = jax.jit(lambda a, b, gg: dgrad_fused_v7(gg, a, b, half_t))
            dx1, dx2 = f(x1, x2, g)
            e1 = float(np.max(np.abs(np.asarray(dx1) - dx1_ref))
                       / np.max(np.abs(dx1_ref)))
            e2 = float(np.max(np.abs(np.asarray(dx2) - dx2_ref))
                       / np.max(np.abs(dx2_ref)))
            fs = jax.jit(lambda a, b, gg: sum(
                jnp.sum(d) for d in dgrad_fused_v7(gg, a, b, half_t)))
            print(f"V7 fused bwd: {time_fn(fs, x1, x2, g):7.2f} ms  "
                  f"rel err {e1:.1e} / {e2:.1e}")
        except Exception as e:
            print(f"V7 FAILED {type(e).__name__}: {str(e)[:300]}")
        from iic_tpu.ops.pallas.seg_joint_kernel import _joint_bwd
        ms = time_fn(jax.jit(lambda a, b, gg: sum(
            jnp.sum(d) for d in _joint_bwd(half_t, (a, b), gg))), x1, x2, g)
        print(f"E1 pallas-cur bwd(dx1+dx2) {ms:7.2f} ms")
        return

    if only == "v5":
        P_ref = np.asarray(jax.jit(
            lambda a, b: displacement_joint_dense_fft(a, b, half_t))(x1, x2))
        try:
            f = jax.jit(lambda a, b: joint_fwd_v5(a, b, half_t))
            P = np.asarray(f(x1, x2))
            err = float(np.max(np.abs(P - P_ref)) / np.max(np.abs(P_ref)))
            fs = jax.jit(lambda a, b: jnp.sum(joint_fwd_v5(a, b, half_t)))
            print(f"V5 2-unroll straight-line: {time_fn(fs, x1, x2):7.2f} ms"
                  f"  rel err {err:.1e}")
        except Exception as e:
            print(f"V5 FAILED {type(e).__name__}: {str(e)[:300]}")
        return

    if only == "v4":
        P_ref = np.asarray(jax.jit(
            lambda a, b: displacement_joint_dense_fft(a, b, half_t))(x1, x2))
        try:
            f = jax.jit(lambda a, b: joint_fwd_v4(a, b, half_t))
            P = np.asarray(f(x1, x2))
            err = float(np.max(np.abs(P - P_ref)) / np.max(np.abs(P_ref)))
            fs = jax.jit(lambda a, b: jnp.sum(joint_fwd_v4(a, b, half_t)))
            print(f"V4 slot-split: {time_fn(fs, x1, x2):7.2f} ms  "
                  f"rel err {err:.1e}")
        except Exception as e:
            print(f"V4 FAILED {type(e).__name__}: {str(e)[:300]}")
        return

    if only == "mmprobe":
        for rb in (16, 32):
            for form in ("mk-nk", "mk-kn"):
                try:
                    fs = jax.jit(lambda r=rb, f=form: jnp.sum(
                        mm_probe(n, k, h, half_t, r, f)))
                    print(f"MM probe rb={rb:2d} {form}: "
                          f"{time_fn(fs):7.2f} ms")
                except Exception as e:
                    print(f"MM probe rb={rb:2d} {form}: FAILED "
                          f"{type(e).__name__}: {str(e)[:160]}")
        return

    if only == "ablate":
        P_ref = np.asarray(jax.jit(
            lambda a, b: displacement_joint_dense_fft(a, b, half_t))(x1, x2))
        for rb in (16, 32, 64):
            for mode in ("full", "mm-only", "copies-only", "rank3"):
                try:
                    fs = jax.jit(lambda a, b, m=mode, r=rb: jnp.sum(
                        joint_fwd_v2(a, b, half_t, mode=m, rb=r)))
                    ms = time_fn(fs, x1, x2)
                    err = ""
                    if mode in ("full", "rank3"):
                        P = np.asarray(jax.jit(
                            lambda a, b, m=mode, r=rb: joint_fwd_v2(
                                a, b, half_t, mode=m, rb=r))(x1, x2))
                        err = (f"  rel err {np.max(np.abs(P - P_ref)) / np.max(np.abs(P_ref)):.1e}")
                    print(f"E2 rb={rb:2d} {mode:15s} {ms:7.2f} ms{err}")
                except Exception as e:
                    print(f"E2 rb={rb:2d} {mode:15s} FAILED: "
                          f"{type(e).__name__}: {str(e)[:160]}")
        return

    # reference gradient via FFT vjp
    @jax.jit
    def ref_grad(a, b, gg):
        _, vjp = jax.vjp(
            lambda p, q: displacement_joint_dense_fft(p, q, half_t), a, b)
        return vjp(gg)

    dx1_ref, dx2_ref = ref_grad(x1, x2, g)
    dx1_ref, dx2_ref = np.asarray(dx1_ref), np.asarray(dx2_ref)

    for name, fn in (("conv-f32", bwd_conv), ("conv-bf16", bwd_conv_bf16)):
        f = jax.jit(lambda a, b, gg, fn=fn: fn(a, b, gg, half_t))
        dx1, dx2 = f(x1, x2, g)
        e1 = float(np.max(np.abs(np.asarray(dx1) - dx1_ref))
                   / np.max(np.abs(dx1_ref)))
        e2 = float(np.max(np.abs(np.asarray(dx2) - dx2_ref))
                   / np.max(np.abs(dx2_ref)))
        fs = jax.jit(lambda a, b, gg, fn=fn: sum(
            jnp.sum(d) for d in fn(a, b, gg, half_t)))
        ms = time_fn(fs, x1, x2, g)
        print(f"E1 {name:10s} bwd(dx1+dx2) {ms:7.2f} ms   "
              f"rel err {e1:.2e} / {e2:.2e}")

    # current pallas backward (bwd only, via the vjp rule directly)
    from iic_tpu.ops.pallas.seg_joint_kernel import _joint_bwd
    ms = time_fn(jax.jit(lambda a, b, gg: sum(
        jnp.sum(d) for d in _joint_bwd(half_t, (a, b), gg))), x1, x2, g)
    print(f"E1 pallas-cur bwd(dx1+dx2) {ms:7.2f} ms")

    # E2 forward
    P_ref = np.asarray(jax.jit(
        lambda a, b: displacement_joint_dense_fft(a, b, half_t))(x1, x2))
    try:
        f2 = jax.jit(lambda a, b: joint_fwd_v2(a, b, half_t))
        P2 = np.asarray(f2(x1, x2))
        err = float(np.max(np.abs(P2 - P_ref)) / np.max(np.abs(P_ref)))
        fs2 = jax.jit(lambda a, b: jnp.sum(joint_fwd_v2(a, b, half_t)))
        ms = time_fn(fs2, x1, x2)
        print(f"E2 bf16-static fwd {ms:7.2f} ms   rel err {err:.2e}")
    except Exception as e:
        print(f"E2 bf16-static fwd FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}")

    fs0 = jax.jit(lambda a, b: jnp.sum(
        displacement_joint_dense_pallas(a, b, half_t)))
    print(f"E0 pallas-cur  fwd {time_fn(fs0, x1, x2):7.2f} ms")

    # ablations: where does the time go?
    for mode in ("mm-only", "copies-only", "aligned-copies"):
        fs = jax.jit(lambda a, b, m=mode: jnp.sum(
            joint_fwd_v2(a, b, half_t, mode=m)))
        print(f"E2 ablation {mode:15s} {time_fn(fs, x1, x2):7.2f} ms")


if __name__ == "__main__":
    main()
