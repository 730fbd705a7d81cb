"""Segmentation IID loss with local spatial invariance, TPU-native.

Reproduces the numerics of the reference segmentation losses
(reference: code/utils/segmentation/IID_losses.py:14-159) with a TPU-first
formulation of the displacement joint:

The reference computes the joint over all displacements |t| <= T via
``F.conv2d(x1_perm, weight=x2_perm, padding=half_T)`` — a conv whose *filters
are activations* — and then (in the collapsed variant) sums over the
displacement dims. Summing a cross-correlation over all output positions
factorises:

    sum_{u,v} conv(x1, x2)[i, j, u, v]
      = sum_{n,p,q} x2[j,n,p,q] * boxsum_T(x1)[i,n,p,q]

so the collapsed joint is a separable box-filter (reduce_window, HBM-bandwidth
bound, O(nhwk)) followed by ONE k x k matmul on the MXU (O(nhwk^2)) — instead
of the O(nhwk^2 T^2) conv. The uncollapsed variant needs the per-displacement
joints and keeps the conv formulation (``lax.conv_general_dilated`` with the
batch<->feature trick), with a fused Pallas kernel as the fast path.

Clamping/normalisation order differences between the variants are preserved
exactly (see SURVEY.md §2.1 numerics notes).
"""

import sys

import jax
import jax.numpy as jnp

from iic_tpu.ops.affine import perform_affine_tf

EPS = sys.float_info.epsilon


def random_translation_multiple(data, half_side_min, half_side_max, key):
    """Mirror of reference ``random_translation_multiple``
    (code/utils/segmentation/transforms.py:146-166): shift the whole batch by
    one random (x, y) displacement with magnitude in [min, max] and random
    polarity, zero-filling.

    Functional-RNG version: displacement drawn from ``key``.
    """
    n, c, h, w = data.shape
    k_t, k_p = jax.random.split(key)
    t = jax.random.randint(k_t, (2,), half_side_min, half_side_max + 1)
    polarities = jax.random.choice(k_p, jnp.array([-1, 1]), shape=(2,))
    t = t * polarities + half_side_max  # index into padded array

    padded = jnp.pad(
        data,
        ((0, 0), (0, 0), (half_side_max, half_side_max),
         (half_side_max, half_side_max)),
    )
    # Reference slices [t[1]:t[1]+h] rows and [t[0]:t[0]+w] cols.
    return jax.lax.dynamic_slice(
        padded, (0, 0, t[1], t[0]), (n, c, h, w)
    )


def _box_sum_1d(x, half_t, axis):
    """Windowed sum of size 2*half_t+1 along ``axis``, zero-padded, via the
    integral-image trick (cumsum difference): O(L) instead of O(L*T), and —
    unlike ``lax.reduce_window`` with a generic reducer — reverse-mode
    differentiable."""
    t = 2 * half_t + 1
    length = x.shape[axis]
    pad = [(0, 0)] * x.ndim
    pad[axis] = (half_t + 1, half_t)
    c = jnp.cumsum(jnp.pad(x, pad), axis=axis)
    upper = jax.lax.slice_in_dim(c, t, t + length, axis=axis)
    lower = jax.lax.slice_in_dim(c, 0, length, axis=axis)
    return upper - lower


def _box_sum(x, half_t):
    """Sum over a (2*half_t+1)^2 window at every spatial position,
    zero-padded; x is (N, K, H, W). Separable: two 1-D passes."""
    if half_t == 0:
        return x
    return _box_sum_1d(_box_sum_1d(x, half_t, axis=2), half_t, axis=3)


def displacement_joint_collapsed(x1, x2, half_t):
    """Collapsed (summed over displacements) k x k joint.

    Equals ``conv2d(x1_perm, weight=x2_perm, padding=half_t).sum((2, 3))`` of
    the reference (code/utils/segmentation/IID_losses.py:53-55) but via
    box-filter + single matmul.

    Args:
      x1, x2: (N, K, H, W) masked softmax heat-maps.
    Returns:
      (K, K) unnormalised joint, float32.
    """
    x1 = x1.astype(jnp.float32)
    x2 = x2.astype(jnp.float32)
    x1_box = _box_sum(x1, half_t)
    # p[i, j] = sum_{n,h,w} x1_box[n,i,h,w] * x2[n,j,h,w]
    return jnp.einsum(
        "nihw,njhw->ij", x1_box, x2,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _next_fast_len(n):
    """Smallest 5-smooth (2^a 3^b 5^c) integer >= n — good FFT sizes."""
    best = 1
    while best < n:
        best *= 2
    candidate = best
    for b in range(0, 20):
        v3 = 3 ** b
        if v3 >= 2 * best:
            break
        for c in range(0, 20):
            v = v3 * 5 ** c
            if v >= 2 * best:
                break
            p = v
            while p < n:
                p *= 2
            if p < candidate:
                candidate = p
    return candidate


def displacement_joint_dense_fft(x1, x2, half_t):
    """Per-displacement joint via FFT cross-correlation — the TPU-first
    formulation of the reference's activations-as-filters conv
    (code/utils/segmentation/IID_losses.py:53). The conv's cost grows as
    O(nhw k^2 T^2) and XLA realises the 128x128-filter conv poorly; the
    spectral product is O(nhw k (log hw + k)) and T-independent:

        P[i, j, u, v] = IFFT2( sum_n F[x1_n,i] * conj(F[x2_n,j]) )[u, v]

    Zero-padding to a 5-smooth size >= h + 2*half_t makes the circular
    correlation exact for |shift| <= 2*half_t. Matches
    ``displacement_joint_dense`` to f32 accumulation error.
    """
    n, k, h, w = x1.shape
    s_h = _next_fast_len(h + 2 * half_t)
    s_w = _next_fast_len(w + 2 * half_t)

    x1p = jnp.pad(x1.astype(jnp.float32),
                  ((0, 0), (0, 0), (0, s_h - h), (0, s_w - w)))
    x2p = jnp.pad(x2.astype(jnp.float32),
                  ((0, 0), (0, 0), (0, s_h - h), (0, s_w - w)))
    f1 = jnp.fft.rfft2(x1p)  # (n, k, s_h, s_w//2+1)
    f2 = jnp.fft.rfft2(x2p)

    nf = f1.shape[-2] * f1.shape[-1]
    spec = jnp.einsum(
        "nif,njf->ijf",
        f1.reshape(n, k, nf),
        jnp.conj(f2).reshape(n, k, nf),
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(k, k, f1.shape[-2], f1.shape[-1])

    corr = jnp.fft.irfft2(spec, s=(s_h, s_w))  # (k, k, s_h, s_w)
    # out[u+half, v+half] = corr[u mod s_h, v mod s_w], u,v in [-half, half]
    corr = jnp.roll(corr, (half_t, half_t), axis=(-2, -1))
    t = 2 * half_t + 1
    return corr[:, :, :t, :t]


def displacement_joint_dense(x1, x2, half_t):
    """Full per-displacement joint (K, K, T, T), T = 2*half_t+1.

    Matches ``F.conv2d(x1_perm, weight=x2_perm, padding=half_t)`` of the
    reference (code/utils/segmentation/IID_losses.py:53): out[i, j, u, v] =
    sum_{n,p,q} x1[n,i, u+p-half_t, v+q-half_t] * x2[n,j,p,q].
    """
    n, k, h, w = x1.shape
    lhs = jnp.transpose(x1, (1, 0, 2, 3)).astype(jnp.float32)  # (k, n, h, w)
    rhs = jnp.transpose(x2, (1, 0, 2, 3)).astype(jnp.float32)  # (k, n, h, w)
    out = jax.lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(1, 1),
        padding=((half_t, half_t), (half_t, half_t)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out  # (k, k, T, T)


def _warp_mask(x1_outs, x2_outs, all_affine2_to_1, all_mask_img1,
               half_T_side_sparse_min, half_T_side_sparse_max, key,
               warp_impl="gather"):
    """Common preamble of both seg losses: inverse-affine warp of x2 into
    x1's frame, optional sparse random translation, relevancy masking
    (reference: code/utils/segmentation/IID_losses.py:26-45).

    warp_impl: "gather" = exact torch-parity bilinear via XLA gathers
    (default on the public surface); "matmul_exact" = the same exact
    bilinear semantics as a chunked dense-interpolation contraction on the
    MXU — bit-equivalent, ~10x faster on TPU (--exact_warp uses it);
    "matmul" = the fastest two-pass sheared warp (deviates on a 1-px
    band; training steps default to it via config)."""
    assert x1_outs.shape == x2_outs.shape
    bn, k, h, w = x1_outs.shape

    x2_outs_inv = perform_affine_tf(x2_outs, all_affine2_to_1,
                                    impl=warp_impl)

    if (half_T_side_sparse_min != 0) or (half_T_side_sparse_max != 0):
        assert key is not None, (
            "sparse translation requires a PRNG key (functional RNG)")
        x2_outs_inv = random_translation_multiple(
            x2_outs_inv,
            half_side_min=half_T_side_sparse_min,
            half_side_max=half_T_side_sparse_max,
            key=key,
        )

    mask = all_mask_img1.reshape(bn, 1, h, w).astype(x1_outs.dtype)
    return x1_outs * mask, x2_outs_inv * mask


def IID_segmentation_loss(x1_outs, x2_outs, all_affine2_to_1=None,
                          all_mask_img1=None, lamb=1.0,
                          half_T_side_dense=None,
                          half_T_side_sparse_min=None,
                          half_T_side_sparse_max=None,
                          key=None, axis_name=None, warp_impl="gather"):
    """Collapsed segmentation IID loss. Mirrors the reference
    (code/utils/segmentation/IID_losses.py:14-83): normalise, THEN symmetrise
    (opposite order to the clustering loss), clamp joint and marginals,
    MI objective. Returns ``(loss, loss_no_lamb)``.
    """
    x1m, x2m = _warp_mask(
        x1_outs, x2_outs, all_affine2_to_1, all_mask_img1,
        half_T_side_sparse_min, half_T_side_sparse_max, key,
        warp_impl=warp_impl)

    p_i_j = displacement_joint_collapsed(x1m, x2m, half_T_side_dense)
    if axis_name is not None:
        p_i_j = jax.lax.psum(p_i_j, axis_name)

    # Normalise (mask-aware, uses the actual sum). The reference divides by
    # ``float(p_i_j.sum())`` — a detached Python scalar
    # (code/utils/segmentation/IID_losses.py:60-61) — so no gradient flows
    # through the normaliser; stop_gradient reproduces that exactly.
    p_i_j = p_i_j / jax.lax.stop_gradient(jnp.sum(p_i_j))
    p_i_j = (p_i_j + p_i_j.T) / 2.0  # symmetrise AFTER normalising

    k = p_i_j.shape[0]
    p_i_mat = jnp.sum(p_i_j, axis=1).reshape(k, 1)
    p_j_mat = jnp.sum(p_i_j, axis=0).reshape(1, k)

    p_i_j = jnp.maximum(p_i_j, EPS)
    p_i_mat = jnp.maximum(p_i_mat, EPS)
    p_j_mat = jnp.maximum(p_j_mat, EPS)

    loss = -jnp.sum(
        p_i_j * (jnp.log(p_i_j) - lamb * jnp.log(p_i_mat)
                 - lamb * jnp.log(p_j_mat)))
    loss_no_lamb = -jnp.sum(
        p_i_j * (jnp.log(p_i_j) - jnp.log(p_i_mat) - jnp.log(p_j_mat)))
    return loss, loss_no_lamb


def IID_segmentation_loss_uncollapsed(x1_outs, x2_outs, all_affine2_to_1=None,
                                      all_mask_img1=None, lamb=1.0,
                                      half_T_side_dense=None,
                                      half_T_side_sparse_min=None,
                                      half_T_side_sparse_max=None,
                                      key=None, axis_name=None,
                                      warp_impl="gather",
                                      joint_impl="conv"):
    """Uncollapsed variant: per-displacement expectation of the MI
    (reference: code/utils/segmentation/IID_losses.py:86-159). Each of the
    T x T displacement joints is normalised and symmetrised independently;
    result divided by T^2. Returns ``(loss, loss_no_lamb)``.

    joint_impl: "conv" (exact-parity conv), "fft" (the T-independent
    spectral formulation), or "pallas" (fused stacked-shift GEMM kernel,
    ops/pallas/seg_joint_kernel.py). Training default is chosen by
    measurement on the real chip (see bench.py).
    """
    x1m, x2m = _warp_mask(
        x1_outs, x2_outs, all_affine2_to_1, all_mask_img1,
        half_T_side_sparse_min, half_T_side_sparse_max, key,
        warp_impl=warp_impl)

    t_side = half_T_side_dense * 2 + 1

    if joint_impl == "pallas":
        from iic_tpu.ops.pallas import displacement_joint_dense_pallas
        joint_fn = displacement_joint_dense_pallas
    elif joint_impl == "fft":
        joint_fn = displacement_joint_dense_fft
    else:
        joint_fn = displacement_joint_dense
    p = joint_fn(x1m, x2m, half_T_side_dense)  # (k, k, T, T)
    if axis_name is not None:
        p = jax.lax.psum(p, axis_name)
    p = jnp.transpose(p, (2, 3, 0, 1))  # (T, T, k, k)

    p = p / jnp.sum(p, axis=(2, 3), keepdims=True)  # per-displacement norm
    p = (p + jnp.swapaxes(p, 2, 3)) / 2.0  # symmetrise k x k part

    p_i_mat = jnp.sum(p, axis=2, keepdims=True)  # (T, T, 1, k)
    p_j_mat = jnp.sum(p, axis=3, keepdims=True)  # (T, T, k, 1)

    p = jnp.maximum(p, EPS)
    p_i_mat = jnp.maximum(p_i_mat, EPS)
    p_j_mat = jnp.maximum(p_j_mat, EPS)

    denom = t_side * t_side
    loss = -jnp.sum(
        p * (jnp.log(p) - lamb * jnp.log(p_i_mat)
             - lamb * jnp.log(p_j_mat))) / denom
    loss_no_lamb = -jnp.sum(
        p * (jnp.log(p) - jnp.log(p_i_mat) - jnp.log(p_j_mat))) / denom
    return loss, loss_no_lamb
