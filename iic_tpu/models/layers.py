"""Shared model building blocks.

Init parity with the reference (code/archs/cluster/vgg.py:42-54,
code/archs/cluster/residual.py:75-86): Kaiming-normal convs (fan_in for VGG
nets, fan_out for ResNets, relu gain), Linear ~ N(0, 0.01) with zero bias,
BatchNorm scale 1 / bias 0.

TPU-first choices: activations are NHWC (XLA's native TPU conv layout);
multi-sub-head linear/conv heads carry a leading sub-head axis and run as one
einsum instead of the reference's Python loop over ``nn.ModuleList``
(code/archs/cluster/net5g.py:69-80). Compute dtype is configurable (bf16
trunks); batch-norm statistics and softmax always accumulate in f32.
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# Kaiming-normal, relu gain, untruncated normal — torch parity.
kaiming_normal_fan_in = nn.initializers.variance_scaling(
    2.0, "fan_in", "normal")
kaiming_normal_fan_out = nn.initializers.variance_scaling(
    2.0, "fan_out", "normal")


def linear_init(std=0.01):
    """torch ``weight.data.normal_(0, 0.01)`` equivalent."""
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)
    return init


class BatchNorm(nn.Module):
    """BatchNorm reproducing torch semantics including the load-bearing
    ``track_running_stats`` flag (reference: code/archs/cluster/vgg.py:28-29):

      - track=True:  train -> batch stats (+ running update), eval -> running.
      - track=False: batch stats always, nothing tracked — this is what makes
        the reference's "double eval" meaningful (cluster_eval.py:323-341).

    ``axis_name`` optionally syncs stats across a mesh axis (the reference's
    DataParallel computed per-replica stats; per-shard is the parity default).
    """
    track_running_stats: bool = True
    momentum: float = 0.1  # torch convention: new = (1-m)*old + m*batch
    eps: float = 1e-5
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, use_batch_stats: bool = True):
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,),
                          jnp.float32)
        reduce_axes = tuple(range(x.ndim - 1))

        if self.track_running_stats:
            ra_mean = self.variable(
                "batch_stats", "mean",
                lambda: jnp.zeros((feat,), jnp.float32))
            ra_var = self.variable(
                "batch_stats", "var",
                lambda: jnp.ones((feat,), jnp.float32))

        compute_batch = use_batch_stats or not self.track_running_stats
        if compute_batch:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=reduce_axes)
            mean2 = jnp.mean(jnp.square(xf), axis=reduce_axes)
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
            var = mean2 - jnp.square(mean)
            if self.track_running_stats and not self.is_initializing():
                n = 1
                for a in reduce_axes:
                    n *= x.shape[a]
                if self.axis_name is not None:
                    n *= jax.lax.psum(1, self.axis_name)
                unbiased = var * (n / max(n - 1, 1))  # torch uses unbiased
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * mean)
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * unbiased)
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale + bias
        return y.astype(self.dtype)


class MultiDenseHead(nn.Module):
    """``num_sub_heads`` parallel Linear(+optional softmax) heads computed as
    a single einsum with a leading sub-head axis. Replaces the reference's
    ``nn.ModuleList`` loop (code/archs/cluster/net5g.py:69-80).

    Input (B, D) -> output (num_sub_heads, B, K).
    """
    num_sub_heads: int
    output_k: int
    softmax: bool = True

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        kernel = self.param(
            "kernel", linear_init(),
            (self.num_sub_heads, d, self.output_k), jnp.float32)
        bias = self.param(
            "bias", nn.initializers.zeros,
            (self.num_sub_heads, self.output_k), jnp.float32)
        # Heads are tiny relative to the trunk: full-f32 precision is free
        # and keeps the softmax inputs exact.
        y = jnp.einsum(
            "bd,hdk->hbk", x.astype(jnp.float32), kernel,
            precision=jax.lax.Precision.HIGHEST) + bias[:, None, :]
        if self.softmax:
            y = jax.nn.softmax(y, axis=-1)
        return y


class MultiConvSoftmaxHead(nn.Module):
    """``num_sub_heads`` parallel (1x1 conv -> Softmax2d -> bilinear upsample
    to ``input_sz``) segmentation heads, as one einsum.

    Mirrors ``SegmentationNet10aHead`` (code/archs/segmentation/net10a.py:
    34-59) including its quirk: the 1x1 conv uses padding=1, which adds a
    one-pixel ring of zero logits (-> uniform softmax) before upsampling.

    Input (B, H, W, C) NHWC -> output (num_sub_heads, B, K, input_sz,
    input_sz) in NCHW (the layout the segmentation loss consumes).
    """
    num_sub_heads: int
    output_k: int
    input_sz: int

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        kernel = self.param(
            "kernel", kaiming_normal_fan_in,
            (1, 1, c, self.num_sub_heads * self.output_k), jnp.float32)
        # padding=1 on a 1x1 conv == zero-pad the input ring.
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        w = kernel.reshape(c, self.num_sub_heads, self.output_k)
        logits = jnp.einsum(
            "bxyc,csk->bxysk", xp.astype(jnp.float32), w,
            precision=jax.lax.Precision.HIGHEST)  # (B, H+2, W+2, S, K)
        probs = jax.nn.softmax(logits, axis=-1)
        b, hp, wp, s, k = probs.shape
        probs = jnp.transpose(probs, (3, 0, 4, 1, 2))  # (S, B, K, H+2, W+2)
        # Bilinear upsample to input_sz (torch F.interpolate,
        # align_corners=False — jax.image.resize half-pixel convention).
        out = jax.image.resize(
            probs,
            (s, b, k, self.input_sz, self.input_sz),
            method="bilinear")
        return out


def max_pool_2x2_pad1(x):
    """torch ``MaxPool2d(kernel_size=2, stride=2, padding=1)`` on NHWC
    (pads with -inf so padding never wins the max)."""
    return nn.max_pool(
        x, window_shape=(2, 2), strides=(2, 2),
        padding=((1, 1), (1, 1)))


def flatten_nhwc_as_nchw(x):
    """Flatten (B, H, W, C) to (B, C*H*W) in the *reference's* NCHW order so
    downstream Linear weights index features identically
    (code/archs/cluster/net6c.py:24-28 flattens as bn, nf*h*w)."""
    b = x.shape[0]
    return jnp.transpose(x, (0, 3, 1, 2)).reshape(b, -1)
