"""Segmentation baseline networks: Doersch context prediction and Isola
adjacency prediction (reference: code/archs/segmentation/baselines/
net10a_doersch.py:13-97, net10a_isola.py:13-101).

Both share the net10a trunk upsampled to input size, extract two patches
per sample, run them through a siamese conv branch (3x3 -> 1024, BN, ReLU)
and a joint MLP (Linear -> ReLU -> Dropout -> Linear) to 9 position logits
(Doersch) or 1 adjacency logit (Isola). Patch extraction uses vmapped
dynamic_slice on per-sample centres.
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from iic_tpu.models.layers import (
    BatchNorm, kaiming_normal_fan_in, linear_init)
from iic_tpu.models.segmentation_nets import SegmentationNet10aTrunk


def get_patches(feats_nchw, centres, patch_side):
    """Extract (patch_side x patch_side) patches centred at per-sample
    (row, col) coords. feats (N, C, H, W), centres (N, 2) int32."""
    half = patch_side // 2

    def one(feat, centre):
        return jax.lax.dynamic_slice(
            feat,
            (0, centre[0] - half, centre[1] - half),
            (feat.shape[0], patch_side, patch_side))

    return jax.vmap(one)(feats_nchw, centres)


class _SiameseJointHead(nn.Module):
    out_dim: int
    batchnorm_track: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, patches1, patches2, train: bool = True):
        conv = nn.Conv(1024, (3, 3), padding=[(1, 1), (1, 1)],
                       use_bias=False, kernel_init=kaiming_normal_fan_in,
                       dtype=self.dtype, param_dtype=jnp.float32,
                       name="siamese_conv")
        bn = BatchNorm(track_running_stats=self.batchnorm_track,
                       dtype=self.dtype, name="siamese_bn")

        def apply_branch(p_nchw):
            x = jnp.transpose(p_nchw, (0, 2, 3, 1))
            x = nn.relu(bn(conv(x), use_batch_stats=train))
            # flatten in NCHW order for weight-layout parity
            return jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)

        f1 = apply_branch(patches1)
        f2 = apply_branch(patches2)
        concat = jnp.concatenate([f1, f2], axis=1)

        d = concat.shape[-1]
        k1 = self.param("joint_kernel1", linear_init(), (d, 1024),
                        jnp.float32)
        b1 = self.param("joint_bias1", nn.initializers.zeros, (1024,),
                        jnp.float32)
        x = nn.relu(concat.astype(jnp.float32) @ k1 + b1)
        x = nn.Dropout(rate=0.5, deterministic=not train)(x)
        k2 = self.param("joint_kernel2", linear_init(),
                        (1024, self.out_dim), jnp.float32)
        b2 = self.param("joint_bias2", nn.initializers.zeros,
                        (self.out_dim,), jnp.float32)
        return x @ k2 + b2


class _SegBaselineNet(nn.Module):
    patch_side: int
    input_sz: int
    out_dim: int
    batchnorm_track: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, centre=None, other=None, train: bool = True,
                 penultimate: bool = False):
        x = jnp.transpose(x, (0, 2, 3, 1))  # NCHW -> NHWC
        feats = SegmentationNet10aTrunk(
            batchnorm_track=self.batchnorm_track,
            dtype=self.dtype)(x, train=train)
        feats = jnp.transpose(feats, (0, 3, 1, 2))  # NCHW
        feats = jax.image.resize(
            feats,
            (feats.shape[0], feats.shape[1], self.input_sz, self.input_sz),
            method="bilinear")
        if penultimate:
            return feats
        assert centre is not None and other is not None
        patches1 = get_patches(feats, centre, self.patch_side)
        patches2 = get_patches(feats, other, self.patch_side)
        return _SiameseJointHead(
            out_dim=self.out_dim,
            batchnorm_track=self.batchnorm_track, dtype=self.dtype,
        )(patches1, patches2, train=train)


def SegmentationNet10aDoersch(patch_side, input_sz, batchnorm_track=True,
                              dtype=jnp.float32):
    """9-way relative-position prediction (N, NE, ... NW, centre).
    (flax modules are frozen dataclasses, so these are factories.)"""
    return _SegBaselineNet(patch_side=patch_side, input_sz=input_sz,
                           out_dim=9, batchnorm_track=batchnorm_track,
                           dtype=dtype)


def SegmentationNet10aIsola(patch_side, input_sz, batchnorm_track=True,
                            dtype=jnp.float32):
    """1-logit adjacency prediction."""
    return _SegBaselineNet(patch_side=patch_side, input_sz=input_sz,
                           out_dim=1, batchnorm_track=batchnorm_track,
                           dtype=dtype)
