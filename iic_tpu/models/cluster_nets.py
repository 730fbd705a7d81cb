"""Clustering networks (reference: code/archs/cluster/).

Public forward contract mirrors the reference: input is NCHW, two-head nets
dispatch on ``head="A"|"B"`` (a static Python arg — XLA traces each head
branch separately), sub-head outputs come back stacked on a leading axis
(num_sub_heads, B, K) instead of the reference's Python list.
"""

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from iic_tpu.models.layers import (
    BatchNorm, MultiDenseHead, flatten_nhwc_as_nchw, kaiming_normal_fan_out,
    linear_init, max_pool_2x2_pad1)
from iic_tpu.models.residual import ResNetLayer
from iic_tpu.models.vgg import VGGTrunk

# (out_channels, dilation) | ("M", None); reference net6c cfg
# (code/archs/cluster/net6c.py:63-64).
NET6C_CFG = ((64, 1), ("M", None), (128, 1), ("M", None),
             (256, 1), ("M", None), (512, 1))


def _linear(mdl, feats, out_k, prefix=""):
    """Single Linear (no softmax) with the reference init; shared by the
    semisup head-B variants and the triplets head. Param names keep the
    existing checkpoint layout ({prefix}kernel / {prefix}bias)."""
    d = feats.shape[-1]
    kernel = mdl.param(f"{prefix}kernel", linear_init(), (d, out_k),
                       jnp.float32)
    bias = mdl.param(f"{prefix}bias", nn.initializers.zeros, (out_k,),
                     jnp.float32)
    return feats.astype(jnp.float32) @ kernel + bias


class ClusterNet6cTrunk(nn.Module):
    """VGG-ish 4-conv trunk, 5x5 convs pad 2
    (code/archs/cluster/net6c.py:10-28); flattens NCHW-order."""
    batchnorm_track: bool = True
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = VGGTrunk(
            cfg=NET6C_CFG, conv_size=5, pad=2,
            batchnorm_track=self.batchnorm_track,
            bn_axis_name=self.bn_axis_name, dtype=self.dtype,
        )(x, train=train)
        return flatten_nhwc_as_nchw(x)


class ClusterNet5gTrunk(nn.Module):
    """ResNet-34-style trunk (code/archs/cluster/net5g.py:10-58): 3x3 stem
    stride 1, maxpool 2 pad 1, layers [3,4,6,3], final spatial avg."""
    batchnorm_track: bool = True
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True,
                 penultimate_features: bool = False):
        def bn(h):
            return BatchNorm(
                track_running_stats=self.batchnorm_track,
                axis_name=self.bn_axis_name,
                dtype=self.dtype)(h, use_batch_stats=train)

        x = nn.Conv(64, (3, 3), strides=(1, 1), padding=[(1, 1), (1, 1)],
                    use_bias=False, kernel_init=kaiming_normal_fan_out,
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.relu(bn(x))
        x = max_pool_2x2_pad1(x)

        common = dict(batchnorm_track=self.batchnorm_track,
                      bn_axis_name=self.bn_axis_name, dtype=self.dtype)
        x = ResNetLayer(planes=64, blocks=3, stride=1, **common)(x, train)
        x = ResNetLayer(planes=128, blocks=4, stride=2, **common)(x, train)
        x = ResNetLayer(planes=256, blocks=6, stride=2, **common)(x, train)

        if penultimate_features:
            # reference skips layer4 + avgpool and flattens layer3 output
            # (code/archs/cluster/net5g.py:51-58).
            return flatten_nhwc_as_nchw(x)

        x = ResNetLayer(planes=512, blocks=3, stride=2, **common)(x, train)
        # AvgPool2d(avg_pool_sz, stride=1) where avg_pool_sz equals the
        # feature size for input 96/64/32 — i.e. global spatial mean.
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        return x  # (B, 512)


class ClusterNet6c(nn.Module):
    """Single-head net6c (code/archs/cluster/net6c.py:62-88)."""
    output_k: int
    num_sub_heads: int
    input_sz: int
    batchnorm_track: bool = True
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True, kmeans_use_features: bool = False,
                 trunk_features: bool = False,
                 penultimate_features: bool = False):
        assert not penultimate_features, "not implemented for this arch"
        x = jnp.transpose(x, (0, 2, 3, 1))  # NCHW -> NHWC
        feats = ClusterNet6cTrunk(
            batchnorm_track=self.batchnorm_track,
            bn_axis_name=self.bn_axis_name, dtype=self.dtype)(x, train)
        if trunk_features:
            return feats
        if kmeans_use_features:
            return jnp.broadcast_to(
                feats[None], (self.num_sub_heads,) + feats.shape)
        return MultiDenseHead(
            num_sub_heads=self.num_sub_heads, output_k=self.output_k)(feats)


class ClusterNet6cTwoHead(nn.Module):
    """Two-head net6c (code/archs/cluster/net6c_two_head.py:53-98).
    head B may be a semisup single Linear (no softmax)."""
    output_k_A: int
    output_k_B: int
    num_sub_heads: int
    input_sz: int
    semisup: bool = False
    batchnorm_track: bool = True
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, head: str = "B", train: bool = True,
                 kmeans_use_features: bool = False,
                 trunk_features: bool = False,
                 penultimate_features: bool = False):
        assert not penultimate_features, "not implemented for this arch"
        x = jnp.transpose(x, (0, 2, 3, 1))
        feats = ClusterNet6cTrunk(
            batchnorm_track=self.batchnorm_track,
            bn_axis_name=self.bn_axis_name, dtype=self.dtype)(x, train)
        if trunk_features:
            return feats
        if head == "B" and self.semisup:
            # the reference semisup head ignores kmeans_use_features and
            # returns logits (net5g_two_head.py:28-40)
            return _linear(self, feats, self.output_k_B, prefix="head_B_")
        if kmeans_use_features:
            return jnp.broadcast_to(
                feats[None], (self.num_sub_heads,) + feats.shape)
        if head == "A":
            return MultiDenseHead(
                num_sub_heads=self.num_sub_heads, output_k=self.output_k_A,
                name="head_A")(feats)
        elif head == "B":
            return MultiDenseHead(
                num_sub_heads=self.num_sub_heads, output_k=self.output_k_B,
                name="head_B")(feats)
        raise ValueError(f"unknown head {head!r}")


class ClusterNet5g(nn.Module):
    """Single-head ResNet34 cluster net (code/archs/cluster/net5g.py:83-103)."""
    output_k: int
    num_sub_heads: int
    input_sz: int
    batchnorm_track: bool = True
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True, kmeans_use_features: bool = False,
                 trunk_features: bool = False,
                 penultimate_features: bool = False):
        x = jnp.transpose(x, (0, 2, 3, 1))
        feats = ClusterNet5gTrunk(
            batchnorm_track=self.batchnorm_track,
            bn_axis_name=self.bn_axis_name, dtype=self.dtype,
        )(x, train, penultimate_features=penultimate_features)
        if trunk_features:
            return feats
        if kmeans_use_features:
            return jnp.broadcast_to(
                feats[None], (self.num_sub_heads,) + feats.shape)
        return MultiDenseHead(
            num_sub_heads=self.num_sub_heads, output_k=self.output_k)(feats)


class ClusterNet5gTwoHead(nn.Module):
    """Two-head ResNet34 cluster net
    (code/archs/cluster/net5g_two_head.py:42-81)."""
    output_k_A: int
    output_k_B: int
    num_sub_heads: int
    input_sz: int
    semisup: bool = False
    batchnorm_track: bool = True
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, head: str = "B", train: bool = True,
                 kmeans_use_features: bool = False,
                 trunk_features: bool = False,
                 penultimate_features: bool = False):
        x = jnp.transpose(x, (0, 2, 3, 1))
        feats = ClusterNet5gTrunk(
            batchnorm_track=self.batchnorm_track,
            bn_axis_name=self.bn_axis_name, dtype=self.dtype,
        )(x, train, penultimate_features=penultimate_features)
        if trunk_features:
            return feats
        if head == "B" and self.semisup:
            # the reference semisup head ignores kmeans_use_features and
            # returns logits (net5g_two_head.py:28-40)
            return _linear(self, feats, self.output_k_B, prefix="head_B_")
        if kmeans_use_features:
            return jnp.broadcast_to(
                feats[None], (self.num_sub_heads,) + feats.shape)
        if head == "A":
            return MultiDenseHead(
                num_sub_heads=self.num_sub_heads, output_k=self.output_k_A,
                name="head_A")(feats)
        elif head == "B":
            return MultiDenseHead(
                num_sub_heads=self.num_sub_heads, output_k=self.output_k_B,
                name="head_B")(feats)
        raise ValueError(f"unknown head {head!r}")


class TripletsNet(nn.Module):
    """Triplets baseline: trunk + single Linear, no softmax
    (code/archs/cluster/baselines/triplets.py:11-77)."""
    output_k: int
    input_sz: int
    trunk_type: str = "5g"  # "5g" (resnet) or "6c" (vgg)
    batchnorm_track: bool = True
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True, kmeans_use_features: bool = False):
        x = jnp.transpose(x, (0, 2, 3, 1))
        if self.trunk_type == "5g":
            feats = ClusterNet5gTrunk(
                batchnorm_track=self.batchnorm_track,
                bn_axis_name=self.bn_axis_name, dtype=self.dtype)(x, train)
        else:
            feats = ClusterNet6cTrunk(
                batchnorm_track=self.batchnorm_track,
                bn_axis_name=self.bn_axis_name, dtype=self.dtype)(x, train)
        if kmeans_use_features:
            return feats
        return _linear(self, feats, self.output_k)
