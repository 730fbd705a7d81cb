"""Segmentation networks (reference: code/archs/segmentation/).

net10a: VGG11-based trunk, 3x3 convs, dilation 2 in the last two layers
(30x30 receptive field), multi-sub-head 1x1-conv+Softmax2d heads upsampled
bilinearly to input size. Output layout is (num_sub_heads, B, K, H, W) —
NCHW per head, as the segmentation loss consumes.
"""

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from iic_tpu.models.layers import MultiConvSoftmaxHead
from iic_tpu.models.vgg import VGGTrunk

# (code/archs/segmentation/net10a.py:63-64)
NET10A_CFG = ((64, 1), (128, 1), ("M", None), (256, 1), (256, 1),
              (512, 2), (512, 2))


class SegmentationNet10aTrunk(nn.Module):
    """(code/archs/segmentation/net10a.py:13-31); NHWC in/out, no flatten."""
    batchnorm_track: bool = True
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        return VGGTrunk(
            cfg=NET10A_CFG, conv_size=3, pad=1,
            batchnorm_track=self.batchnorm_track,
            bn_axis_name=self.bn_axis_name, dtype=self.dtype,
        )(x, train=train)


class SegmentationNet10a(nn.Module):
    """Single-head segmentation net
    (code/archs/segmentation/net10a.py:62-80)."""
    output_k: int
    num_sub_heads: int
    input_sz: int
    batchnorm_track: bool = True
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = jnp.transpose(x, (0, 2, 3, 1))  # NCHW -> NHWC
        feats = SegmentationNet10aTrunk(
            batchnorm_track=self.batchnorm_track,
            bn_axis_name=self.bn_axis_name, dtype=self.dtype)(x, train)
        return MultiConvSoftmaxHead(
            num_sub_heads=self.num_sub_heads, output_k=self.output_k,
            input_sz=self.input_sz)(feats)


class SegmentationNet10aTwoHead(nn.Module):
    """Two-head segmentation net
    (code/archs/segmentation/net10a_twohead.py:8-31)."""
    output_k_A: int
    output_k_B: int
    num_sub_heads: int
    input_sz: int
    batchnorm_track: bool = True
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, head: str = "B", train: bool = True):
        x = jnp.transpose(x, (0, 2, 3, 1))
        feats = SegmentationNet10aTrunk(
            batchnorm_track=self.batchnorm_track,
            bn_axis_name=self.bn_axis_name, dtype=self.dtype)(x, train)
        if head == "A":
            return MultiConvSoftmaxHead(
                num_sub_heads=self.num_sub_heads, output_k=self.output_k_A,
                input_sz=self.input_sz, name="head_A")(feats)
        elif head == "B":
            return MultiConvSoftmaxHead(
                num_sub_heads=self.num_sub_heads, output_k=self.output_k_B,
                input_sz=self.input_sz, name="head_B")(feats)
        raise ValueError(f"unknown head {head!r}")
