"""ResNet-34-style trunk blocks (reference: code/archs/cluster/residual.py).

BasicBlock: conv3x3(s)-BN-relu-conv3x3-BN (+ 1x1-conv-BN downsample when
stride != 1 or channels change), residual add, relu. Kaiming fan_out init.
NHWC activations.
"""

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from iic_tpu.models.layers import BatchNorm, kaiming_normal_fan_out


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    batchnorm_track: bool = True
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        def conv3x3(h, stride):
            return nn.Conv(
                self.planes, (3, 3), strides=(stride, stride),
                padding=[(1, 1), (1, 1)], use_bias=False,
                kernel_init=kaiming_normal_fan_out,
                dtype=self.dtype, param_dtype=jnp.float32)(h)

        def bn(h):
            return BatchNorm(
                track_running_stats=self.batchnorm_track,
                axis_name=self.bn_axis_name,
                dtype=self.dtype)(h, use_batch_stats=train)

        residual = x
        out = nn.relu(bn(conv3x3(x, self.stride)))
        out = bn(conv3x3(out, 1))

        if self.stride != 1 or x.shape[-1] != self.planes * self.expansion:
            residual = nn.Conv(
                self.planes * self.expansion, (1, 1),
                strides=(self.stride, self.stride), use_bias=False,
                kernel_init=kaiming_normal_fan_out,
                dtype=self.dtype, param_dtype=jnp.float32)(x)
            residual = bn(residual)

        return nn.relu(out + residual)


class ResNetLayer(nn.Module):
    """``_make_layer`` equivalent: ``blocks`` BasicBlocks, first may stride."""
    planes: int
    blocks: int
    stride: int = 1
    batchnorm_track: bool = True
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        for i in range(self.blocks):
            x = BasicBlock(
                planes=self.planes,
                stride=self.stride if i == 0 else 1,
                batchnorm_track=self.batchnorm_track,
                bn_axis_name=self.bn_axis_name,
                dtype=self.dtype,
            )(x, train=train)
        return x
