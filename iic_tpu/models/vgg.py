"""Cfg-driven VGG trunk (reference: code/archs/cluster/vgg.py:4-35).

cfg entries are (out_channels, dilation) or ("M", None) / ("A", None) for
max/avg pool 2x2. Convs are bias-free, stride 1, fixed padding ``pad``, each
followed by BatchNorm(track_running_stats) + ReLU. NHWC activations.
"""

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from iic_tpu.models.layers import BatchNorm, kaiming_normal_fan_in


class VGGTrunk(nn.Module):
    cfg: Sequence[Tuple[Any, Any]]
    conv_size: int
    pad: int
    batchnorm_track: bool = True
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        """x: (B, H, W, C) NHWC."""
        for out, dilation in self.cfg:
            if out == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            elif out == "A":
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(
                    features=out,
                    kernel_size=(self.conv_size, self.conv_size),
                    strides=(1, 1),
                    padding=[(self.pad, self.pad), (self.pad, self.pad)],
                    kernel_dilation=(dilation, dilation),
                    use_bias=False,
                    kernel_init=kaiming_normal_fan_in,
                    dtype=self.dtype,
                    param_dtype=jnp.float32,
                )(x)
                x = BatchNorm(
                    track_running_stats=self.batchnorm_track,
                    axis_name=self.bn_axis_name,
                    dtype=self.dtype,
                )(x, use_batch_stats=train)
                x = nn.relu(x)
        return x
