"""Semi-supervised finetune head (reference: code/archs/semisup/sup_head5.py).

``SupHead5`` wraps a pretrained trunk-feature extractor: Linear(dlen, 2048)
-> BatchNorm1d -> ReLU -> Linear(2048, gt_k), no softmax. In the reference
the wrapped net is a module attribute; here the trunk forward is the caller's
responsibility (functional style): ``SupHead5Head`` maps trunk features to
logits, and the training step composes trunk.apply + head.apply so the two
parameter trees can carry different learning rates (the reference uses two
optimisers — code/scripts/semisup/IID_semisup_STL10.py:183-190).
"""

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from iic_tpu.models.layers import BatchNorm, linear_init


class SupHead5Head(nn.Module):
    gt_k: int
    batchnorm_track: bool = True
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = True):
        x = feats.astype(jnp.float32)
        d = x.shape[-1]
        k1 = self.param("kernel1", linear_init(), (d, 2048), jnp.float32)
        b1 = self.param("bias1", nn.initializers.zeros, (2048,), jnp.float32)
        x = x @ k1 + b1
        x = BatchNorm(
            track_running_stats=self.batchnorm_track,
            axis_name=self.bn_axis_name,
            dtype=jnp.float32)(x, use_batch_stats=train)
        x = nn.relu(x)
        k2 = self.param("kernel2", linear_init(), (2048, self.gt_k),
                        jnp.float32)
        b2 = self.param("bias2", nn.initializers.zeros, (self.gt_k,),
                        jnp.float32)
        return x @ k2 + b2  # logits, no softmax
