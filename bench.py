"""Benchmark: aug-pairs/sec/chip on the reference's headline throughput
workload (BASELINE.md): COCO-Stuff-3 training config — batch 120 pairs,
128x128, SegmentationNet10aTwoHead, displacement half_T_side_dense=10,
uncollapsed loss, sobel+rgb inputs. The reference sustains ~33 aug-pairs/s
on 4 GPUs (~8.25/s/GPU, derived from log timestamps — BASELINE.md row
'Train throughput').

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time
from types import SimpleNamespace

import numpy as np


REFERENCE_PAIRS_PER_SEC_PER_CHIP = 33.0 / 4.0  # 4-GPU DataParallel run


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from iic_tpu import models
    from iic_tpu.parallel import create_train_state, make_seg_train_step

    # COCO-Stuff-3 paper config (examples/commands.txt:74): batch 120,
    # input 128, k_A=15, k_B=3, 1 sub-head, half_T_side_dense=10,
    # uncollapsed loss, sobel + rgb (5 input channels).
    batch_sz = 120
    input_sz = 128
    cfg = SimpleNamespace(output_k_A=15, output_k_B=3, num_sub_heads=1,
                          input_sz=input_sz, batchnorm_track=True,
                          model_dtype="bfloat16")  # f32 heads + loss
    net = models.build("SegmentationNet10aTwoHead", cfg)

    key = jax.random.PRNGKey(0)
    dummy = jnp.zeros((2, 5, input_sz, input_sz), jnp.float32)
    variables = models.init_variables(net, key, dummy)
    tx = optax.adam(1e-4)
    state = create_train_state(variables, tx)

    step = make_seg_train_step(
        net, tx, lamb=1.0, head="B", half_T_side_dense=10,
        half_T_side_sparse_min=0, half_T_side_sparse_max=0,
        sobel=True, include_rgb=True, use_uncollapsed_loss=True,
        joint_impl="fft")

    rng = np.random.default_rng(0)
    img1 = jnp.asarray(
        rng.uniform(0, 1, (batch_sz, 4, input_sz, input_sz))
        .astype(np.float32))
    a = np.radians(10.0)
    aff = jnp.tile(jnp.asarray(
        [[np.cos(a), -np.sin(a), 0.0], [np.sin(a), np.cos(a), 0.0]],
        dtype=np.float32), (batch_sz, 1, 1))
    img2 = jnp.asarray(
        rng.uniform(0, 1, (batch_sz, 4, input_sz, input_sz))
        .astype(np.float32))
    mask = jnp.ones((batch_sz, input_sz, input_sz), jnp.float32)
    batch = (img1, img2, aff, mask)

    # warmup (compile)
    state, loss, _ = step(state, batch, key)
    jax.block_until_ready(loss)

    n_steps = 20
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, loss, _ = step(state, batch, jax.random.fold_in(key, i))
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    steps_per_sec = n_steps / dt
    pairs_per_sec = steps_per_sec * batch_sz
    result = {
        "metric": "aug-pairs/sec/chip (COCO-Stuff-3 seg train step, "
                  "batch 120, 128^2, net10a twohead, T=21 uncollapsed)",
        "value": round(pairs_per_sec, 2),
        "unit": "aug-pairs/s",
        "vs_baseline": round(
            pairs_per_sec / REFERENCE_PAIRS_PER_SEC_PER_CHIP, 2),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
