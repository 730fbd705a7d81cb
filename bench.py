"""Benchmark: aug-pairs/sec/chip on the reference's headline throughput
workload (BASELINE.md): COCO-Stuff-3 training config — batch 120 pairs,
128x128, SegmentationNet10aTwoHead, displacement half_T_side_dense=10,
uncollapsed loss, sobel+rgb inputs. The reference sustains ~33 aug-pairs/s
on 4 GPUs (~8.25/s/GPU, derived from log timestamps in
examples/logs_segmentation — BASELINE.md row 'Train throughput'), measured
over its FULL training loop including its GPU-side __getitem__ pipeline.

Headline metric: the FULL pipeline rate — host batch prep (crop/pad/mask
geometry per image, as the real COCO path does) -> async device upload
with one-deep prefetch -> jitted fused program (paired augmentation +
sobel + double forward + displacement-MI loss + adam update), measured
over >= 2 epochs of a synthetic COCO-shaped dataset. The device-step-only
rate (resident batch, augmentation included) is reported alongside.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import time
from types import SimpleNamespace

import numpy as np


REFERENCE_PAIRS_PER_SEC_PER_CHIP = 33.0 / 4.0  # 4-GPU DataParallel run

BATCH_SZ = 120
INPUT_SZ = 128
RAW_SZ = 146  # host crop 146 -> 128 per image, like the pre-scaled COCO path


def _config():
    return SimpleNamespace(
        dataset=f"SyntheticSeg3x{RAW_SZ}x480", dataset_root="", mode="IID",
        batch_sz=BATCH_SZ, num_dataloaders=1, dataloader_batch_sz=BATCH_SZ,
        input_sz=INPUT_SZ, gt_k=3, output_k=3, output_k_A=15, output_k_B=3,
        num_sub_heads=1, use_coarse_labels=False,
        pre_scale_all=False, pre_scale_factor=0.33,
        use_random_scale=False, scale_min=0.6, scale_max=1.4,
        jitter_brightness=0.4, jitter_contrast=0.4, jitter_saturation=0.4,
        jitter_hue=0.125, flip_p=0.5, use_random_affine=False,
        sobel=True, no_sobel=False, include_rgb=True, using_IR=False,
        in_channels=5, eval_batch_sz=None, batchnorm_track=True,
        half_T_side_dense=10, half_T_side_sparse_min=0,
        half_T_side_sparse_max=0, model_dtype="bfloat16")


def main():
    import os

    import jax
    import jax.numpy as jnp
    import optax

    # persistent XLA compilation cache: first run pays the ~10 min of
    # compiles, reruns (and driver re-invocations on the same image) skip
    # them entirely
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache_bench")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from iic_tpu import models
    from iic_tpu.data.seg_pipeline import SegTrainPipeline
    from iic_tpu.parallel import create_train_state, make_seg_train_step

    cfg = _config()
    net = models.build("SegmentationNet10aTwoHead", cfg)

    key = jax.random.PRNGKey(0)
    dummy = jnp.zeros((2, 5, INPUT_SZ, INPUT_SZ), jnp.float32)
    variables = models.init_variables(net, key, dummy)
    tx = optax.adam(1e-4)
    state = create_train_state(variables, tx)

    pipe = SegTrainPipeline(cfg, ["train"])
    step = make_seg_train_step(
        net, tx, lamb=1.0, head="B", half_T_side_dense=10,
        half_T_side_sparse_min=0, half_T_side_sparse_max=0,
        sobel=True, include_rgb=True, use_uncollapsed_loss=True,
        joint_impl="fft", augment=pipe.augment)

    # ---- end-to-end pipeline rate (headline): host prep + prefetch +
    # fused augment/sobel/forward/loss/update, >= 2 epochs
    for imgs, masks, k in pipe.epoch(0, augmented=False):  # compile + warm
        state, loss, _ = step(state, (imgs, masks), k)
    jax.block_until_ready(loss)

    n_pairs = 0
    t0 = time.perf_counter()
    for e_i in range(1, 3):
        for imgs, masks, k in pipe.epoch(e_i, augmented=False):
            state, loss, _ = step(state, (imgs, masks), k)
            n_pairs += int(imgs.shape[0])
    jax.block_until_ready(loss)
    dt_full = time.perf_counter() - t0
    full_rate = n_pairs / dt_full

    # ---- device-step-only rate (resident batch, augmentation included)
    imgs, masks, k = next(pipe.epoch(0, augmented=False))
    state, loss, _ = step(state, (imgs, masks), k)
    jax.block_until_ready(loss)
    n_steps = 20
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, loss, _ = step(state, (imgs, masks),
                              jax.random.fold_in(k, i))
    jax.block_until_ready(loss)
    dt_step = time.perf_counter() - t0
    step_rate = n_steps * BATCH_SZ / dt_step

    # ---- device-resident dataset mode (--resident_data): the whole set
    # staged in HBM once, per-draw crop on device; full epochs, fresh
    # augmentations per sample, zero per-step host work.
    pipe_res = SegTrainPipeline(cfg, ["train"], resident=True)
    step_res = make_seg_train_step(
        net, tx, lamb=1.0, head="B", half_T_side_dense=10,
        half_T_side_sparse_min=0, half_T_side_sparse_max=0,
        sobel=True, include_rgb=True, use_uncollapsed_loss=True,
        joint_impl="fft", augment=pipe_res.augment)
    state_res = create_train_state(variables, tx)
    for i1, i2, kk in pipe_res.epoch(0, augmented=False):  # warm/compile
        state_res, loss, _ = step_res(state_res, (i1, i2), kk)
    jax.block_until_ready(loss)
    n_pairs_res = 0
    t0 = time.perf_counter()
    for e_i in range(1, 3):
        for i1, i2, kk in pipe_res.epoch(e_i, augmented=False):
            state_res, loss, _ = step_res(state_res, (i1, i2), kk)
            n_pairs_res += int(i1.shape[0])
    jax.block_until_ready(loss)
    resident_rate = n_pairs_res / (time.perf_counter() - t0)

    # ---- resident + whole-epoch lax.scan: ONE device dispatch per epoch
    # (epoch_scan=True), the fully fused XLA training loop.
    erun = make_seg_train_step(
        net, tx, lamb=1.0, head="B", half_T_side_dense=10,
        half_T_side_sparse_min=0, half_T_side_sparse_max=0,
        sobel=True, include_rgb=True, use_uncollapsed_loss=True,
        joint_impl="fft", augment=pipe_res.augment, epoch_scan=True)
    state_sc = create_train_state(
        jax.tree_util.tree_map(jnp.copy, variables), tx)
    mat, root = pipe_res.epoch_scan_inputs(0)
    state_sc, losses, _ = erun(state_sc, mat, root)  # compile + warm
    jax.block_until_ready(losses)
    n_pairs_sc = 0
    t0 = time.perf_counter()
    for e_i in range(1, 3):
        mat, root = pipe_res.epoch_scan_inputs(e_i)
        state_sc, losses, _ = erun(state_sc, mat, root)
        n_pairs_sc += mat.shape[0] * mat.shape[1]
    jax.block_until_ready(losses)
    scan_rate = n_pairs_sc / (time.perf_counter() - t0)

    result = {
        "metric": "aug-pairs/sec/chip end-to-end (COCO-Stuff-3 seg "
                  "training: host prep + prefetch + fused augment/sobel/"
                  "fwd/loss/adam, batch 120, 128^2, net10a twohead, "
                  "T=21 uncollapsed)",
        "value": round(full_rate, 2),
        "unit": "aug-pairs/s",
        "vs_baseline": round(full_rate / REFERENCE_PAIRS_PER_SEC_PER_CHIP,
                             2),
        "device_step_only": round(step_rate, 2),
        "resident_data_mode": round(resident_rate, 2),
        "resident_epoch_scan": round(scan_rate, 2),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
