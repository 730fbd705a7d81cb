"""Benchmark: aug-pairs/sec/chip on the reference's headline throughput
workload (BASELINE.md): COCO-Stuff-3 training config — batch 120 pairs,
128x128, SegmentationNet10aTwoHead, displacement half_T_side_dense=10,
uncollapsed loss, sobel+rgb inputs. The reference sustains ~33 aug-pairs/s
on 4 GPUs (~8.25/s/GPU, derived from log timestamps in
examples/logs_segmentation — BASELINE.md row 'Train throughput'), measured
over its FULL training loop including its GPU-side __getitem__ pipeline.

Headline metric: the FULL pipeline rate over the reference's exact epoch
structure — alternating head-A (output_k 15, lamb 1.0) and head-B
(output_k 3, lamb 1.5) full passes (segmentation_twohead.py:180,242;
examples/commands.txt:74, model 555) — host batch prep (crop/pad/mask
geometry per image, as the real COCO path does) on a background prefetch
thread -> async device upload -> jitted fused program (paired augmentation
+ sobel + double forward + Pallas displacement-MI loss + adam update).
Per-head device-step rates and the device-resident / whole-epoch-scan
modes are reported alongside.

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

# reference epoch = one full A pass then one full B pass
HEADS = ("A", "B")
LAMBS = {"A": 1.0, "B": 1.5}  # commands.txt:74 --lamb_A 1.0 --lamb_B 1.5


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
    from iic_tpu.data.prefetch import prefetch_epochs
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

    def build_steps(augment, epoch_scan=False):
        return {
            h: make_seg_train_step(
                net, tx, lamb=LAMBS[h], head=h, half_T_side_dense=10,
                half_T_side_sparse_min=0, half_T_side_sparse_max=0,
                sobel=True, include_rgb=True, use_uncollapsed_loss=True,
                augment=augment, epoch_scan=epoch_scan)
            for h in HEADS}

    steps = build_steps(pipe.augment)

    # ---- end-to-end pipeline rate (headline): A pass + B pass alternation
    # NOTE: every timing barrier below is a VALUE FETCH (float(loss)),
    # not block_until_ready - over the axon tunnel block_until_ready
    # returns before execution completes (measured: 16 queued ~193 ms
    # steps 'completed' in 0.45 s under it; float() of the
    # state-chained loss waits for the real work)
    #
    # Methodology (round 4): ONE continuous prefetch stream across
    # warm + timed passes, exactly like a real training run; the timer
    # starts at a value-fetch barrier when the first batch of the first
    # timed pass arrives. The reference number this compares against was
    # derived from MID-EPOCH log timestamps (batches 100->200 of epoch
    # 13, BASELINE.md) — steady state with its dataloader pipeline warm —
    # so charging a cold prefetch-thread start to the timed region (the
    # round-3 shape: a fresh prefetch stream inside the timed window)
    # undercounted ~9% that no sustained run pays. Pass boundaries (3 of
    # them) remain inside the timed region. depth=8 (~64 MB of host
    # batches) rides out 1-CPU prep scheduling spikes; see
    # tools/e2e_gap_trace.py and VALIDATION.md for the decomposition.
    N_WARM, N_TIMED = 2, 4
    n_pairs = 0
    loss = None
    t0 = None
    it = iter(prefetch_epochs(pipe, range(N_WARM + N_TIMED),
                              depth=8, augmented=False))
    for e_i, imgs, masks, k in it:
        if e_i == N_WARM and t0 is None:
            float(loss)  # barrier: warm/compile work fully drained
            t0 = time.perf_counter()
        state, loss, _ = steps[HEADS[e_i % 2]](state, (imgs, masks), k)
        if t0 is not None:
            n_pairs += int(imgs.shape[0])
    float(loss)
    full_rate = n_pairs / (time.perf_counter() - t0)

    # ---- device-step-only rate per head (resident batch, aug included)
    imgs, masks, k = next(pipe.epoch(0, augmented=False))
    step_rates = {}
    for h in HEADS:
        st = create_train_state(variables, tx)
        st, loss, _ = steps[h](st, (imgs, masks), k)
        float(loss)
        n_steps = 20
        t0 = time.perf_counter()
        for i in range(n_steps):
            st, loss, _ = steps[h](st, (imgs, masks),
                                   jax.random.fold_in(k, i))
        float(loss)
        step_rates[h] = n_steps * BATCH_SZ / (time.perf_counter() - t0)
    step_rate_mix = 2.0 / (1.0 / step_rates["A"] + 1.0 / step_rates["B"])

    # ---- device-resident dataset mode (--resident_data): the whole set
    # staged in HBM once, per-draw crop on device; full A+B epochs, fresh
    # augmentations per sample, zero per-step host work.
    pipe_res = SegTrainPipeline(cfg, ["train"], resident=True)
    steps_res = build_steps(pipe_res.augment)
    state_res = create_train_state(variables, tx)
    for e_i in range(2):  # warm/compile both heads
        for i1, i2, kk in pipe_res.epoch(e_i, augmented=False):
            state_res, loss, _ = steps_res[HEADS[e_i % 2]](
                state_res, (i1, i2), kk)
    float(loss)
    n_pairs_res = 0
    t0 = time.perf_counter()
    for e_i in range(2, 6):
        for i1, i2, kk in pipe_res.epoch(e_i, augmented=False):
            state_res, loss, _ = steps_res[HEADS[e_i % 2]](
                state_res, (i1, i2), kk)
            n_pairs_res += int(i1.shape[0])
    float(loss)
    resident_rate = n_pairs_res / (time.perf_counter() - t0)

    # ---- resident + whole-epoch lax.scan: ONE device dispatch per full
    # pass (epoch_scan=True), the fully fused XLA training loop.
    eruns = build_steps(pipe_res.augment, epoch_scan=True)
    state_sc = create_train_state(
        jax.tree_util.tree_map(jnp.copy, variables), tx)
    for e_i in range(2):  # warm/compile both heads
        mat, root = pipe_res.epoch_scan_inputs(e_i)
        state_sc, losses, _ = eruns[HEADS[e_i % 2]](state_sc, mat, root)
    float(losses[-1])
    n_pairs_sc = 0
    t0 = time.perf_counter()
    for e_i in range(2, 6):
        mat, root = pipe_res.epoch_scan_inputs(e_i)
        state_sc, losses, _ = eruns[HEADS[e_i % 2]](state_sc, mat, root)
        n_pairs_sc += mat.shape[0] * mat.shape[1]
    float(losses[-1])
    scan_rate = n_pairs_sc / (time.perf_counter() - t0)

    result = {
        "metric": "aug-pairs/sec/chip end-to-end (COCO-Stuff-3 seg "
                  "training, reference epoch structure: alternating "
                  "head-A k=15 / head-B k=3 full passes; host prep on "
                  "prefetch thread + fused augment/sobel/fwd/pallas-loss/"
                  "adam, batch 120, 128^2, net10a twohead, T=21 "
                  "uncollapsed)",
        "value": round(full_rate, 2),
        "unit": "aug-pairs/s",
        "vs_baseline": round(full_rate / REFERENCE_PAIRS_PER_SEC_PER_CHIP,
                             2),
        "device_step_only_head_A": round(step_rates["A"], 2),
        "device_step_only_head_B": round(step_rates["B"], 2),
        "device_step_only_mix": round(step_rate_mix, 2),
        "resident_data_mode": round(resident_rate, 2),
        "resident_epoch_scan": round(scan_rate, 2),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
