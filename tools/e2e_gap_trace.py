"""Trace-back of the end-to-end vs device-step-only gap (VERDICT r3 #6).

Reproduces bench.py's headline loop (alternating A/B passes, prefetch
depth 2) with per-batch host-side instrumentation:

  wait_data — blocked in next() on the prefetch thread (prep/upload not
              ready);
  dispatch  — inside the jitted step call (enqueue; an async dispatch
              should be ~0, so time here is dispatch-RPC serialisation
              over the axon tunnel);
  fetch     — the end-of-pass value fetch (device drain).

and prints the decomposition against the device-step-only rate, plus a
prefetch-depth sweep. Optionally writes a jax.profiler trace of one
instrumented pass (--profile_dir DIR).

Run: python tools/e2e_gap_trace.py [--passes 4] [--profile_dir DIR]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--passes", type=int, default=4)
    parser.add_argument("--profile_dir", type=str, default="")
    parser.add_argument("--depths", type=int, nargs="+", default=[2])
    parser.add_argument("--reps", type=int, default=3)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache_bench")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench
    from iic_tpu import models
    from iic_tpu.data.prefetch import prefetch_epochs
    from iic_tpu.data.seg_pipeline import SegTrainPipeline
    from iic_tpu.parallel import create_train_state, make_seg_train_step

    cfg = bench._config()
    net = models.build("SegmentationNet10aTwoHead", cfg)
    key = jax.random.PRNGKey(0)
    dummy = jnp.zeros((2, 5, bench.INPUT_SZ, bench.INPUT_SZ), jnp.float32)
    variables = models.init_variables(net, key, dummy)
    tx = optax.adam(1e-4)
    pipe = SegTrainPipeline(cfg, ["train"])

    steps = {
        h: make_seg_train_step(
            net, tx, lamb=bench.LAMBS[h], head=h, half_T_side_dense=10,
            half_T_side_sparse_min=0, half_T_side_sparse_max=0,
            sobel=True, include_rgb=True, use_uncollapsed_loss=True,
            augment=pipe.augment)
        for h in bench.HEADS}

    # producer-side instrumentation: time host prep and upload as they
    # run ON the prefetch thread, to attribute consumer wait_data
    prep_times = []
    upload_times = []
    _orig_numpy_batch = pipe._numpy_batch
    _orig_device_put = jax.device_put

    def _timed_numpy_batch(idxs, rng):
        t0 = time.perf_counter()
        out = _orig_numpy_batch(idxs, rng)
        prep_times.append(time.perf_counter() - t0)
        return out

    def _timed_device_put(x, *a, **kw):
        t0 = time.perf_counter()
        out = _orig_device_put(x, *a, **kw)
        upload_times.append(time.perf_counter() - t0)
        return out

    pipe._numpy_batch = _timed_numpy_batch
    jax.device_put = _timed_device_put

    def _producer_summary():
        if prep_times:
            print("  producer prep ms/batch: "
                  + " ".join(f"{1000 * t:.0f}" for t in prep_times))
        if upload_times:
            tot = sum(upload_times)
            print(f"  producer upload: {len(upload_times)} puts, "
                  f"total {tot:5.2f}s, max {max(upload_times):.3f}s")
        prep_times.clear()
        upload_times.clear()

    def run(first_pass, n_passes, depth, instrument=False):
        state = create_train_state(variables, tx)
        n_pairs = 0
        waits = []
        dispatch = 0.0
        it = prefetch_epochs(pipe, range(first_pass, first_pass + n_passes),
                             depth=depth, augmented=False)
        it = iter(it)
        t_start = time.perf_counter()
        while True:
            t0 = time.perf_counter()
            try:
                e_i, imgs, masks, k = next(it)
            except StopIteration:
                break
            t1 = time.perf_counter()
            state, loss, _ = steps[bench.HEADS[e_i % 2]](
                state, (imgs, masks), k)
            t2 = time.perf_counter()
            waits.append(t1 - t0)
            dispatch += t2 - t1
            n_pairs += int(imgs.shape[0])
        t3 = time.perf_counter()
        float(loss)
        t4 = time.perf_counter()
        wall = t4 - t_start
        if instrument:
            wait_data = sum(waits)
            print(f"depth={depth}: wall {wall:6.2f}s  rate "
                  f"{n_pairs / wall:6.1f} pairs/s | wait_data "
                  f"{wait_data:5.2f}s  dispatch {dispatch:5.2f}s  "
                  f"final fetch/drain {t4 - t3:5.2f}s  "
                  f"(loop body other {t3 - t_start - wait_data - dispatch:5.2f}s)")
            print("  per-batch wait_data (s): "
                  + " ".join(f"{w:.3f}" for w in waits))
            _producer_summary()
        else:
            prep_times.clear()
            upload_times.clear()
        return n_pairs, wall

    def run_continuous(n_warm, n_timed, depth, instrument=False):
        """Steady-state measurement: ONE prefetch stream across
        warm+timed passes (like a real training run); a value-fetch
        barrier after the warm passes, then the timer. The prefetch
        thread is already ahead when the timer starts — exactly the
        state the reference's mid-epoch log timestamps measure."""
        state = create_train_state(variables, tx)
        n_pairs = 0
        waits = []
        loss = None
        it = iter(prefetch_epochs(pipe, range(n_warm + n_timed),
                                  depth=depth, augmented=False))
        t_start = None
        while True:
            t0 = time.perf_counter()
            try:
                e_i, imgs, masks, k = next(it)
            except StopIteration:
                break
            t1 = time.perf_counter()
            if e_i == n_warm and t_start is None:
                float(loss)  # barrier: warm device work fully drained
                t_start = time.perf_counter()
                t0 = t1 = t_start  # this batch's wait was warm-time
            state, loss, _ = steps[bench.HEADS[e_i % 2]](
                state, (imgs, masks), k)
            if t_start is not None:
                waits.append(t1 - t0 if t1 > t0 else 0.0)
                n_pairs += int(imgs.shape[0])
        float(loss)
        wall = time.perf_counter() - t_start
        if instrument:
            print(f"continuous depth={depth}: wall {wall:6.2f}s  rate "
                  f"{n_pairs / wall:6.1f} pairs/s over {n_pairs} pairs | "
                  f"wait_data {sum(waits):5.2f}s")
            print("  per-batch wait_data (s): "
                  + " ".join(f"{w:.3f}" for w in waits))
            _producer_summary()
        else:
            prep_times.clear()
            upload_times.clear()
        return n_pairs, wall

    # warm/compile
    run(0, 2, 2)

    # device-step-only reference rate (same measurement as bench.py)
    imgs, masks, k = next(pipe.epoch(0, augmented=False))
    st = create_train_state(variables, tx)
    rates = {}
    for h in bench.HEADS:
        st, loss, _ = steps[h](st, (imgs, masks), k)
        float(loss)
        t0 = time.perf_counter()
        for i in range(20):
            st, loss, _ = steps[h](st, (imgs, masks),
                                   jax.random.fold_in(k, i))
        float(loss)
        rates[h] = 20 * bench.BATCH_SZ / (time.perf_counter() - t0)
    mix = 2.0 / (1.0 / rates["A"] + 1.0 / rates["B"])
    print(f"device-step-only: A {rates['A']:.1f}  B {rates['B']:.1f}  "
          f"mix {mix:.1f} pairs/s "
          f"(= {2 * 480 / mix * 1:.2f}s per A+B pass pair)")

    import jax.profiler as profiler
    for depth in args.depths:
        if args.profile_dir and depth == args.depths[0]:
            os.makedirs(args.profile_dir, exist_ok=True)
            profiler.start_trace(args.profile_dir)
        run(2, args.passes, depth, instrument=True)
        if args.profile_dir and depth == args.depths[0]:
            profiler.stop_trace()
            print(f"trace written to {args.profile_dir}")

    # steady-state (mid-stream) measurement, repeated for variance
    for rep in range(args.reps):
        run_continuous(2, args.passes, args.depths[-1], instrument=True)


if __name__ == "__main__":
    main()
