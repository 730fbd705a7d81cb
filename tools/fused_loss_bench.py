"""Measure --fused_loss (Pallas fused clustering IID-loss kernel) vs the
default XLA matmul-joint path, at the paper MNIST shape (reference
examples/commands.txt:30: ClusterNet6cTwoHead, batch_sz 700, k_B=10,
k_A=50, 5 sub-heads, input 24) on the real chip.

Two measurements:
  1. loss-only: vmapped 5-sub-head IID loss fwd+bwd at (700, k).
  2. full train step (fused augment + sobel-free greyscale double forward
     + loss + adam), loss_impl "xla" vs "pallas".

Run: python tools/fused_loss_bench.py
Every timing barrier is a VALUE FETCH (float(loss)) — block_until_ready
lies over the axon tunnel (VALIDATION.md round-3 correction).
"""

import os
import sys
import time
from types import SimpleNamespace

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from iic_tpu import models
from iic_tpu.data.pipeline import ClusterTrainPipeline
from iic_tpu.ops.iid_loss import IID_loss
from iic_tpu.parallel import create_train_state, make_cluster_train_step


def time_fn(fn, *args, warmup=3, iters=20):
    for _ in range(warmup):
        out = fn(*args)
        _fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fetch(out)
    return (time.perf_counter() - t0) / iters


def _fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[-1]
    np.asarray(jax.device_get(leaf)).ravel()[:1]


def loss_only(bn=700, k=10, sub=5):
    rng = np.random.default_rng(0)
    z = jax.device_put(jax.nn.softmax(
        jnp.asarray(rng.normal(size=(sub, bn, k)).astype(np.float32)), -1))
    zt = jax.device_put(jax.nn.softmax(
        jnp.asarray(rng.normal(size=(sub, bn, k)).astype(np.float32)), -1))

    def make(impl):
        def f(z, zt):
            losses, _ = jax.vmap(
                lambda a, b: IID_loss(a, b, lamb=1.0, impl=impl))(z, zt)
            return losses.mean()
        return jax.jit(jax.value_and_grad(f, argnums=(0, 1)))

    out = {}
    for impl in ("xla", "pallas"):
        f = make(impl)
        out[impl] = time_fn(f, z, zt) * 1e3
        val = float(f(z, zt)[0])
        print(f"loss-only fwd+bwd ({bn}x{k}x{sub} sub-heads) {impl}: "
              f"{out[impl]:.3f} ms  (loss {val:.5f})")
    return out


def full_step(batch=700, k=10, sub=5):
    cfg = SimpleNamespace(
        dataset=f"Synthetic10x28x1x{batch}", dataset_root="",
        mode="IID", batch_sz=batch, num_dataloaders=5, input_sz=24,
        gt_k=10, output_k_A=50, output_k_B=k, num_sub_heads=sub,
        crop_orig=True, rand_crop_sz=20, include_rgb=False,
        mix_train=False, batchnorm_track=True, greyscale=True,
        tf1_crop="random", tf1_crop_sz=20, tf2_crop="random",
        tf2_crop_szs=(16, 20, 24), tf3_crop_diff=False, tf3_crop_sz=20,
        rot_val=25.0, always_rot=False, no_flip=True, no_jitter=False,
        crop_other=True)
    pipe = ClusterTrainPipeline(cfg, [True])
    net = models.build("ClusterNet6cTwoHead", cfg)
    variables = models.init_variables(
        net, jax.random.PRNGKey(0), jnp.zeros((2, 1, 24, 24)))
    tx = optax.adam(1e-3)
    state0 = create_train_state(variables, tx)
    base = jax.device_put(pipe.images[:cfg.batch_sz // cfg.num_dataloaders])
    key = jax.random.PRNGKey(1)

    out = {}
    for impl in ("xla", "pallas"):
        step = make_cluster_train_step(
            net, tx, pipe.augment_pair, lamb=1.0, head="B",
            sobel=False, loss_impl=impl)
        state = state0
        # warmup/compile
        for _ in range(3):
            state, loss, _ = step(state, base, key)
            float(loss)
        t0 = time.perf_counter()
        iters = 30
        for _ in range(iters):
            state, loss, _ = step(state, base, key)
        float(loss)
        ms = (time.perf_counter() - t0) / iters * 1e3
        out[impl] = ms
        print(f"full train step (MNIST paper shape, head B) {impl}: "
              f"{ms:.2f} ms  (loss {float(loss):.5f})")
    return out


if __name__ == "__main__":
    print("devices:", jax.devices())
    lo = loss_only()
    fs = full_step()
    print(f"\nsummary: loss-only pallas/xla = "
          f"{lo['pallas'] / lo['xla']:.2f}x, "
          f"full-step pallas/xla = {fs['pallas'] / fs['xla']:.2f}x")
