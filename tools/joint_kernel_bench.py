"""Microbenchmark: displacement-joint implementations on the paper shape.

Times forward and forward+backward (sum-of-joint scalar pulled through
jax.grad) for the conv, FFT, and fused Pallas formulations on
(n=120, k=15, 128^2, T=21) — the COCO-Stuff-3 head-A configuration that
decides the training default (``joint_impl``) in ops/iid_seg_loss.py.

Usage: python tools/joint_kernel_bench.py [n k h half_t]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from iic_tpu.ops.iid_seg_loss import (  # noqa: E402
    displacement_joint_dense, displacement_joint_dense_fft)
from iic_tpu.ops.pallas import displacement_joint_dense_pallas  # noqa: E402


def _sync(x):
    return np.asarray(x)  # forced D2H: block_until_ready can lie via axon


def time_fn(fn, *args, iters=20):
    """fn must return a SCALAR: the axon relay transfers every result
    buffer to the host, so returning image-sized outputs times the tunnel
    (94 MB/call here), not the kernel."""
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    args = [int(a) for a in sys.argv[1:]] or [120, 15, 128, 10]
    n, k, h, half_t = args
    w = h
    key = jax.random.PRNGKey(0)
    x1 = jax.nn.softmax(
        jax.random.normal(key, (n, k, h, w), jnp.float32), axis=1)
    x2 = jax.nn.softmax(
        jax.random.normal(jax.random.fold_in(key, 1), (n, k, h, w),
                          jnp.float32), axis=1)

    impls = {
        "fft": displacement_joint_dense_fft,
        "pallas": displacement_joint_dense_pallas,
        "conv": displacement_joint_dense,
    }

    ref = None
    for name, fn in impls.items():
        fwd = jax.jit(lambda a, b, f=fn: f(a, b, half_t))
        # scalar outputs: sum of P for forward timing, sum of both input
        # grads for fwd+bwd timing (see time_fn)
        fwd_s = jax.jit(lambda a, b, f=fn: jnp.sum(f(a, b, half_t)))
        g_fn = jax.grad(lambda a, b, f=fn: jnp.sum(f(a, b, half_t) ** 2),
                        argnums=(0, 1))
        grad_s = jax.jit(lambda a, b, g=g_fn: sum(
            jnp.sum(d) for d in g(a, b)))
        P = np.asarray(fwd(x1, x2))
        if ref is None:
            ref = P
            err = 0.0
        else:
            err = float(np.max(np.abs(P - ref)) / np.max(np.abs(ref)))
        t_f = time_fn(fwd_s, x1, x2)
        t_g = time_fn(grad_s, x1, x2)
        print(f"{name:8s} fwd {t_f:7.2f} ms   grad(fwd+bwd) {t_g:7.2f} ms"
              f"   max rel err vs {list(impls)[0]}: {err:.2e}")


if __name__ == "__main__":
    main()
