"""Print the torch-lockstep trajectory tables for VALIDATION.md.

Runs the exact lockstep comparisons from tests/test_model_parity.py
(transplanted init, identical batches, Adam on both sides: the reference
loop semantics in torch vs our fused train steps) and prints the loss
trajectories as markdown. CPU-only; ~8 min on the 1-CPU host.

Usage: python tools/lockstep_table.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def _table(name, jax_losses, torch_losses, window=6):
    print(f"\n### {name}")
    print("| step | this framework | torch reference loop | abs diff |")
    print("|---|---|---|---|")
    for s in range(window):
        d = abs(jax_losses[s] - torch_losses[s])
        print(f"| {s} | {jax_losses[s]:.6f} | {torch_losses[s]:.6f} "
              f"| {d:.1e} |")
    n = len(jax_losses)
    jm, tm = np.mean(jax_losses[-8:]), np.mean(torch_losses[-8:])
    print(f"| … mean of last 8 (of {n}) | {jm:.4f} | {tm:.4f} "
          f"| {abs(jm - tm):.3f} |")


def main():
    import test_model_parity as mp

    which = set(sys.argv[1:]) or {"cluster", "seg", "semisup"}
    if "cluster" in which:
        jl, tl = mp.run_cluster_lockstep(num_sub_heads=2, steps=40)
        _table("Clustering: ClusterNet6c + IID_loss + Adam (40 steps, b=32, "
               "k=10, 2 sub-heads)", jl, tl)

    if "seg" in which:
        jl, tl = mp.run_seg_lockstep(steps=24)
        _table("Segmentation: net10a + gather warp + collapsed displacement "
               "joint + Adam (24 steps, b=4, k=5, 2 sub-heads, |t|<=1)",
               jl, tl)

    if "semisup" in which:
        jl, tl = mp.run_semisup_lockstep(steps=10)
        _table("Semisup: net5g trunk penultimate + SupHead5 + CrossEntropy "
               "+ dual-lr Adams (10 steps, b=8, gt_k=10)", jl, tl, window=5)


if __name__ == "__main__":
    main()
