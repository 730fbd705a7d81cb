"""Persistent-compile-cache regression guard (round-4 verdict item 5):
the trainers point JAX's persistent compilation cache at
out_root/.jax_cache by default (checkpoint.enable_compile_cache), so a
restart skips the multi-minute fused-program compiles. A silent
cache-KEY regression (e.g. an unstable donated-argnums ordering or a
jitted closure rebuilt with differing static values) would quietly
restore full recompiles on every restart — invisible to all other
tests. Proof here is filesystem-level and timing-free: a first
--test_code run must POPULATE the cache, and an identically-configured
--restart run must add ZERO new entries (every program a hit).
Subprocesses run on CPU via IIC_TPU_PLATFORM with the conftest's own
cache-dir env stripped, so the trainer's out_root default is what's
exercised."""

import os
import subprocess
import sys

import pytest

from test_lazy_readers import _make_mnist

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env():
    env = dict(os.environ)
    env["IIC_TPU_PLATFORM"] = "cpu"
    env.pop("JAX_PLATFORMS", None)
    env.pop("JAX_COMPILATION_CACHE_DIR", None)  # use the trainer default
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform"))
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _cache_files(out_root):
    d = os.path.join(out_root, ".jax_cache")
    if not os.path.isdir(d):
        return set()
    return {os.path.join(r, f) for r, _, fs in os.walk(d) for f in fs}


@pytest.mark.slow
def test_second_trainer_run_hits_compile_cache(tmp_path):
    _make_mnist(str(tmp_path / "data"), n_train=60, n_test=20)
    env = _env()
    base = [sys.executable, "-m", "iic_tpu.cli.cluster_greyscale_twohead",
            "--model_ind", "1", "--arch", "ClusterNet6cTwoHead",
            "--mode", "IID", "--dataset", "MNIST", "--gt_k", "10",
            "--output_k_A", "50", "--output_k_B", "10",
            "--lamb_A", "1.0", "--lamb_B", "1.0", "--lr", "0.0001",
            "--num_epochs", "3", "--batch_sz", "20",
            "--num_dataloaders", "5", "--num_sub_heads", "5",
            "--crop_orig", "--crop_other", "--tf1_crop", "centre_half",
            "--tf2_crop", "random", "--tf1_crop_sz", "20",
            "--tf2_crop_szs", "16", "20", "24", "--input_sz", "24",
            "--rot_val", "25", "--no_flip", "--head_B_epochs", "2",
            "--save_freq", "1", "--test_code",
            "--dataset_root", str(tmp_path / "data"),
            "--out_root", str(tmp_path)]

    p1 = subprocess.run(base, env=env, capture_output=True, text=True,
                        timeout=1200)
    assert p1.returncode == 0, p1.stdout[-3000:] + p1.stderr[-2000:]
    files1 = _cache_files(str(tmp_path))
    # tiny eager-init programs (jit__normal, ~25 KB) hover around the
    # 1.0 s min_compile_time persistence threshold and flip between runs
    # on host timing noise; the cache's raison d'être is the fused
    # train/eval programs (~350 KB). Gate on size, not name.
    BIG = 100_000
    big1 = {f for f in files1 if os.path.getsize(f) >= BIG}
    assert big1, ("first run cached no large fused program — "
                  f"entries: {[os.path.basename(f) for f in files1]}")

    # identically-configured restart: resumes at epoch 2, retraces the
    # same train/eval programs — every EXPENSIVE one must be a cache HIT
    p2 = subprocess.run(base + ["--restart"], env=env, capture_output=True,
                        text=True, timeout=1200)
    assert p2.returncode == 0, p2.stdout[-3000:] + p2.stderr[-2000:]
    files2 = _cache_files(str(tmp_path))
    new_big = {f for f in files2 - files1 if os.path.getsize(f) >= BIG}
    assert not new_big, (
        f"restart recompiled {len(new_big)} fused program(s) — "
        f"persistent-cache keys regressed: "
        f"{sorted(os.path.basename(f) for f in new_big)[:5]}")
    # and the restart genuinely trained (history advanced past run 1)
    assert "Epoch 2" in p2.stdout
