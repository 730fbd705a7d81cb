"""Real-data regression smoke: the UCI-digits run that anchors the
framework's accuracy evidence (VALIDATION.md round 2: paper MNIST config
verbatim on 1,797 real digits -> 0.70 acc @ epoch 10, 0.893 best) must
not silently rot. Runs the exact paper command (examples/commands.txt:30,
dataset swapped to Digits) for a short-epoch band assertion on the real
TPU chip; skipped where no TPU is reachable (the in-process suite forces
the CPU mesh, so this drives a clean subprocess)."""

import os
import pickle
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tpu_env():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    # strip the host-platform device forcing the CPU suite adds
    flags = env.get("XLA_FLAGS", "")
    flags = " ".join(f for f in flags.split()
                     if not f.startswith("--xla_force_host_platform"))
    env["XLA_FLAGS"] = flags
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _tpu_reachable(env, tries=4, pause=45):
    """Probe the chip from a clean subprocess. The axon tunnel serves one
    client at a time and a client connecting while the previous session
    tears down can block in init — so a timed-out probe is retried (the
    stuck session clears once the killed probe dies), and only repeated
    failure reports unreachable."""
    for i in range(tries):
        if i:
            time.sleep(pause)
        try:
            probe = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(jax.default_backend())"],
                env=env, capture_output=True, text=True, timeout=120)
        except subprocess.TimeoutExpired:
            continue
        if probe.returncode == 0 and "tpu" in probe.stdout:
            return True
    return False


@pytest.mark.slow
def test_digits_paper_config_short_epoch_band(tmp_path):
    env = _tpu_env()
    if not _tpu_reachable(env):
        pytest.skip("no real TPU reachable from a clean subprocess")

    # examples/commands.txt:30 verbatim, dataset MNIST -> Digits,
    # truncated to 12 epochs (historical trajectory: 0.70 @ epoch 10,
    # VALIDATION.md round-2 table)
    argv = [sys.executable, "-m", "iic_tpu.cli.cluster_greyscale_twohead",
            "--model_ind", "1", "--arch", "ClusterNet6cTwoHead",
            "--mode", "IID", "--dataset", "Digits", "--gt_k", "10",
            "--output_k_A", "50", "--output_k_B", "10",
            "--lamb_A", "1.0", "--lamb_B", "1.0", "--lr", "0.0001",
            "--num_epochs", "12", "--batch_sz", "700",
            "--num_dataloaders", "5", "--num_sub_heads", "5",
            "--crop_orig", "--crop_other", "--tf1_crop", "centre_half",
            "--tf2_crop", "random", "--tf1_crop_sz", "20",
            "--tf2_crop_szs", "16", "20", "24", "--input_sz", "24",
            "--rot_val", "25", "--no_flip", "--head_B_epochs", "2",
            "--out_root", str(tmp_path)]
    proc = subprocess.run(argv, env=env, capture_output=True, text=True,
                          timeout=3000)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]

    with open(tmp_path / "1" / "config.pickle", "rb") as f:
        meta = pickle.load(f)
    accs = np.array(meta["history"]["eval"].epoch_acc, float)
    assert len(accs) == 12  # pre-eval + 11 epochs (1..11)
    best = accs.max()
    # Band: chance is 0.10; the recorded trajectory reaches 0.70 @ epoch
    # 10 (0.893 at convergence — VALIDATION.md round-2 table; re-observed
    # each round in the slow-suite record). 0.60 sits 0.10 under the
    # observed short-run best while catching any regression that
    # meaningfully slows learning (tightened from 0.45 per round-4
    # verdict item 4).
    assert best >= 0.60, f"digits regression: best acc {best:.3f} < 0.60"
    # and the trajectory must actually improve on the random init
    assert best - accs[0] >= 0.25, (accs[0], best)
