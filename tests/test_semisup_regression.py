"""Real-chip semisup learning regression — the third workload gets the
same guard clustering (test_digits_regression) and segmentation
(test_seg_regression) have: the full reference pipeline — IID+
overclustering pretrain (cluster_greyscale, examples/commands.txt:36
shape) -> SupHead5 dual-lr finetune (IID_semisup_STL10,
commands.txt:45) -> 10-crop block-averaged eval — on real Digits,
against the chip.

Both CLI mains run inside ONE subprocess: the axon tunnel serves one
client at a time, and a fresh client connecting immediately after the
previous one exits can block forever in init (observed twice with
back-to-back pretrain/finetune subprocesses; killed clients' sessions
clear within minutes). One process = one tunnel session = no handoff.

Calibration (round 5, real chip, this exact config): the 10-epoch IID+
pretrain reaches many-to-one acc 0.43 (a deliberately short, weak
trunk — trunk quality is NOT what this test discriminates); the
finetune goes 0.14 (random head) -> 0.81 after ONE epoch -> best 0.87,
with epoch-averaged CE 1.03 -> 0.21; ~12 min wall including compiles.
The long-run reference point is 0.929 @ 40 epochs from the round-2
table (VALIDATION.md). Digits cannot discriminate trunk quality
(random trunks also finetune to ~0.9 — VALIDATION.md round-2 caveat);
this guards the semisup MECHANICS on chip: old-run reload, dual-lr
optax.multi_transform step, tf2 finetune augmentation, TenCrop eval."""

import os
import pickle
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from test_digits_regression import _tpu_env, _tpu_reachable

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DRIVER = textwrap.dedent("""
    import sys
    out_root = sys.argv[1]
    from iic_tpu.cli import IID_semisup_STL10, cluster_greyscale
    cluster_greyscale.main([
        "--model_ind", "910", "--arch", "ClusterNet6c",
        "--mode", "IID+", "--dataset", "Digits", "--gt_k", "10",
        "--output_k", "20", "--lamb", "1.0", "--lr", "0.0001",
        "--num_epochs", "10", "--batch_sz", "700",
        "--num_dataloaders", "3", "--num_sub_heads", "1",
        "--crop_orig", "--crop_other", "--tf1_crop", "centre_half",
        "--tf2_crop", "random", "--tf1_crop_sz", "20",
        "--tf2_crop_szs", "16", "20", "24", "--input_sz", "24",
        "--rot_val", "25", "--no_flip", "--out_root", out_root])
    IID_semisup_STL10.main([
        "--model_ind", "911", "--old_model_ind", "910",
        "--arch", "SupHead5", "--head_lr", "0.001",
        "--trunk_lr", "0.0001", "--num_epochs", "11",
        "--new_batch_sz", "128", "--out_root", out_root])
""")


@pytest.mark.slow
def test_semisup_digits_short_epoch_band(tmp_path):
    env = _tpu_env()
    if not _tpu_reachable(env):
        pytest.skip("no real TPU reachable from a clean subprocess")

    proc = subprocess.run(
        [sys.executable, "-c", _DRIVER, str(tmp_path)], env=env,
        capture_output=True, text=True, timeout=3600)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]

    with open(tmp_path / "910" / "config.pickle", "rb") as f:
        pre_meta = pickle.load(f)
    pre_accs = list(pre_meta["history"]["eval"].epoch_acc)
    assert len(pre_accs) == 10  # pre-eval + 9 training epochs

    with open(tmp_path / "911" / "config.pickle", "rb") as f:
        meta = pickle.load(f)
    accs = np.array(meta["history"]["epoch_acc"], float)
    losses = np.array(meta["history"]["epoch_loss"], float)
    assert len(accs) >= 10
    pre, best = accs[0], accs.max()
    # supervised CE must collapse and the 10-crop eval acc must leave
    # the random-head start far behind (observed 0.80 after one epoch;
    # band 0.80 over 10 epochs catches any mechanics regression without
    # chip-variance flakes)
    assert np.isfinite(losses).all()
    # chip observation: CE 1.03 -> 0.21 over 10 epochs (the first-epoch
    # value is already an average over its batches)
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])
    assert losses[-1] < 0.5, losses[-1]
    assert best >= 0.80, f"semisup regression: best acc {best:.3f} < 0.80"
    assert best - pre >= 0.30, (pre, best)
