"""Real-chip segmentation learning regression (round-4 verdict item 3):
the flagship seg workload gets the same guard clustering has
(test_digits_regression). Runs segmentation_twohead — the paper COCO
flag shape (reference examples/commands.txt:74) at reduced size — on
SyntheticSegStripes, a texture-ONLY dataset where every class has an
identical per-pixel intensity histogram (seg_datasets.py): pointwise
colour carries zero information, so beating the majority-class prior
REQUIRES the displacement-invariance machinery (warp + T-window joint +
MI) to actually work. Calibration on the real chip (round 5): pre-eval
0.357 (= majority prior) -> 0.81 @ epoch 1 -> 0.92 @ epoch 3, stable
0.91+ thereafter. Skipped where no TPU is reachable (the in-process
suite forces the CPU mesh, so this drives a clean subprocess)."""

import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

from test_digits_regression import _tpu_env, _tpu_reachable

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_stripes_seg_short_epoch_band(tmp_path):
    env = _tpu_env()
    if not _tpu_reachable(env):
        pytest.skip("no real TPU reachable from a clean subprocess")

    argv = [sys.executable, "-m", "iic_tpu.cli.segmentation_twohead",
            "--model_ind", "901", "--arch", "SegmentationNet10aTwoHead",
            "--mode", "IID", "--dataset", "SyntheticSegStripes3x64x256",
            "--dataset_root", "", "--num_epochs", "8", "--lr", "0.0001",
            "--lamb_A", "1.0", "--lamb_B", "1.5", "--num_sub_heads", "1",
            "--batch_sz", "32", "--num_dataloaders", "1",
            "--output_k_A", "15", "--output_k_B", "3", "--gt_k", "3",
            "--input_sz", "64", "--half_T_side_sparse_min", "0",
            "--half_T_side_sparse_max", "0", "--half_T_side_dense", "5",
            "--use_uncollapsed_loss", "--batchnorm_track",
            "--out_root", str(tmp_path)]
    proc = subprocess.run(argv, env=env, capture_output=True, text=True,
                          timeout=3000)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]

    with open(tmp_path / "901" / "config.pickle", "rb") as f:
        meta = pickle.load(f)
    accs = np.array(meta["history"]["eval"].epoch_acc, float)
    assert len(accs) == 8  # pre-eval + 7 epochs
    pre, best = accs[0], accs.max()
    # the untrained net scores the majority prior (~0.36); pointwise
    # colour cannot beat it on this dataset, so crossing 0.80 witnesses
    # the displacement-invariance loss + warp + eval stack end to end
    # (calibrated trajectory: 0.81 @ epoch 1, 0.92 @ epoch 3)
    assert best >= 0.80, f"seg regression: best acc {best:.3f} < 0.80"
    assert best - pre >= 0.30, (pre, best)
