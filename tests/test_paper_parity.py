"""The paper-parity harness: every BASELINE.md row's stored command line
must parse into a valid config (guards CLI flag drift), dataset checks
must report actionable problems, and report must read run histories."""

import os
import pickle
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import paper_parity  # noqa: E402

from iic_tpu.cli._args import parse_cluster_args, parse_seg_args  # noqa


@pytest.mark.parametrize("row", paper_parity.ROWS, ids=lambda r: r.key)
def test_row_argv_parses_into_valid_config(row):
    argv = row.argv.split() + ["--dataset_root", "/data"]
    if "segmentation" in row.module:
        cfg = parse_seg_args(argv)
        cfg.finalize(twohead=True)
        assert cfg.arch.startswith("SegmentationNet10a")
        assert cfg.use_uncollapsed_loss
    else:
        cfg = parse_cluster_args(argv)
        if cfg.lamb_A == 1.0 and "lamb_A" not in row.argv:
            cfg.lamb_A = cfg.lamb
            cfg.lamb_B = cfg.lamb
        cfg.finalize(twohead=True, sobel="sobel" in row.module)
        assert cfg.arch.endswith("TwoHead")
        assert cfg.batch_sz % cfg.num_dataloaders == 0
    assert cfg.model_ind == row.model_ind
    assert cfg.mode == "IID"
    assert 0.0 < row.baseline < 1.0


def test_baseline_values_match_baseline_md():
    md = open(os.path.join(os.path.dirname(__file__), "..",
                           "BASELINE.md")).read()
    for row in paper_parity.ROWS:
        assert f"{row.baseline:.4f}" in md or str(row.baseline) in md, \
            f"{row.key}: {row.baseline} not found in BASELINE.md"


def test_checks_report_missing_layout(tmp_path):
    for row in paper_parity.ROWS:
        problems = row.check(str(tmp_path))
        assert problems, f"{row.key} check passed on an empty dir"
        assert all(isinstance(p, str) and str(tmp_path) in p or "missing"
                   in p for p in problems)


def test_check_accepts_synthetic_mnist_layout(tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    for n in ("train-images-idx3-ubyte", "train-labels-idx1-ubyte",
              "t10k-images-idx3-ubyte", "t10k-labels-idx1-ubyte"):
        (raw / n).write_bytes(b"\x00" * 16)
    assert paper_parity.ROW_MAP["mnist"].check(str(tmp_path)) == []


def test_report_reads_run_history(tmp_path, capsys):
    from types import SimpleNamespace
    ev = SimpleNamespace(epoch_acc=[0.1, 0.5, 0.6])
    d = tmp_path / "685"
    d.mkdir()
    with open(d / "config.pickle", "wb") as f:
        pickle.dump({"config": {}, "history": {"eval": ev},
                     "last_epoch": 2}, f)
    args = type("A", (), {"rows": ["mnist"], "out_root": str(tmp_path)})()
    paper_parity.cmd_report(args)
    out = capsys.readouterr().out
    assert "0.6000" in out and "BELOW baseline" in out

    ev.epoch_acc = [0.1, 0.99, 0.993]
    with open(d / "config.pickle", "wb") as f:
        pickle.dump({"config": {}, "history": {"eval": ev},
                     "last_epoch": 2}, f)
    paper_parity.cmd_report(args)
    out = capsys.readouterr().out
    assert "PARITY" in out
