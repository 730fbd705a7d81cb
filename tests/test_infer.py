"""Inference/serving path: run reload, fused predictors (tf3 + sobel +
best sub-head + Hungarian match), StableHLO export round-trip with a
symbolic batch dimension. Uses a fabricated run directory (no training),
so the whole file is fast."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iic_tpu import infer
from iic_tpu.evals.cluster_eval import EvalHistory
from iic_tpu.train import checkpoint as ckpt
from iic_tpu.train.config import ClusterConfig, SegConfig, config_from_dict


def _fake_cluster_run(tmp_path, model_ind=31):
    from iic_tpu.train.cluster_trainer import build_net_and_state
    cfg = ClusterConfig(
        model_ind=model_ind, arch="ClusterNet6cTwoHead", mode="IID",
        dataset="Synthetic4x24x1", gt_k=4, output_k_A=8, output_k_B=4,
        num_sub_heads=2, out_root=str(tmp_path), crop_orig=True,
        crop_other=True, tf1_crop="centre", tf1_crop_sz=20,
        tf2_crop="random", tf2_crop_szs=(20,), input_sz=20, rot_val=0.0,
        no_flip=True, no_jitter=True, batchnorm_track=True)
    cfg.finalize(twohead=True, sobel=False)
    net, tx, state = build_net_and_state(cfg)
    ev = EvalHistory()
    ev.epoch_acc = [0.3, 0.6]
    # a non-identity match: cluster i -> class (i + 1) % 4
    match = [(i, (i + 1) % 4) for i in range(4)]
    ev.epoch_stats = [
        {"best_train_sub_head": 0, "best_train_sub_head_match": match},
        {"best_train_sub_head": 1, "best_train_sub_head_match": match},
    ]
    ckpt.save_checkpoint(cfg, state, {"eval": ev}, "best", last_epoch=1)
    return cfg, match


def test_load_run_and_cluster_predict(tmp_path):
    cfg, match = _fake_cluster_run(tmp_path)
    config, net, variables, stats = infer.load_run(str(tmp_path), 31)
    assert isinstance(config, ClusterConfig)
    assert stats["best_train_sub_head"] == 1  # best epoch's stats

    predict = infer.make_cluster_predictor(config, net, variables, stats)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (6, 24, 24, 1), dtype=np.uint8)
    ids = np.asarray(jax.jit(predict)(jnp.asarray(imgs)))
    assert ids.shape == (6,)
    assert ids.dtype == np.int32
    assert ((ids >= 0) & (ids < 4)).all()

    # the match table is applied: recompute raw argmax and shift by hand
    raw_table = np.array([t for _, t in sorted(match)])
    table = infer._match_table(match, 4)
    np.testing.assert_array_equal(np.asarray(table), raw_table)


def test_export_roundtrip_symbolic_batch(tmp_path):
    _fake_cluster_run(tmp_path, model_ind=32)
    config, net, variables, stats = infer.load_run(str(tmp_path), 32)
    predict = infer.make_cluster_predictor(config, net, variables, stats)

    rng = np.random.default_rng(1)
    example = rng.integers(0, 255, (2, 24, 24, 1), dtype=np.uint8)
    path = os.path.join(str(tmp_path), "model.stablehlo")
    data = infer.export_predictor(predict, example, path=path)
    assert os.path.getsize(path) == len(data) > 0

    served = infer.load_exported(path)
    # symbolic batch: different batch sizes through ONE artifact
    for b in (2, 5):
        imgs = rng.integers(0, 255, (b, 24, 24, 1), dtype=np.uint8)
        got = np.asarray(served(jnp.asarray(imgs)))
        want = np.asarray(predict(jnp.asarray(imgs)))
        np.testing.assert_array_equal(got, want)


def test_seg_predictor_from_fake_run(tmp_path):
    from iic_tpu.train.seg_trainer import build_seg_net_and_state
    cfg = SegConfig(
        model_ind=33, arch="SegmentationNet10aTwoHead", mode="IID",
        dataset="SyntheticSeg3x48x16", gt_k=3, output_k_A=6, output_k_B=3,
        num_sub_heads=1, out_root=str(tmp_path), input_sz=40,
        include_rgb=True, batchnorm_track=True, half_T_side_dense=1,
        half_T_side_sparse_min=0, half_T_side_sparse_max=0)
    cfg.finalize(twohead=True)
    net, tx, state = build_seg_net_and_state(cfg)
    ev = EvalHistory()
    ev.epoch_acc = [0.5]
    ev.epoch_stats = [{"best_train_sub_head": 0,
                       "best_train_sub_head_match": [(0, 2), (1, 0),
                                                     (2, 1)]}]
    ckpt.save_checkpoint(cfg, state, {"eval": ev}, "best", last_epoch=0)

    config, net2, variables, stats = infer.load_run(str(tmp_path), 33)
    assert isinstance(config, SegConfig)
    predict = infer.make_seg_predictor(config, net2, variables, stats)
    rng = np.random.default_rng(2)
    imgs = rng.integers(0, 255, (2, 40, 40, 3), dtype=np.uint8)
    out = np.asarray(jax.jit(predict)(jnp.asarray(imgs)))
    assert out.shape == (2, 40, 40)
    assert ((out >= 0) & (out < 3)).all()


def test_export_cli(tmp_path):
    _fake_cluster_run(tmp_path, model_ind=34)
    from iic_tpu.cli.export_model import main
    dest = os.path.join(str(tmp_path), "m.stablehlo")
    main(["--out_root", str(tmp_path), "--model_ind", "34",
          "--dest", dest, "--raw_sz", "24", "--raw_channels", "1"])
    served = infer.load_exported(dest)
    imgs = np.zeros((3, 24, 24, 1), np.uint8)
    assert np.asarray(served(jnp.asarray(imgs))).shape == (3,)
