"""CLI flag-surface parity: the exact paper command lines from the
reference's examples/commands.txt must parse into correct configs."""

import numpy as np
import pytest

from iic_tpu.cli._args import parse_cluster_args, parse_seg_args


def test_cifar10_paper_flags_parse():
    # model 640 command (examples/commands.txt:24), minus out-of-scope bits
    argv = ("--model_ind 640 --arch ClusterNet5gTwoHead --mode IID "
            "--dataset CIFAR10 --dataset_root /data/CIFAR --gt_k 10 "
            "--output_k_A 70 --output_k_B 10 --lamb 1.0 --lr 0.0001 "
            "--num_epochs 2000 --batch_sz 660 --num_dataloaders 3 "
            "--num_sub_heads 5 --crop_orig --rand_crop_sz 20 --input_sz 32 "
            "--head_A_first --head_B_epochs 2").split()
    cfg = parse_cluster_args(argv)
    cfg.lamb_A = cfg.lamb
    cfg.lamb_B = cfg.lamb
    cfg.finalize(twohead=True, sobel=True)
    assert cfg.arch == "ClusterNet5gTwoHead"
    assert cfg.batch_sz == 660 and cfg.num_dataloaders == 3
    assert cfg.dataloader_batch_sz == 220
    assert cfg.in_channels == 2  # sobel, no rgb
    assert cfg.eval_mode == "hung"
    assert cfg.head_A_first and cfg.head_B_epochs == 2


def test_mnist_paper_flags_parse():
    # model 685 command (examples/commands.txt:30)
    argv = ("--model_ind 685 --arch ClusterNet6cTwoHead --mode IID "
            "--dataset MNIST --dataset_root /data/MNIST --gt_k 10 "
            "--output_k_A 50 --output_k_B 10 --lamb_A 1.0 --lamb_B 1.0 "
            "--lr 0.0001 --num_epochs 3200 --batch_sz 700 "
            "--num_dataloaders 5 --num_sub_heads 5 --crop_orig "
            "--crop_other --tf1_crop centre_half --tf2_crop random "
            "--tf1_crop_sz 20 --tf2_crop_szs 16 20 24 --input_sz 24 "
            "--rot_val 25 --no_flip --head_B_epochs 2").split()
    cfg = parse_cluster_args(argv)
    cfg.finalize(twohead=True, sobel=False)
    assert cfg.tf2_crop_szs == (16, 20, 24)
    assert cfg.tf1_crop == "centre_half"
    assert cfg.in_channels == 1
    assert cfg.no_flip and cfg.rot_val == 25.0


def test_coco_stuff3_paper_flags_parse():
    # model 555 command (examples/commands.txt:74)
    argv = ("--mode IID --dataset Coco164kCuratedFew "
            "--dataset_root /data/CocoStuff164k --model_ind 555 "
            "--arch SegmentationNet10aTwoHead --num_epochs 4800 "
            "--lr 0.0001 --lamb_A 1.0 --lamb_B 1.5 --num_sub_heads 1 "
            "--batch_sz 120 --num_dataloaders 1 --use_coarse_labels "
            "--output_k_A 15 --output_k_B 3 --gt_k 3 --pre_scale_all "
            "--pre_scale_factor 0.33 --input_sz 128 "
            "--half_T_side_sparse_min 0 --half_T_side_sparse_max 0 "
            "--half_T_side_dense 10 --include_rgb "
            "--coco_164k_curated_version 6 --use_uncollapsed_loss "
            "--batchnorm_track").split()
    cfg = parse_seg_args(argv)
    cfg.finalize(twohead=True)
    assert cfg.in_channels == 5  # rgb + sobel dx dy, no IR
    assert not cfg.using_IR
    assert cfg.half_T_side_dense == 10
    assert cfg.use_uncollapsed_loss
    assert cfg.lamb_B == 1.5


def test_potsdam_paper_flags_parse():
    # model 545 command (examples/commands.txt:83)
    argv = ("--mode IID --dataset Potsdam --dataset_root /data/POTSDAM "
            "--model_ind 545 --arch SegmentationNet10aTwoHead "
            "--num_epochs 4800 --lr 0.00001 --lamb_A 1.0 --lamb_B 1.5 "
            "--num_sub_heads 1 --batch_sz 75 --num_dataloaders 1 "
            "--use_coarse_labels --output_k_A 24 --output_k_B 3 --gt_k 3 "
            "--input_sz 200 --half_T_side_sparse_min 0 "
            "--half_T_side_sparse_max 0 --half_T_side_dense 10 "
            "--include_rgb --no_sobel --jitter_brightness 0.1 "
            "--jitter_contrast 0.1 --jitter_saturation 0.1 "
            "--jitter_hue 0.1 --use_uncollapsed_loss "
            "--batchnorm_track").split()
    cfg = parse_seg_args(argv)
    cfg.finalize(twohead=True)
    assert cfg.using_IR
    assert not cfg.sobel
    assert cfg.in_channels == 4  # rgb + ir, no sobel
    assert cfg.jitter_hue == 0.1


def test_in_channels_table():
    from iic_tpu.train.config import ClusterConfig, SegConfig

    # sobel clustering: grey->2, +rgb->5
    c = ClusterConfig(include_rgb=False).finalize(sobel=True)
    assert c.in_channels == 2
    c = ClusterConfig(include_rgb=True).finalize(sobel=True)
    assert c.in_channels == 5
    # greyscale clustering: 1
    c = ClusterConfig().finalize(sobel=False)
    assert c.in_channels == 1
    # seg sobel no rgb: 2 (+1 IR for Potsdam)
    s = SegConfig(dataset="Coco164kCuratedFew", gt_k=3,
                  include_rgb=False).finalize()
    assert s.in_channels == 2
    s = SegConfig(dataset="Potsdam", gt_k=3, include_rgb=True,
                  no_sobel=True).finalize()
    assert s.in_channels == 4
    s = SegConfig(dataset="Potsdam", gt_k=3, include_rgb=True,
                  no_sobel=False).finalize()
    assert s.in_channels == 6  # rgb + dx + dy + ir


def test_seg_random_affine_flags_parse():
    """The reference's seg affine flag family (segmentation_twohead.py:
    108-115) must be settable from the CLI and reach the augment config."""
    from iic_tpu.cli._args import parse_seg_args
    cfg = parse_seg_args([
        "--use_random_affine", "--aff_min_rot", "-20", "--aff_max_rot",
        "20", "--aff_min_shear", "-5", "--aff_max_shear", "5",
        "--aff_min_scale", "0.9", "--aff_max_scale", "1.3"])
    cfg.finalize(twohead=True)
    assert cfg.use_random_affine
    assert cfg.aff_min_rot == -20.0 and cfg.aff_max_rot == 20.0
    assert cfg.aff_min_shear == -5.0 and cfg.aff_max_shear == 5.0
    assert cfg.aff_min_scale == 0.9 and cfg.aff_max_scale == 1.3
    # defaults mirror the reference's
    d = parse_seg_args([])
    assert (d.aff_min_rot, d.aff_max_rot) == (-30.0, 30.0)
    assert (d.aff_min_scale, d.aff_max_scale) == (0.8, 1.2)
    assert not d.use_random_affine


def test_seg_head_order_default_is_A_first():
    """The seg scripts default to head A first with --head_B_first
    flipping (segmentation_twohead.py:82,179-181) — the OPPOSITE of the
    cluster scripts' B-first default with --head_A_first
    (cluster_sobel_twohead.py:265)."""
    from iic_tpu.train.cluster_trainer import head_order as cluster_order
    from iic_tpu.train.config import ClusterConfig, SegConfig
    from iic_tpu.train.seg_trainer import head_order as seg_order

    assert seg_order(SegConfig()) == ["A", "B"]
    assert seg_order(SegConfig(head_B_first=True)) == ["B", "A"]
    assert cluster_order(ClusterConfig()) == ["B", "A"]
    assert cluster_order(ClusterConfig(head_A_first=True)) == ["A", "B"]
    cfg = parse_seg_args("--head_B_first".split())
    assert cfg.head_B_first


def test_seg_mask_input_parses_but_is_refused():
    """--mask_input exists on the flag surface (segmentation_twohead.py:68)
    but the reference's own dataset asserts it off (cocostuff.py:63-64);
    the pipeline refuses it the same way."""
    import pytest as _pytest
    from iic_tpu.data.seg_pipeline import segmentation_create_dataloaders

    cfg = parse_seg_args("--mask_input --dataset SyntheticSeg3x48x16".split())
    assert cfg.mask_input
    cfg.finalize(twohead=True)
    with _pytest.raises(AssertionError, match="mask_input"):
        segmentation_create_dataloaders(cfg)
