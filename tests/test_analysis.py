"""Analysis tooling tests: run reload + re-eval, renders, truncated-label
mapping, kmeans eval, print tools."""

import os
from types import SimpleNamespace

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy end-to-end suite


@pytest.fixture(scope="module")
def stored_run(tmp_path_factory):
    """One tiny trained twohead run shared by the analysis tests."""
    from iic_tpu.train import ClusterConfig, train_cluster_twohead

    tmp = tmp_path_factory.mktemp("runs")
    cfg = ClusterConfig(
        model_ind=31, arch="ClusterNet6cTwoHead", mode="IID",
        dataset="Synthetic10x28x1x128", dataset_root="",
        gt_k=10, output_k_A=20, output_k_B=10, lr=1e-3, num_epochs=2,
        batch_sz=32, num_dataloaders=2, num_sub_heads=2,
        out_root=str(tmp), crop_orig=True, crop_other=True,
        tf1_crop="centre_half", tf1_crop_sz=20, tf2_crop="random",
        tf2_crop_szs=(16, 20, 24), input_sz=24, rot_val=25.0,
        no_flip=True, batchnorm_track=True, test_code=True, save_freq=1)
    cfg.finalize(twohead=True, sobel=False)
    train_cluster_twohead(cfg)
    return str(tmp), 31


def test_analysis_eval_reload(stored_run):
    from iic_tpu.cli.analysis.eval import main

    out_root, model_ind = stored_run
    stats = main(["--model_ind", str(model_ind), "--out_root", out_root])
    assert 0.0 <= stats["best"] <= 1.0
    assert len(stats["test_accs"]) == 2


def test_analysis_print_stats(stored_run, capsys):
    from iic_tpu.cli.analysis.print_stats import main

    out_root, model_ind = stored_run
    main(["--model_inds", str(model_ind), "--out_root", out_root])
    out = capsys.readouterr().out
    assert f"model {model_ind}" in out
    assert "best acc" in out


def test_analysis_update_config(stored_run):
    from iic_tpu.cli.analysis.update_config import main
    import pickle

    out_root, model_ind = stored_run
    main(["--model_ind", str(model_ind), "--out_root", out_root,
          "--field", "lamb", "--value", "1.5"])
    with open(os.path.join(out_root, str(model_ind),
                           "config.pickle"), "rb") as f:
        meta = pickle.load(f)
    assert meta["config"]["lamb"] == 1.5


def test_truncated_mapping_loader(stored_run):
    """Reference semantics (overcluster_fewer_labels_example.py:113-126):
    results keyed str(pc) -> (num_imgs, acc), appended to the stored
    config as assign_set_szs_pc_acc; --rewrite resets; --use_eval flips
    the BN mode; --dont_save leaves the run dir untouched."""
    import pickle

    from iic_tpu.cli.analysis.overcluster_fewer_labels_example import main

    out_root, model_ind = stored_run
    results = main(["--model_ind", str(model_ind), "--out_root", out_root,
                    "--new_assign_set_szs_pc", "1.0", "0.5"])
    assert set(results) == {"1.0", "0.5"}
    n_full = results["1.0"][0]
    assert results["0.5"][0] == n_full // 2
    for n, acc in results.values():
        assert 0.0 <= acc <= 1.0
    # persisted onto the run's config-as-db
    p = os.path.join(out_root, str(model_ind), "config.pickle")
    with open(p, "rb") as f:
        meta = pickle.load(f)
    assert set(meta["config"]["assign_set_szs_pc_acc"]) == {"1.0", "0.5"}

    # --rewrite resets the dict; --use_eval path runs; --dont_save with a
    # different pc leaves the stored dict untouched
    main(["--model_ind", str(model_ind), "--out_root", out_root,
          "--new_assign_set_szs_pc", "0.25", "--rewrite", "--use_eval"])
    with open(p, "rb") as f:
        meta = pickle.load(f)
    assert set(meta["config"]["assign_set_szs_pc_acc"]) == {"0.25"}
    main(["--model_ind", str(model_ind), "--out_root", out_root,
          "--new_assign_set_szs_pc", "0.75", "--dont_save"])
    with open(p, "rb") as f:
        meta = pickle.load(f)
    assert set(meta["config"]["assign_set_szs_pc_acc"]) == {"0.25"}


def test_print_nets(capsys):
    from iic_tpu.cli.analysis.print_nets import main

    total = main(["--arch", "ClusterNet6cTwoHead", "--input_sz", "24",
                  "--in_channels", "1", "--output_k_A", "20",
                  "--output_k_B", "10", "--num_sub_heads", "2"])
    out = capsys.readouterr().out
    assert "total params" in out
    assert total > 1_000_000  # VGG-ish trunk


def test_render_modes(tmp_path):
    from iic_tpu.utils.render import render

    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, (2, 3, 16, 16)).astype(np.float32)
    render(imgs, mode="image", name="img", out_dir=str(tmp_path))
    assert os.path.exists(tmp_path / "img_0.png")

    labels = rng.integers(0, 4, (2, 16, 16))
    render(labels, mode="preds", name="pred", out_dir=str(tmp_path))
    assert os.path.exists(tmp_path / "pred_1.png")

    mask = rng.integers(0, 2, (16, 16))
    render(mask, mode="mask", name="mask", out_dir=str(tmp_path))
    assert os.path.exists(tmp_path / "mask.png")


def test_save_progress(stored_run, tmp_path):
    from iic_tpu.cli.analysis.eval import load_run
    from iic_tpu.data.pipeline import cluster_twohead_create_dataloaders
    from iic_tpu.train.cluster_trainer import make_eval_apply
    from iic_tpu.utils.render import save_progress

    out_root, model_ind = stored_run
    config, net, state, history = load_run(out_root, model_ind)
    _, _, map_a, map_t = cluster_twohead_create_dataloaders(config)
    apply_fn = make_eval_apply(net, state, config, head="B")
    out_dir = save_progress(config, apply_fn, map_a, map_t, index=0,
                            out_dir=str(tmp_path / "prog"))
    # reference filename convention (render.py:152-155) + canvas geometry
    from PIL import Image
    path = os.path.join(
        out_dir, f"{config.model_ind}_run_50_colour_0_pointcloud_0.png")
    assert os.path.exists(path)
    assert Image.open(path).size == (148, 148)  # 2 * (scale 50 + border 24)


def test_kmeans_cluster_assess():
    from iic_tpu.evals.kmeans_eval import kmeans_cluster_assess

    rng = np.random.default_rng(0)
    centers = rng.standard_normal((4, 8)) * 5
    labels = rng.integers(0, 4, 300)
    feats = centers[labels] + 0.1 * rng.standard_normal((300, 8))
    acc = kmeans_cluster_assess(feats, labels, gt_k=4)
    assert acc > 0.95


def test_kmeans_segmentation_eval():
    from iic_tpu.evals.kmeans_eval import kmeans_segmentation_eval

    rng = np.random.default_rng(1)
    # feature maps where the feature vector encodes the label
    labels = rng.integers(0, 3, (4, 8, 8))
    feats = np.eye(3, dtype=np.float32)[labels].transpose(0, 3, 1, 2)
    feats = feats + 0.05 * rng.standard_normal(feats.shape).astype(
        np.float32)
    mask = np.ones((4, 8, 8), np.uint8)
    loader = [(feats, labels, mask)]

    stats = kmeans_segmentation_eval(lambda im: im, loader, gt_k=3,
                                     max_num_samples=200)
    assert stats["acc"] > 0.9


@pytest.fixture(scope="module")
def stored_seg_run(tmp_path_factory):
    """One tiny trained seg twohead run for the seg analysis tools."""
    from iic_tpu.train.config import SegConfig
    from iic_tpu.train.seg_trainer import train_segmentation_twohead

    tmp = tmp_path_factory.mktemp("seg_runs")
    cfg = SegConfig(
        model_ind=41, arch="SegmentationNet10aTwoHead", mode="IID",
        dataset="SyntheticSeg3x48x16", dataset_root="", gt_k=3,
        output_k_A=6, output_k_B=3, num_sub_heads=2, lr=1e-3,
        num_epochs=2, batch_sz=4, num_dataloaders=1, out_root=str(tmp),
        input_sz=40, half_T_side_dense=1, half_T_side_sparse_min=0,
        half_T_side_sparse_max=0, include_rgb=True, batchnorm_track=True,
        test_code=True, save_freq=1)
    cfg.finalize(twohead=True)
    train_segmentation_twohead(cfg)
    return str(tmp), 41


def test_render_general_reference_surface(stored_seg_run, capsys):
    """--model_inds / --net_name / --num / --imgs_dataloaders /
    --get_match_only / --reassess_acc (reference render_general.py:23-33),
    with preds rendered from the BEST sub-head reordered by its match."""
    from iic_tpu.cli.analysis.render_general import main

    out_root, model_ind = stored_seg_run
    # match-only mode renders nothing
    main(["--model_inds", str(model_ind), "--out_root", out_root,
          "--get_match_only"])
    out = capsys.readouterr().out
    assert "best sub-head" in out and "match" in out
    assert not os.path.exists(
        os.path.join(out_root, str(model_ind), "renders"))

    # reassess mode prints the acc, renders nothing
    stats = main(["--model_ind", str(model_ind), "--out_root", out_root,
                  "--reassess_acc"])
    assert 0.0 <= stats[model_ind]["best"] <= 1.0
    assert "reassessed acc" in capsys.readouterr().out

    # full render: both dataloaders, explicit net_name + reference --num
    main(["--model_inds", str(model_ind), "--out_root", out_root,
          "--net_name", "latest", "--num", "2",
          "--imgs_dataloaders", "test", "train"])
    for dl in ("test", "train"):
        d = os.path.join(out_root, str(model_ind), "renders", dl,
                         "latest")
        assert os.path.exists(os.path.join(d, "preds_0.png")), d
        assert os.path.exists(os.path.join(d, "img_1.png")), d


def test_clone_and_eval_clones_old_run(stored_seg_run):
    """--old_model_ind clones config + checkpoints into a NEW run dir and
    re-evaluates the clone (reference clone_and_eval.py:23-55)."""
    import pickle

    from iic_tpu.cli.analysis.clone_and_eval import main

    out_root, model_ind = stored_seg_run
    stats = main(["--model_ind", "42", "--old_model_ind", str(model_ind),
                  "--out_root", out_root])
    assert 0.0 <= stats["best"] <= 1.0
    new_dir = os.path.join(out_root, "42")
    assert os.path.exists(os.path.join(new_dir, "latest.ckpt"))
    with open(os.path.join(new_dir, "config.pickle"), "rb") as f:
        meta = pickle.load(f)
    assert meta["config"]["model_ind"] == 42


def test_render_best_match_override(stored_seg_run):
    """--best_match (reference render_potsdam.py:31,272-279): an explicit
    pred->gt match skips the eval pass and reorders rendered preds."""
    from iic_tpu.cli.analysis.render_general import main

    out_root, model_ind = stored_seg_run
    results = main(["--model_ind", str(model_ind), "--out_root", out_root,
                    "--best_match", "2", "0", "1", "--num", "1",
                    "--net_name", "latest", "--imgs_dataloaders", "test"])
    stats = results[model_ind]
    assert stats["best_train_sub_head_match"] == [(0, 2), (1, 0), (2, 1)]
    d = os.path.join(out_root, str(model_ind), "renders", "test", "latest")
    assert os.path.exists(os.path.join(d, "preds_0.png"))


def test_count_classes_stored_run_mode(stored_seg_run, capsys):
    """count_classes --model_inds (reference count_classes.py:13): counts
    the label distribution of STORED runs' mapping sets."""
    from iic_tpu.cli.analysis.count_classes import main

    out_root, model_ind = stored_seg_run
    counts = main(["--model_inds", str(model_ind),
                   "--out_root", out_root])
    out = capsys.readouterr().out
    assert f"model {model_ind}" in out
    assert counts.sum() > 0 and len(counts) == 3


def test_colour_scheme_file_pattern_mode(stored_seg_run):
    """colour_scheme_change --file_pattern/--file_indices/--out_subdir
    (reference colour_scheme_change.py:10-13): printf selection into a
    subdir of in_dir."""
    from iic_tpu.cli.analysis.colour_scheme_change import main

    out_root, model_ind = stored_seg_run
    in_dir = os.path.join(out_root, str(model_ind), "renders", "test",
                          "latest")  # written by the render tests above
    assert os.path.exists(os.path.join(in_dir, "preds_0.png"))
    main(["--in_dir", in_dir, "--file_pattern", "preds_%d.png",
          "--file_indices", "0", "--num_classes", "3"])
    assert os.path.exists(os.path.join(in_dir, "colour_change",
                                       "preds_0.png"))
