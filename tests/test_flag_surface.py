"""Full reference CLI flag-surface lock.

Every ``--flag`` the reference's training/baseline/semisup scripts expose
must be accepted by the corresponding iic_tpu parser (flags come from the
config dataclass fields), and every reference analysis-script flag must
appear in the corresponding analysis CLI. The flag lists below are
transcribed from the reference sources (file:line cited per block) — they
ARE the public surface, so a flag dropped from a dataclass or CLI makes
this fail, not a user's paper command.

test_cli_config.py checks the 13 paper commands parse end-to-end; this
locks the long tail of flags no paper command happens to use.
"""

import dataclasses
import re

from iic_tpu.train.config import ClusterConfig, SegConfig, SemisupConfig

# cluster scripts (cluster_sobel_twohead.py:32-108,
# cluster_greyscale_twohead.py:33-120, cluster_sobel.py:101-160,
# cluster_greyscale.py + baselines/triplets_{sobel,greyscale}.py)
CLUSTER_FLAGS = """
model_ind arch opt mode dataset dataset_root gt_k output_k output_k_A
output_k_B lamb lamb_A lamb_B lr lr_schedule lr_mult num_epochs batch_sz
num_dataloaders num_sub_heads out_root restart restart_from_best
test_code stl_leave_out_unlabelled save_freq double_eval head_A_first
head_A_epochs head_B_epochs batchnorm_track select_sub_head_on_loss
mix_train include_rgb demean per_img_demean data_mean data_std crop_orig
rand_crop_sz input_sz fluid_warp rand_crop_szs_tf rot_val cutout
cutout_p cutout_max_box save_progression crop_other tf1_crop tf2_crop
tf1_crop_sz tf2_crop_szs tf3_crop_diff tf3_crop_sz always_rot no_jitter
no_flip kmeans_on_features
""".split()

# segmentation scripts (segmentation_twohead.py:35-122,
# segmentation.py:34-120) + baselines/doersch.py:30-72, isola.py:30-66
SEG_FLAGS = """
model_ind arch opt mode dataset dataset_root use_coarse_labels
fine_to_coarse_dict include_things_labels incl_animal_things
coco_164k_curated_version gt_k output_k output_k_A output_k_B lamb
lamb_A lamb_B lr lr_schedule lr_mult use_uncollapsed_loss mask_input
num_epochs batch_sz num_dataloaders num_sub_heads out_root restart
save_freq test_code head_B_first batchnorm_track no_sobel include_rgb
pre_scale_all pre_scale_factor input_sz use_random_scale scale_min
scale_max jitter_brightness jitter_contrast jitter_saturation jitter_hue
flip_p use_random_affine aff_min_rot aff_max_rot aff_min_shear
aff_max_shear aff_min_scale aff_max_scale half_T_side_dense
half_T_side_sparse_min half_T_side_sparse_max doersch_patch_side
doersch_stats isola_patch_side max_num_kmeans_samples no_pre_eval
save_multiple verbose
""".split()

# semisup (IID_semisup_STL10.py:39-103)
SEMISUP_FLAGS = """
model_ind arch head_lr trunk_lr num_epochs new_batch_sz old_model_ind
penultimate_features random_affine affine_p cutout cutout_p
cutout_max_box restart lr_schedule lr_mult restart_new_model_ind
new_model_ind out_root
""".split()

# analysis scripts: reference flag -> our module (flags appear verbatim
# in our argparse definitions, aliases included)
ANALYSIS_FLAGS = {
    "iic_tpu/cli/analysis/eval.py": ["model_ind", "out_root"],
    "iic_tpu/cli/analysis/print_sub_heads_eval.py": ["model_inds",
                                                     "out_root"],
    "iic_tpu/cli/analysis/print_stats.py": ["model_inds", "out_root"],
    # print_examples.py:*: --num_imgs
    "iic_tpu/cli/analysis/print_examples.py": ["model_ind", "out_root",
                                               "num_imgs"],
    "iic_tpu/cli/analysis/update_config.py": ["model_ind", "out_root"],
    # colour_scheme_change.py:10-13
    "iic_tpu/cli/analysis/colour_scheme_change.py": [
        "in_dir", "file_pattern", "file_indices", "out_subdir"],
    # overcluster_fewer_labels_example.py:22-30
    "iic_tpu/cli/analysis/overcluster_fewer_labels_example.py": [
        "model_ind", "new_assign_set_szs_pc", "out_root", "use_eval",
        "dont_save", "rewrite"],
    # render_general.py:23-33 + render_potsdam.py:28-31
    "iic_tpu/cli/analysis/render_general.py": [
        "model_inds", "net_name", "imgs_dataloaders", "num",
        "reassess_acc", "get_match_only", "best_match", "out_root"],
    # clone_and_eval.py:24-26
    "iic_tpu/cli/analysis/clone_and_eval.py": ["model_ind",
                                               "old_model_ind",
                                               "out_root"],
    # count_classes.py
    "iic_tpu/cli/analysis/count_classes.py": ["model_inds"],
}


def _fields(cls):
    return {f.name for f in dataclasses.fields(cls)}


def test_cluster_flag_surface():
    missing = set(CLUSTER_FLAGS) - _fields(ClusterConfig)
    assert not missing, sorted(missing)


def test_seg_flag_surface():
    missing = set(SEG_FLAGS) - _fields(SegConfig)
    assert not missing, sorted(missing)


def test_semisup_flag_surface():
    missing = set(SEMISUP_FLAGS) - _fields(SemisupConfig)
    assert not missing, sorted(missing)


def test_analysis_flag_surface():
    import os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for rel, flags in ANALYSIS_FLAGS.items():
        src = open(os.path.join(repo, rel)).read()
        have = set(re.findall(r'"--([a-zA-Z0-9_]+)"', src))
        missing = set(flags) - have
        assert not missing, (rel, sorted(missing))


def test_parsers_accept_every_flag_value():
    """Beyond field existence: the generated parsers must actually accept
    each flag (catches a field accidentally landing in the derived-skip
    list)."""
    from iic_tpu.cli._args import parse_cluster_args, parse_seg_args

    argv = []
    for f in dataclasses.fields(ClusterConfig):
        if f.name in CLUSTER_FLAGS and not (
                f.type == "bool" or isinstance(f.default, bool)):
            continue  # value flags covered below; booleans here
        if f.name in CLUSTER_FLAGS and isinstance(f.default, bool):
            argv.append(f"--{f.name}")
    cfg = parse_cluster_args(argv)
    assert cfg.head_A_first and cfg.double_eval and cfg.cutout

    cfg = parse_cluster_args(
        "--lamb 1.5 --rand_crop_szs_tf 20 24 --data_mean 0.5 0.5".split())
    assert cfg.lamb == 1.5 and cfg.rand_crop_szs_tf == (20, 24)

    cfg = parse_seg_args(
        "--head_B_first --mask_input --use_uncollapsed_loss "
        "--doersch_stats /tmp/x --save_multiple --verbose "
        "--max_num_kmeans_samples 100".split())
    assert cfg.head_B_first and cfg.mask_input and cfg.save_multiple
    assert cfg.verbose and cfg.doersch_stats == "/tmp/x"
    assert cfg.max_num_kmeans_samples == 100
