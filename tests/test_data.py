"""Data layer tests: transform semantics (vs torch/PIL where meaningful),
pairing structure, determinism, reader formats via generated fixture files."""

import gzip
import os
import pickle
from types import SimpleNamespace

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iic_tpu.data import readers, transforms
from iic_tpu.data.pipeline import (
    ClusterTrainPipeline, MappingLoader, cluster_twohead_create_dataloaders)


# ----------------------------------------------------------- transforms

def test_to_grey_matches_pil():
    PIL = pytest.importorskip("PIL.Image")
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    pil_grey = np.asarray(
        PIL.fromarray(img).convert("L")).astype(np.float32)
    ours = np.asarray(
        transforms.to_grey(jnp.asarray(img, jnp.float32)))[..., 0]
    # PIL rounds to uint8; allow 1 grey level
    np.testing.assert_allclose(ours, pil_grey, atol=1.0)


def test_center_crop_and_random_crop():
    img = jnp.arange(8 * 8 * 1, dtype=jnp.float32).reshape(8, 8, 1)
    c = transforms.center_crop(img, 4)
    assert c.shape == (4, 4, 1)
    np.testing.assert_array_equal(np.asarray(c)[..., 0],
                                  np.asarray(img)[2:6, 2:6, 0])
    # random crops stay in bounds and vary
    crops = set()
    for i in range(20):
        r = transforms.random_crop(img, jax.random.PRNGKey(i), 4)
        crops.add(float(np.asarray(r)[0, 0, 0]))
    assert len(crops) > 3


def test_random_flip_is_bernoulli():
    img = jnp.arange(4 * 4, dtype=jnp.float32).reshape(4, 4, 1)
    flipped = [bool(np.allclose(
        np.asarray(transforms.random_flip(img, jax.random.PRNGKey(i))),
        np.asarray(img)[:, ::-1])) for i in range(40)]
    frac = np.mean(flipped)
    assert 0.2 < frac < 0.8


def test_rotation_identity_at_zero():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 1, (12, 12, 1)).astype(np.float32))
    out = transforms.random_rotation(img, jax.random.PRNGKey(0), 0.0,
                                     always=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_color_jitter_brightness_only():
    img = jnp.full((8, 8, 3), 0.5, jnp.float32)
    out = transforms.color_jitter(img, jax.random.PRNGKey(0),
                                  brightness=0.4, contrast=0.0,
                                  saturation=0.0, hue=0.0)
    arr = np.asarray(out)
    # uniform image: contrast/saturation/hue no-ops, brightness scales
    assert np.allclose(arr, arr[0, 0, 0])
    assert 0.5 * 0.6 - 1e-5 <= arr[0, 0, 0] <= 0.5 * 1.4 + 1e-5


def test_hue_rotation_preserves_value():
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.uniform(0, 1, (6, 6, 3)).astype(np.float32))
    out = transforms._adjust_hue(img, 0.25)
    # max channel value (HSV V) preserved under hue rotation
    np.testing.assert_allclose(np.asarray(out).max(-1),
                               np.asarray(img).max(-1), atol=1e-4)
    # full turn = identity
    out_full = transforms._adjust_hue(img, 1.0)
    np.testing.assert_allclose(np.asarray(out_full), np.asarray(img),
                               atol=1e-4)


def test_cutout_zeroes_a_box():
    img = jnp.ones((16, 16, 1), jnp.float32)
    out = np.asarray(transforms.random_cutout(
        img, jax.random.PRNGKey(0), 4, 8))
    n_zero = (out == 0).sum()
    assert n_zero >= 4 * 4 // 2  # at least half the min box (even halving)
    assert n_zero < 16 * 16  # not everything


# ----------------------------------------------------------- pipelines

def _mnist_like_config(**kw):
    cfg = SimpleNamespace(
        dataset="Synthetic10x28x1", dataset_root="", mode="IID",
        batch_sz=40, num_dataloaders=4, input_sz=24, gt_k=10,
        output_k_A=50, output_k_B=10, num_sub_heads=2,
        crop_orig=True, crop_other=True, tf1_crop="centre_half",
        tf1_crop_sz=20, tf2_crop="random", tf2_crop_szs=[16, 20, 24],
        rot_val=25.0, no_flip=True, no_jitter=False,
        include_rgb=False, mix_train=False)
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def test_pipeline_pairing_structure():
    """tf1 side = one draw tiled r times; tf2 side = r independent draws."""
    cfg = _mnist_like_config()
    pipe = ClusterTrainPipeline(cfg, [True])
    imgs, imgs_tf = next(pipe.epoch(0))
    b = cfg.batch_sz // cfg.num_dataloaders
    assert imgs.shape == (cfg.batch_sz, 1, 24, 24)
    assert imgs_tf.shape == (cfg.batch_sz, 1, 24, 24)
    a = np.asarray(imgs)
    # tiled: copy j of image i equals copy 0 of image i
    np.testing.assert_allclose(a[:b], a[b:2 * b], atol=1e-6)
    # tf2 copies differ
    t = np.asarray(imgs_tf)
    assert np.abs(t[:b] - t[b:2 * b]).max() > 1e-3


def test_pipeline_deterministic_per_epoch():
    cfg = _mnist_like_config()
    pipe = ClusterTrainPipeline(cfg, [True])
    a1, _ = next(pipe.epoch(3))
    a2, _ = next(pipe.epoch(3))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    b1, _ = next(pipe.epoch(4))
    assert np.abs(np.asarray(a1) - np.asarray(b1)).max() > 1e-3


def test_twohead_factory_and_mapping_loader():
    cfg = _mnist_like_config()
    pipe_a, pipe_b, map_a, map_t = cluster_twohead_create_dataloaders(cfg)
    assert len(pipe_a) == len(pipe_b)
    imgs, labels = next(iter(map_a))
    assert imgs.shape[1:] == (1, 24, 24)
    assert labels.shape[0] == imgs.shape[0]
    assert imgs.dtype == jnp.float32
    # tf3 deterministic: two iterations identical
    imgs2, _ = next(iter(map_a))
    np.testing.assert_array_equal(np.asarray(imgs), np.asarray(imgs2))


def test_sobel_path_pipeline_channels():
    cfg = _mnist_like_config(dataset="Synthetic10x32x3", include_rgb=True,
                             rand_crop_sz=20, input_sz=32)
    pipe = ClusterTrainPipeline(cfg, [True])
    imgs, imgs_tf = next(pipe.epoch(0))
    assert imgs.shape[1] == 4  # rgb + grey
    cfg2 = _mnist_like_config(dataset="Synthetic10x32x3", include_rgb=False,
                              rand_crop_sz=20, input_sz=32)
    pipe2 = ClusterTrainPipeline(cfg2, [True])
    imgs2, _ = next(pipe2.epoch(0))
    assert imgs2.shape[1] == 1  # grey only


# ----------------------------------------------------------- readers

def test_mnist_reader_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 256, (10, 28, 28), dtype=np.uint8)
    labels = rng.integers(0, 10, 10, dtype=np.uint8)

    def write_idx(path, arr, magic):
        with gzip.open(path, "wb") as f:
            f.write(magic.to_bytes(4, "big"))
            for d in arr.shape:
                f.write(d.to_bytes(4, "big"))
            f.write(arr.tobytes())

    write_idx(tmp_path / "train-images-idx3-ubyte.gz", imgs, 0x00000803)
    write_idx(tmp_path / "train-labels-idx1-ubyte.gz", labels, 0x00000801)
    d = readers.load_mnist(str(tmp_path), train=True)
    np.testing.assert_array_equal(d["images"][..., 0], imgs)
    np.testing.assert_array_equal(d["labels"], labels)


def test_cifar10_reader_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    base = tmp_path / "cifar-10-batches-py"
    base.mkdir()
    all_imgs, all_labels = [], []
    for i in range(1, 6):
        data = rng.integers(0, 256, (20, 3 * 32 * 32), dtype=np.uint8)
        labels = rng.integers(0, 10, 20).tolist()
        with open(base / f"data_batch_{i}", "wb") as f:
            pickle.dump({"data": data, "labels": labels}, f)
        all_imgs.append(data)
        all_labels += labels
    d = readers.load_cifar10(str(tmp_path), train=True)
    assert d["images"].shape == (100, 32, 32, 3)
    np.testing.assert_array_equal(d["labels"], all_labels)
    expected = np.concatenate(all_imgs).reshape(-1, 3, 32, 32)
    np.testing.assert_array_equal(d["images"].transpose(0, 3, 1, 2),
                                  expected)


def test_cifar20_mapping_matches_reference_dict():
    # spot-check several entries of the published fine->coarse table
    assert readers.CIFAR100_TO_CIFAR20[0] == 4
    assert readers.CIFAR100_TO_CIFAR20[99] == 13
    assert readers.CIFAR100_TO_CIFAR20[50] == 16
    assert readers.CIFAR100_TO_CIFAR20[71] == 10
    assert len(readers.CIFAR100_TO_CIFAR20) == 100
    # every coarse class has exactly 5 fine classes
    counts = np.bincount(readers.CIFAR100_TO_CIFAR20)
    assert (counts == 5).all()


def test_stl10_mix_train_interleave_ids():
    ids = readers.reorder_train_deterministic_ids(5000, 20)
    assert len(ids) == 105000
    assert ids[0] == 0
    np.testing.assert_array_equal(ids[1:21], np.arange(5000, 5020))
    assert ids[21] == 1
    assert sorted(ids.tolist()) == list(range(105000))


def test_synthetic_is_clusterable():
    d = readers.make_synthetic(200, 5, 24, 1, seed=0)
    assert d["images"].shape == (200, 24, 24, 1)
    # same-class images correlate more than cross-class
    imgs = d["images"].astype(np.float32) / 255.0
    labels = d["labels"]
    c0 = imgs[labels == 0].reshape(-1, 24 * 24)
    c1 = imgs[labels == 1].reshape(-1, 24 * 24)
    within = np.corrcoef(c0[0], c0[1])[0, 1]
    across = np.corrcoef(c0[0], c1[0])[0, 1]
    assert within > across


def _write_image_folder(root, sizes_by_class):
    """Create class-per-subfolder pngs; returns total count."""
    import cv2
    n = 0
    for cname, sizes in sizes_by_class.items():
        cdir = os.path.join(root, cname)
        os.makedirs(cdir, exist_ok=True)
        for i, (h, w) in enumerate(sizes):
            img = np.full((h, w, 3), 30 * (n + 1) % 255, np.uint8)
            cv2.imwrite(os.path.join(cdir, f"im_{i}.png"), img)
            n += 1
    return n


def test_image_folder_reader(tmp_path):
    """ImageFolder conventions: classes sorted alphabetically, files sorted,
    mixed sizes resized to the modal (h, w)."""
    root = str(tmp_path)
    _write_image_folder(os.path.join(root, "train"),
                        {"b_class": [(20, 20), (20, 20)],
                         "a_class": [(20, 20), (16, 24)]})
    d = readers.load_image_folder(root, "train")
    assert d["images"].shape == (4, 20, 20, 3)
    # a_class sorts first -> label 0
    np.testing.assert_array_equal(d["labels"], [0, 0, 1, 1])


def test_create_basic_clustering_dataloaders_imagefolder(tmp_path):
    """The README-advertised public API over a user image directory
    (reference data.py:502-601): deterministic shuffled order, twohead
    pipelines, mapping loaders only when dataset_root/none exists."""
    from types import SimpleNamespace
    from iic_tpu.data.pipeline import create_basic_clustering_dataloaders

    root = str(tmp_path)
    _write_image_folder(os.path.join(root, "train"),
                        {"a": [(24, 24)] * 6, "b": [(24, 24)] * 6})
    cfg = SimpleNamespace(
        dataset="ImageFolder", dataset_root=root, mode="IID",
        batch_sz=4, num_dataloaders=2, input_sz=16, gt_k=2,
        crop_orig=True, rand_crop_sz=20, include_rgb=True,
        fluid_warp=False, cutout=False, demean=False,
        per_img_demean=False, batchnorm_track=True)
    pa, pb, ma, mt = create_basic_clustering_dataloaders(cfg)
    assert ma is None and mt is None  # no dataset_root/none directory

    base, key = next(pa.epoch(0, augmented=False))
    assert base.shape == (2, 24, 24, 3)  # dataloader_batch_sz = 4 // 2
    imgs, imgs_tf = pa.augment_pair(base, key)
    assert imgs.shape == (4, 4, 16, 16)  # b*r, rgb+grey, sz, sz

    # deterministic shuffle: same epoch -> same order; not plain sequential
    b0 = np.asarray(next(pa.epoch(0, augmented=False))[0])
    b0_again = np.asarray(next(pa.epoch(0, augmented=False))[0])
    np.testing.assert_array_equal(b0, b0_again)
    orders = [np.asarray(next(pa.epoch(e, augmented=False))[0])
              for e in range(4)]
    assert any(np.any(orders[i] != orders[0]) for i in range(1, 4))
    # both heads see the same deterministic order
    np.testing.assert_array_equal(
        b0, np.asarray(next(pb.epoch(0, augmented=False))[0]))

    # with a labelled "none" dir, mapping loaders appear
    _write_image_folder(os.path.join(root, "none"),
                        {"a": [(24, 24)] * 2, "b": [(24, 24)] * 2})
    cfg2 = SimpleNamespace(**{**vars(cfg)})
    _, _, ma2, mt2 = create_basic_clustering_dataloaders(cfg2)
    imgs, labels = next(iter(ma2))
    assert imgs.shape == (4, 4, 16, 16)
    np.testing.assert_array_equal(sorted(labels), [0, 0, 1, 1])


def test_image_folder_modal_shape_over_tuples(tmp_path):
    """Mixed sizes resize to the modal (h, w) TUPLE — per-axis modes could
    combine into a shape no image has."""
    root = str(tmp_path)
    _write_image_folder(os.path.join(root, "train"),
                        {"a": [(20, 30), (20, 30), (20, 30), (40, 10),
                               (40, 10), (20, 10)]})
    d = readers.load_image_folder(root, "train")
    assert d["images"].shape[1:3] == (20, 30)


def test_basic_dataloaders_share_decoded_arrays(tmp_path):
    """create_basic_clustering_dataloaders decodes the user dataset once;
    head A and head B pipelines share the arrays."""
    from types import SimpleNamespace
    from iic_tpu.data.pipeline import create_basic_clustering_dataloaders
    root = str(tmp_path)
    _write_image_folder(os.path.join(root, "train"),
                        {"a": [(24, 24)] * 4, "b": [(24, 24)] * 4})
    cfg = SimpleNamespace(
        dataset="ImageFolder", dataset_root=root, mode="IID",
        batch_sz=4, num_dataloaders=2, input_sz=16, gt_k=2,
        crop_orig=True, rand_crop_sz=20, include_rgb=True,
        fluid_warp=False, cutout=False, demean=False,
        per_img_demean=False, batchnorm_track=True)
    pa, pb, _, _ = create_basic_clustering_dataloaders(cfg)
    assert pa.images is pb.images


def test_digits_reader_real_data():
    """sklearn's bundled UCI digits: the one real image dataset available
    offline; wired as dataset name "Digits" for real-data accuracy runs."""
    d = readers.load_dataset("Digits", "", True)
    dt = readers.load_dataset("Digits", "", False)
    assert d["images"].shape == (1500, 24, 24, 1)
    assert dt["images"].shape == (297, 24, 24, 1)
    assert d["images"].dtype == np.uint8
    # real data: every class present, plausibly balanced
    counts = np.bincount(
        np.concatenate([d["labels"], dt["labels"]]), minlength=10)
    assert counts.min() > 150 and counts.sum() == 1797
    # nearest-upsampled x3: 3x3 blocks are constant
    img = d["images"][0, :, :, 0]
    assert np.array_equal(img[::3, ::3].repeat(3, 0).repeat(3, 1), img)


def test_digits_twohead_pipeline():
    cfg = SimpleNamespace(
        dataset="Digits", dataset_root="", mode="IID", batch_sz=64,
        num_dataloaders=2, input_sz=24, gt_k=10, output_k_A=50,
        output_k_B=10, num_sub_heads=2, crop_orig=True, crop_other=True,
        tf1_crop="centre_half", tf1_crop_sz=20, tf2_crop="random",
        tf2_crop_szs=[16, 20, 24], rot_val=25, no_flip=True,
        include_rgb=False, mix_train=False, batchnorm_track=True)
    t_a, t_b, map_a, map_t = cluster_twohead_create_dataloaders(cfg)
    assert len(t_a.images) == 1797 and len(map_a.images) == 1797
    base, key = next(t_a.epoch(0, augmented=False))
    i1, i2 = t_a.augment_pair(base, key)
    # greyscale path, r=2 tf2 draws per base image
    assert i1.shape == (64, 1, 24, 24) and i2.shape == i1.shape
    imgs, labels = next(iter(map_a))
    assert imgs.shape[1:] == (1, 24, 24) and labels.min() >= 0


def test_cluster_resident_pipeline_matches_streaming():
    """Resident cluster mode: augment_pair over gathered HBM indices gives
    bit-identical pairs to the streaming path (same images, same keys)."""
    def cfg():
        return SimpleNamespace(
            dataset="Synthetic10x28x1x96", dataset_root="", mode="IID",
            batch_sz=32, num_dataloaders=2, input_sz=24, gt_k=10,
            output_k_A=20, output_k_B=10, num_sub_heads=1, crop_orig=True,
            crop_other=True, tf1_crop="centre_half", tf1_crop_sz=20,
            tf2_crop="random", tf2_crop_szs=[16, 20, 24], rot_val=25,
            no_flip=True, include_rgb=False, mix_train=False,
            batchnorm_track=True)
    pipe_r = ClusterTrainPipeline(cfg(), [True], resident=True)
    pipe_s = ClusterTrainPipeline(cfg(), [True])
    for (ir1, ir2), (is1, is2) in zip(pipe_r.epoch(2, augmented=True),
                                      pipe_s.epoch(2, augmented=True)):
        np.testing.assert_array_equal(np.asarray(ir1), np.asarray(is1))
        np.testing.assert_array_equal(np.asarray(ir2), np.asarray(is2))


@pytest.mark.slow  # end-to-end trainer (compile-heavy)
def test_cluster_resident_trainer_smoke(tmp_path):
    from iic_tpu.train.config import ClusterConfig
    from iic_tpu.train.cluster_trainer import train_cluster_twohead
    cfg = ClusterConfig(
        model_ind=11, arch="ClusterNet6cTwoHead", mode="IID",
        dataset="Synthetic10x28x1x64", gt_k=10, output_k_A=20,
        output_k_B=10, num_sub_heads=1, batch_sz=16, num_dataloaders=2,
        crop_orig=True, crop_other=True, tf1_crop="centre_half",
        tf1_crop_sz=20, tf2_crop="random", tf2_crop_szs=[16, 20, 24],
        input_sz=24, rot_val=25, no_flip=True, head_B_epochs=1,
        batchnorm_track=True, lr=1e-3, num_epochs=2, test_code=True,
        out_root=str(tmp_path), save_freq=1, resident_data=True)
    cfg.finalize(twohead=True, sobel=False)
    state, history = train_cluster_twohead(cfg)
    assert np.isfinite(history["epoch_loss_head_B"][0])


def test_resident_lazy_staging_and_twohead_sharing():
    """Resident staging is lazy (nothing uploaded at construction) and the
    twohead factory shares ONE staged HBM copy between the heads."""
    from iic_tpu.data.pipeline import cluster_twohead_create_dataloaders

    cfg = SimpleNamespace(
        dataset="Synthetic10x28x1x96", dataset_root="", mode="IID",
        batch_sz=32, num_dataloaders=2, input_sz=24, gt_k=10,
        output_k_A=20, output_k_B=10, num_sub_heads=1, crop_orig=True,
        crop_other=True, tf1_crop="centre_half", tf1_crop_sz=20,
        tf2_crop="random", tf2_crop_szs=[16, 20, 24], rot_val=25,
        no_flip=True, include_rgb=False, mix_train=False,
        batchnorm_track=True, resident_data=True, eval_batch_sz=None)
    pipe_a, pipe_b, _, _ = cluster_twohead_create_dataloaders(cfg)
    assert pipe_a.resident and pipe_b.resident
    assert pipe_a._res_imgs is None and pipe_b._res_imgs is None  # lazy
    assert pipe_b.images is pipe_a.images  # host arrays shared
    # first use stages; the heads share the single device copy
    assert pipe_b.stage() is pipe_a.stage()


def test_resident_deterministic_shuffle_order():
    """Resident + deterministic_shuffle: epoch() yields permuted index
    batches that exactly tile epoch_scan_inputs' matrix rows."""
    cfg = SimpleNamespace(
        dataset="Synthetic10x28x1x96", dataset_root="", mode="IID",
        batch_sz=32, num_dataloaders=2, input_sz=24, gt_k=10,
        output_k_A=20, output_k_B=10, num_sub_heads=1, crop_orig=True,
        crop_other=True, tf1_crop="centre_half", tf1_crop_sz=20,
        tf2_crop="random", tf2_crop_szs=[16, 20, 24], rot_val=25,
        no_flip=True, include_rgb=False, mix_train=False,
        batchnorm_track=True)
    pipe = ClusterTrainPipeline(cfg, [True], resident=True,
                                deterministic_shuffle=True)
    idx_batches = [np.asarray(b) for b, _ in pipe.epoch(3, augmented=False)]
    flat = np.concatenate(idx_batches)
    assert sorted(flat.tolist()) == list(range(96))  # a permutation
    assert not np.array_equal(flat, np.arange(96))   # actually shuffled
    mat, _ = pipe.epoch_scan_inputs(3)
    np.testing.assert_array_equal(np.asarray(mat).ravel(),
                                  flat[:mat.size])
