"""Doersch/Isola patch-pair sampling + masked-loss parity (host-side,
fast). Reference: code/utils/segmentation/baselines/doersch_utils.py,
isola_utils.py."""

import numpy as np
import jax.numpy as jnp

from iic_tpu.ops.baselines import doersch_loss, isola_loss
from iic_tpu.train.seg_baseline_trainers import (
    doersch_set_patches, isola_set_patches)

EPS = np.finfo(np.float64).eps  # == sys.float_info.epsilon


def test_doersch_set_patches_reference_geometry():
    """doersch_utils.py:7-44: one pair per batch; centre in
    [1.5p, sz-1.5p); radius in [1.5p, 2p); angle = position_gt * pi/4
    (classes 0 and 8 alias; no centre class); other clears floor(p/2)."""
    sz, p = 128, 11
    rng = np.random.default_rng(0)
    seen = set()
    for _ in range(300):
        centre, other, gt = doersch_set_patches(rng, sz, p)
        seen.add(gt)
        assert 0 <= gt < 9
        assert (centre >= np.floor(1.5 * p)).all()
        assert (centre < sz - 1.5 * p).all()
        border = np.floor(p / 2.0)
        assert (other >= border).all() and (other < sz - border).all()
        d = other.astype(np.float64) - centre
        # int truncation of (centre + r*(sin,cos)) can shave < 1 px/axis
        r = np.hypot(d[0], d[1])
        assert 1.5 * p - 2 <= r < 2.0 * p + 2, (r, p)
        # direction matches the class angle phi = gt*pi/4 (pol2cart:
        # dh = r sin phi, dw = r cos phi), up to truncation
        phi = gt * np.pi / 4.0
        expect = np.array([np.sin(phi), np.cos(phi)]) * r
        assert np.abs(d - expect).max() < 2.0, (gt, d, expect)
    assert seen == set(range(9))  # all 9 labels get sampled


def test_isola_set_patches_reference_geometry():
    """isola_utils.py:83-128: adjacent = diagonal block neighbours
    (both offsets exactly +-patch_side); non-adjacent at radius
    [2p, max(h,w))."""
    sz, p = 128, 11
    rng = np.random.default_rng(1)
    n_adj = 0
    for _ in range(300):
        centre, other, adj = isola_set_patches(rng, sz, p)
        d = other.astype(np.float64) - centre
        border = np.floor(p / 2.0)
        assert (other >= border).all() and (other < sz - border).all()
        if adj:
            n_adj += 1
            assert set(np.abs(d)) == {p}, d  # diagonal neighbours only
        else:
            assert np.hypot(d[0], d[1]) >= 2.0 * p - 2
    assert 100 < n_adj < 200  # ~half adjacent


def test_doersch_loss_masked():
    """Masked CE: kept samples average the per-sample CE over the kept
    count (doersch_utils.py:48-70)."""
    rng = np.random.default_rng(2)
    logits = rng.standard_normal((6, 9)).astype(np.float32)
    gt = 3
    mask = np.array([1, 1, 0, 1, 0, 1], np.float32)
    # manual reference: crossent per elem, masked sum / mask count
    lse = np.log(np.exp(logits).sum(axis=1))
    ce = lse - logits[:, gt]
    want = (mask * ce).sum() / mask.sum()
    got = float(doersch_loss(jnp.asarray(logits),
                             jnp.asarray(gt, jnp.int32),
                             jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # unmasked fallback = plain mean
    got_nm = float(doersch_loss(jnp.asarray(logits),
                                jnp.asarray(gt, jnp.int32)))
    np.testing.assert_allclose(got_nm, ce.mean(), rtol=1e-5)


def test_isola_loss_masked():
    """Masked -log p_t with the reference's eps exclusion
    (isola_utils.py:12-80): samples with p_t < machine-eps contribute 0
    to the numerator but the mask count still normalises."""
    logits = jnp.asarray([3.0, -2.0, 0.5, -50.0])[:, None]
    mask = jnp.asarray([1.0, 1.0, 0.0, 1.0])
    pred = 1.0 / (1.0 + np.exp(-np.asarray(logits[:, 0])))
    # gt adjacent: p_t = pred; logit -50 -> pred ~ 2e-22 < eps -> excluded
    want = -(np.log(pred[0]) + np.log(pred[1])) / 3.0
    got = float(isola_loss(logits, jnp.asarray(1, jnp.int32), mask))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # gt non-adjacent: p_t = 1 - pred, all four above eps; mask keeps 0,1,3
    p_t = 1.0 - pred
    want_n = -(np.log(p_t[0]) + np.log(p_t[1]) + np.log(p_t[3])) / 3.0
    got_n = float(isola_loss(logits, jnp.asarray(0, jnp.int32), mask))
    np.testing.assert_allclose(got_n, want_n, rtol=1e-5)


def test_doersch_channel_noise_semantics():
    """Colour-dropping (datasets/segmentation/baselines/doersch.py:55-73):
    per image exactly ONE rgb channel survives; the two replaced channels
    are noise with the kept channel's mean and stddev/100; non-rgb
    channels (grey) pass through untouched."""
    import jax
    from iic_tpu.train.seg_baseline_trainers import doersch_channel_noise

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (64, 4, 8, 8)).astype(np.float32)
    mean3 = jnp.asarray([0.2, 0.5, 0.8], jnp.float32)
    std3 = jnp.asarray([10.0, 20.0, 30.0], jnp.float32)  # /100 inside
    out = np.asarray(doersch_channel_noise(
        jax.random.PRNGKey(0), jnp.asarray(img), mean3, std3))
    assert out.shape == img.shape
    np.testing.assert_array_equal(out[:, 3], img[:, 3])  # grey untouched
    kept_counts = []
    for i in range(img.shape[0]):
        kept = [c for c in range(3)
                if np.array_equal(out[i, c], img[i, c])]
        assert len(kept) == 1, kept
        k = kept[0]
        kept_counts.append(k)
        for c in range(3):
            if c == k:
                continue
            # noise with the KEPT channel's stats: mean3[k] +- std3[k]/100
            m = out[i, c].mean()
            assert abs(m - float(mean3[k])) < 0.2, (i, c, m)
            s = out[i, c].std()
            assert s < 3 * float(std3[k]) / 100 + 0.05, (i, c, s)
    # all three keep-channels occur over 64 images
    assert set(kept_counts) == {0, 1, 2}


def test_compute_doersch_rgb_stats_and_cache(tmp_path):
    """Stats = masked RGB pixel mean/std over the raw train frames; a
    second call hits the doersch_stats pickle cache (reference
    doersch.py:33-37 auto-creates <dataset>_stats.pickle)."""
    import os
    from iic_tpu.data.seg_pipeline import segmentation_create_dataloaders
    from iic_tpu.train.config import SegConfig
    from iic_tpu.train.seg_baseline_trainers import (
        compute_doersch_rgb_stats)

    cfg = SegConfig(
        model_ind=53, arch="SegmentationNet10aDoersch", mode="IID",
        dataset="SyntheticSeg3x64x12", dataset_root="", gt_k=3,
        output_k_A=3, output_k_B=3, num_sub_heads=1, batch_sz=4,
        num_dataloaders=1, out_root=str(tmp_path), input_sz=56,
        include_rgb=True, doersch_stats=str(tmp_path / "stats"))
    cfg.finalize(twohead=False)
    pipe, _, _ = segmentation_create_dataloaders(cfg)
    mean, std = compute_doersch_rgb_stats(cfg, pipe)
    assert mean.shape == (3,) and std.shape == (3,)
    assert (mean > 0).all() and (mean < 1).all()

    # direct recomputation over the same raw frames
    tot, tot_sq, count = np.zeros(3), np.zeros(3), 0
    for d in pipe.datasets:
        for i in range(len(d)):
            img, label = d._load_raw(i)
            _, mask = d._filter_label(np.asarray(label))
            rgb = np.asarray(img, np.float32)[..., :3] / 255.0
            sel = rgb[mask]
            tot += sel.sum(0)
            tot_sq += (sel.astype(np.float64) ** 2).sum(0)
            count += len(sel)
    want_mean = tot / count
    want_std = np.sqrt(tot_sq / count - want_mean ** 2)
    np.testing.assert_allclose(mean, want_mean, rtol=1e-5)
    np.testing.assert_allclose(std, want_std, rtol=1e-4, atol=1e-6)

    # cache round trip: poison the pickle, the second call must read it
    cache = os.path.join(str(tmp_path / "stats"),
                         f"{cfg.dataset}_stats.pickle")
    assert os.path.exists(cache)
    import pickle as pkl
    with open(cache, "wb") as f:
        pkl.dump({"mean": np.zeros(3), "stddev": np.ones(3)}, f)
    mean2, std2 = compute_doersch_rgb_stats(cfg, pipe)
    np.testing.assert_array_equal(mean2, np.zeros(3, np.float32))
    np.testing.assert_array_equal(std2, np.ones(3, np.float32))
