"""Distribution-level parity tests for the on-device augmentations against
the reference's torchvision/PIL semantics
(code/utils/cluster/transforms.py:12-334).

torchvision is not installed here, so expectations are hand-derived from the
reference source: sampling ranges, application probabilities and uniformity
of the random draws. Fixed seeds make every test deterministic; chi-square
checks use generous significance floors so they fail only on real
distribution drift (e.g. the round-1 modulo-biased cutout centre)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy import stats

from iic_tpu.data.transforms import (
    _adjust_brightness,
    _adjust_contrast,
    _adjust_saturation,
    center_crop,
    color_jitter,
    make_greyscale_pair_transforms,
    make_sobel_pair_transforms,
    random_crop,
    random_cutout,
    random_flip,
    random_rotation,
    resize,
)

N_SAMPLES = 3000
CHI2_P_FLOOR = 1e-4


def _keys(seed, n=N_SAMPLES):
    return jax.random.split(jax.random.PRNGKey(seed), n)


def _assert_uniform_ints(values, lo, hi, name):
    """values should be ~U{lo, ..., hi-1}: full support + chi-square."""
    values = np.asarray(values)
    assert values.min() >= lo and values.max() < hi, name
    counts = np.bincount(values - lo, minlength=hi - lo)
    assert counts.min() > 0, f"{name}: support not covered: {counts}"
    _, p = stats.chisquare(counts)
    assert p > CHI2_P_FLOOR, f"{name}: non-uniform (chi2 p={p:.2e}) {counts}"


# ------------------------------------------------------------------- cutout

def test_cutout_centre_uniform_over_valid_positions():
    """Reference custom_cutout (cluster/transforms.py:28-44): for box side b,
    x_c ~ U{half, ..., w-half-1} with half = floor(b/2). Round 1 had a
    modulo-biased draw; this catches any such bias."""
    h = w = 20
    box = 8  # fixed: min_box == max_box
    half = box // 2
    img = jnp.ones((h, w, 1), jnp.float32)

    def centre_of(key):
        out = random_cutout(img, key, box, box)
        zero = (out[:, :, 0] == 0)
        ys = jnp.argmax(zero.any(axis=1).astype(jnp.int32))
        xs = jnp.argmax(zero.any(axis=0).astype(jnp.int32))
        # box spans [c-half, c+half) -> top-left = c - half
        return ys + half, xs + half

    ys, xs = jax.vmap(centre_of)(_keys(0))
    _assert_uniform_ints(np.asarray(xs), half, w - half, "cutout x_c")
    _assert_uniform_ints(np.asarray(ys), half, h - half, "cutout y_c")


def test_cutout_box_size_uniform():
    """box_sz ~ U{min_box, ..., max_box} (np.random.randint(min, max+1))."""
    h = w = 32
    img = jnp.ones((h, w, 1), jnp.float32)

    def observed_width(key):
        out = random_cutout(img, key, 4, 10)
        zero = (out[:, :, 0] == 0)
        return zero.any(axis=0).sum()  # box width = 2 * floor(b/2)

    widths = np.asarray(jax.vmap(observed_width)(_keys(1)))
    # widths are 2*floor(b/2) for b in 4..10 -> {4, 4, 6, 6, 8, 8, 10}
    expected = np.array([2, 2, 2, 1], float) / 7  # P(width = 4, 6, 8, 10)
    counts = np.array([(widths == v).sum() for v in (4, 6, 8, 10)])
    assert counts.sum() == len(widths)
    _, p = stats.chisquare(counts, expected * len(widths))
    assert p > CHI2_P_FLOOR, f"cutout box size non-uniform: {counts}"


# -------------------------------------------------------------------- crops

def test_random_crop_offsets_uniform():
    """torchvision RandomCrop: top-left ~ U over the (h-c+1)x(w-c+1) grid."""
    h = w = 14
    crop = 8
    # encode coordinates in the pixel values to read the offset back out
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = jnp.asarray(np.stack([yy, xx], axis=-1))

    def offset_of(key):
        out = random_crop(img, key, crop)
        return out[0, 0, 0].astype(jnp.int32), out[0, 0, 1].astype(jnp.int32)

    tops, lefts = jax.vmap(offset_of)(_keys(2))
    _assert_uniform_ints(np.asarray(tops), 0, h - crop + 1, "crop top")
    _assert_uniform_ints(np.asarray(lefts), 0, w - crop + 1, "crop left")


def test_center_crop_matches_torchvision_rounding():
    """torchvision-0.4 CenterCrop: top = int(round((h - c) / 2.)) with
    py2 round-half-AWAY-from-zero, i.e. (h - c + 1) // 2 — one above
    floor whenever the size difference is odd."""
    yy, xx = np.mgrid[0:11, 0:11].astype(np.float32)
    img = jnp.asarray(np.stack([yy, xx], axis=-1))
    out = np.asarray(center_crop(img, 6))  # (11-6)/2 = 2.5 -> round = 3
    assert out[0, 0, 0] == 3
    assert out[0, 0, 1] == 3
    out_even = np.asarray(center_crop(img, 7))  # (11-7)/2 = 2 exactly
    assert out_even[0, 0, 0] == 2


# --------------------------------------------------------------------- flip

def test_flip_rate_is_half():
    img = jnp.asarray(
        np.arange(12, dtype=np.float32).reshape(1, 12, 1))

    def flipped(key):
        return (random_flip(img, key)[0, 0, 0] != img[0, 0, 0])

    rate = np.asarray(jax.vmap(flipped)(_keys(3))).mean()
    assert abs(rate - 0.5) < 0.03, rate


# ----------------------------------------------------------------- rotation

def test_rotation_application_probability():
    """RandomApply([RandomRotation(deg)], p=0.5): exactly ~half the draws
    leave the image untouched."""
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0.2, 0.8, (16, 16, 1)).astype(np.float32))

    def changed(key):
        out = random_rotation(img, key, 25.0, p=0.5)
        return jnp.abs(out - img).max() > 1e-6

    rate = np.asarray(jax.vmap(changed)(_keys(4))).mean()
    assert abs(rate - 0.5) < 0.03, rate


def test_rotation_always_flag_and_angle_bound():
    """always_rot: every draw rotates; recovered angle within ±max_deg.
    Estimate the angle from the rotation of a one-hot spoke."""
    h = 33
    c = h // 2
    img = np.zeros((h, h, 1), np.float32)
    img[c, c + 10, 0] = 1.0  # spoke at angle 0, radius 10
    img = jnp.asarray(img)
    max_deg = 25.0

    def peak_angle(key):
        out = random_rotation(img, key, max_deg, always=True)
        flat = out[:, :, 0].ravel()
        idx = jnp.argmax(flat)
        y, x = idx // h - c, idx % h - c
        return jnp.degrees(jnp.arctan2(y.astype(jnp.float32),
                                       x.astype(jnp.float32)))

    angles = np.asarray(jax.vmap(peak_angle)(_keys(5, 500)))
    # bilinear peak detection quantises to ~3 deg at radius 10
    assert np.abs(angles).max() <= max_deg + 3.5
    assert np.abs(angles).std() > 5.0  # actually varies
    # U(-25, 25) -> both polarities well represented
    assert 0.4 < (angles > 0).mean() < 0.6


# ------------------------------------------------------------- color jitter

def test_brightness_factor_range_and_uniformity():
    """ColorJitter(brightness=0.4): factor ~ U(0.6, 1.4), output img * f."""
    img = jnp.full((4, 4, 3), 0.5, jnp.float32)

    def factor_of(key):
        out = color_jitter(img, key, brightness=0.4, contrast=0.0,
                           saturation=0.0, hue=0.0)
        return out[0, 0, 0] / 0.5

    fs = np.asarray(jax.vmap(factor_of)(_keys(6)))
    assert fs.min() >= 0.6 - 1e-5 and fs.max() <= 1.4 + 1e-5
    assert abs(fs.mean() - 1.0) < 0.02
    counts, _ = np.histogram(fs, bins=10, range=(0.6, 1.4))
    _, p = stats.chisquare(counts)
    assert p > CHI2_P_FLOOR, f"brightness factor non-uniform: {counts}"


def test_jitter_factor_ranges_match_reference():
    """Reference uses ColorJitter(0.4, 0.4, 0.4, 0.125)
    (cluster/transforms.py:188-189): contrast/saturation factors in
    (0.6, 1.4), hue delta in (-0.125, 0.125). Bound checks per-op."""
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0.3, 0.7, (6, 6, 3)).astype(np.float32))

    # contrast: blend towards mean of grey image
    for f in (0.6, 1.4):
        out = _adjust_contrast(img, f)
        assert np.isfinite(np.asarray(out)).all()
    # extremes of the composed op stay in [0, 1]
    outs = jax.vmap(lambda k: color_jitter(img, k))(_keys(7, 200))
    o = np.asarray(outs)
    assert o.min() >= 0.0 and o.max() <= 1.0


def test_jitter_applies_ops_in_random_order():
    """torchvision shuffles the 4 adjustment ops. Brightness(f)∘Contrast(g)
    != Contrast(g)∘Brightness(f) on suitable inputs, so across keys the
    composed output for FIXED factors must take >1 distinct value.
    We can't fix the factors from outside, so instead check the op order
    actually varies: with brightness+contrast active the set of outputs for
    one key pattern differs from a pure brightness-then-contrast pipeline
    for a significant fraction of keys."""
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.uniform(0.0, 1.0, (5, 5, 3)).astype(np.float32))

    def composed(key):
        return color_jitter(img, key, brightness=0.8, contrast=0.8,
                            saturation=0.0, hue=0.0)

    def fixed_order(key):
        # replicate the factor draws (same key splits as color_jitter),
        # then always apply brightness first, contrast second
        ks = jax.random.split(key, 5)
        bf = jax.random.uniform(ks[0], (), minval=0.2, maxval=1.8)
        cf = jax.random.uniform(ks[1], (), minval=0.2, maxval=1.8)
        return _adjust_contrast(_adjust_brightness(img, bf), cf)

    keys = _keys(8, 400)
    a = np.asarray(jax.vmap(composed)(keys))
    b = np.asarray(jax.vmap(fixed_order)(keys))
    frac_diff = (np.abs(a - b).max(axis=(1, 2, 3)) > 1e-6).mean()
    # 4! = 24 orders; brightness-before-contrast happens in half of them
    assert 0.35 < frac_diff < 0.65, frac_diff


def test_saturation_grey_noop():
    grey = jnp.full((4, 4, 3), 0.5, jnp.float32)
    out = _adjust_saturation(grey, 1.4)
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-6)


# ------------------------------------------------------ composed transforms

def _sobel_cfg(**kw):
    from types import SimpleNamespace
    base = dict(include_rgb=True, crop_orig=True, rand_crop_sz=20,
                input_sz=16, fluid_warp=False, cutout=False, demean=False,
                per_img_demean=False)
    base.update(kw)
    return SimpleNamespace(**base)


def test_tf3_is_deterministic_and_centered():
    tf1, tf2, tf3 = make_sobel_pair_transforms(_sobel_cfg())
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(0, 1, (24, 24, 3)).astype(np.float32))
    a = np.asarray(tf3(img))
    b = np.asarray(tf3(img))
    np.testing.assert_array_equal(a, b)
    expected = resize(center_crop(img, 20), 16)
    np.testing.assert_allclose(a[:, :, :3], np.asarray(expected), atol=1e-6)
    assert a.shape == (16, 16, 4)  # rgb + grey appended last


def test_tf2_cutout_application_rate():
    """RandomApply([custom_cutout], p=cutout_p): zero-box present in ~p of
    draws (reference sobel_make_transforms, cluster/transforms.py:163-180)."""
    cfg = _sobel_cfg(cutout=True, cutout_p=0.3, cutout_max_box=0.5)
    _, tf2, _ = make_sobel_pair_transforms(cfg)
    img = jnp.full((24, 24, 3), 0.8, jnp.float32)

    def has_cut(key):
        # On a constant image every non-cutout op (crop/resize/flip/jitter)
        # preserves spatial constancy — jitter on r=g=b is a per-image
        # scalar map — so any spatial variance proves the cutout fired.
        out = tf2(img, key)
        return jnp.std(out[:, :, :3]) > 1e-6

    rate = np.asarray(jax.vmap(has_cut)(_keys(9, 1500))).mean()
    assert abs(rate - 0.3) < 0.05, rate


def test_greyscale_tf2_rotation_rate_mnist_config():
    """MNIST paper config: rot_val=25, always_rot=False -> apply p=0.5."""
    from types import SimpleNamespace
    cfg = SimpleNamespace(
        crop_orig=True, crop_other=True, tf1_crop="centre_half",
        tf1_crop_sz=20, tf2_crop="random", tf2_crop_szs=(24,),
        tf3_crop_diff=False, tf3_crop_sz=20, input_sz=24, rot_val=25.0,
        always_rot=False, no_flip=True, no_jitter=True)
    _, tf2, _ = make_greyscale_pair_transforms(cfg)
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.uniform(0, 1, (24, 24, 1)).astype(np.float32))

    # crop size == image size -> crop is identity; only rotation changes img
    def changed(key):
        return jnp.abs(tf2(img, key) - img).max() > 1e-6

    rate = np.asarray(jax.vmap(changed)(_keys(10, 1500))).mean()
    assert abs(rate - 0.5) < 0.05, rate


def test_greyscale_demean_applied():
    """greyscale_make_transforms applies Normalize(data_mean, data_std)
    and per_img_demean to every tf (reference transforms.py:311-328)."""
    from types import SimpleNamespace
    from iic_tpu.data.transforms import make_greyscale_pair_transforms

    cfg = SimpleNamespace(
        crop_orig=False, crop_other=False, input_sz=8, rot_val=0.0,
        no_flip=True, no_jitter=True, demean=True,
        data_mean=(0.25,), data_std=(0.5,), per_img_demean=False)
    _, _, tf3 = make_greyscale_pair_transforms(cfg)
    img = jnp.full((8, 8, 1), 0.75, jnp.float32)
    out = np.asarray(tf3(img))
    np.testing.assert_allclose(out, (0.75 - 0.25) / 0.5, rtol=1e-6)

    cfg.demean = False
    cfg.per_img_demean = True
    _, _, tf3p = make_greyscale_pair_transforms(cfg)
    out_p = np.asarray(tf3p(img))
    np.testing.assert_allclose(out_p, 0.0, atol=1e-6)  # mean removed


def test_random_affine_scale_magnifies():
    """torchvision RandomAffine(scale=(s, s)) with s > 1 MAGNIFIES content
    (the sampling grid uses the inverse matrix); a bright centre square
    must grow, not shrink."""
    from iic_tpu.data.transforms import random_affine_img

    img = np.zeros((32, 32, 1), np.float32)
    img[12:20, 12:20] = 1.0
    out = np.asarray(random_affine_img(
        jnp.asarray(img), jax.random.PRNGKey(0), max_rot=0.0,
        scale_min=2.0, scale_max=2.0, max_shear=0.0, max_translate=0.0,
        p=1.0))
    # 2x magnification: the 8x8 square covers ~16x16 (clipped at borders)
    assert out.sum() > 2.5 * img.sum(), (out.sum(), img.sum())
