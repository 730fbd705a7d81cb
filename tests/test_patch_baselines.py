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
