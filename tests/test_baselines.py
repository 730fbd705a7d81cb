"""Baseline tests: triplets loss vs torch kl_div semantics, triplets
trainer smoke."""

import numpy as np
import jax.numpy as jnp
import pytest

from iic_tpu.ops.baselines import isola_loss, triplets_loss

pytestmark = pytest.mark.slow  # compile-heavy end-to-end suite


def test_triplets_loss_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    o = rng.standard_normal((16, 10)).astype(np.float32)
    p = rng.standard_normal((16, 10)).astype(np.float32)
    n = rng.standard_normal((16, 10)).astype(np.float32)

    to, tp, tn = map(torch.from_numpy, (o, p, n))
    ref = (F.kl_div(F.log_softmax(to, dim=1), F.softmax(tp, dim=1),
                    reduction="mean")
           - F.kl_div(F.log_softmax(to, dim=1), F.softmax(tn, dim=1),
                      reduction="mean")).item()

    ours = float(triplets_loss(jnp.asarray(o), jnp.asarray(p),
                               jnp.asarray(n)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)


def test_triplets_loss_prefers_similar_positive():
    rng = np.random.default_rng(1)
    o = rng.standard_normal((8, 5)).astype(np.float32)
    similar = o + 0.01 * rng.standard_normal((8, 5)).astype(np.float32)
    different = rng.standard_normal((8, 5)).astype(np.float32)
    good = float(triplets_loss(jnp.asarray(o), jnp.asarray(similar),
                               jnp.asarray(different)))
    bad = float(triplets_loss(jnp.asarray(o), jnp.asarray(different),
                              jnp.asarray(similar)))
    assert good < bad


def test_isola_loss_basic():
    logits = jnp.asarray([[10.0], [-10.0]])
    labels = jnp.asarray([1, 0])
    assert float(isola_loss(logits, labels)) < 0.01
    assert float(isola_loss(logits, 1 - labels)) > 5.0


def test_triplets_trainer_smoke(tmp_path):
    from iic_tpu.train.config import ClusterConfig
    from iic_tpu.train.triplets_trainer import train_triplets

    cfg = ClusterConfig(
        model_ind=21, arch="TripletsNet6c", mode="IID",
        dataset="Synthetic10x28x1x96", dataset_root="",
        gt_k=10, output_k=10, lr=1e-3, num_epochs=2, batch_sz=32,
        num_dataloaders=1, out_root=str(tmp_path),
        crop_orig=True, crop_other=True, tf1_crop="centre_half",
        tf1_crop_sz=20, tf2_crop="random", tf2_crop_szs=(16, 20, 24),
        input_sz=24, rot_val=25.0, no_flip=True, batchnorm_track=True,
        test_code=True, save_freq=1)
    cfg.finalize(twohead=False, sobel=False)
    state, history = train_triplets(cfg)
    assert len(history["epoch_acc"]) == 2
    assert np.isfinite(history["epoch_loss"][0])
    assert len(history["masses"][0]) == 10


def test_triplets_kmeans_on_features(tmp_path):
    from iic_tpu.train.config import ClusterConfig
    from iic_tpu.train.triplets_trainer import train_triplets

    cfg = ClusterConfig(
        model_ind=22, arch="TripletsNet6c", mode="IID",
        dataset="Synthetic10x28x1x96", dataset_root="",
        gt_k=10, output_k=10, lr=1e-3, num_epochs=2, batch_sz=32,
        num_dataloaders=1, out_root=str(tmp_path),
        crop_orig=True, crop_other=True, tf1_crop="centre_half",
        tf1_crop_sz=20, tf2_crop="random", tf2_crop_szs=(16, 20, 24),
        input_sz=24, rot_val=25.0, no_flip=True, batchnorm_track=True,
        test_code=True, save_freq=1, kmeans_on_features=True)
    cfg.finalize(twohead=False, sobel=False)
    state, history = train_triplets(cfg)
    assert len(history["epoch_acc"]) == 2
    assert 0.0 <= history["epoch_acc"][-1] <= 1.0
