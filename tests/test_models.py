"""Model tests: output shapes for each reference configuration, init
statistics parity, BatchNorm track_running_stats semantics, two-head
dispatch, sub-head stacking."""

from types import SimpleNamespace

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iic_tpu import models


def _init(model, x_shape, two_head=False, **call_kwargs):
    key = jax.random.PRNGKey(0)
    x = jnp.zeros(x_shape, jnp.float32)
    if two_head:
        variables = models.init_variables(model, key, x, **call_kwargs)
    else:
        variables = model.init(key, x, **call_kwargs)
    return variables, x


def _apply(model, variables, x, **kw):
    if "batch_stats" in variables:
        out, _ = model.apply(variables, x, mutable=["batch_stats"], **kw)
        return out
    return model.apply(variables, x, **kw)


# ---------------------------------------------------------------- shapes

def test_net6c_twohead_shapes_mnist():
    """MNIST config: input 24x24 grey, k_A=50 overclustering, k_B=10."""
    cfg = SimpleNamespace(output_k_A=50, output_k_B=10, num_sub_heads=5,
                          input_sz=24, batchnorm_track=True)
    net = models.build("ClusterNet6cTwoHead", cfg)
    variables, x = _init(net, (4, 1, 24, 24), two_head=True)
    out_a = _apply(net, variables, x, head="A")
    out_b = _apply(net, variables, x, head="B")
    assert out_a.shape == (5, 4, 50)
    assert out_b.shape == (5, 4, 10)
    # softmax heads: rows sum to 1
    np.testing.assert_allclose(np.asarray(out_b).sum(-1), 1.0, rtol=1e-5)


@pytest.mark.parametrize("input_sz,in_ch", [(32, 5), (64, 5)])
def test_net5g_twohead_shapes(input_sz, in_ch):
    cfg = SimpleNamespace(output_k_A=70, output_k_B=10, num_sub_heads=5,
                          input_sz=input_sz, batchnorm_track=True)
    net = models.build("ClusterNet5gTwoHead", cfg)
    variables, x = _init(net, (2, in_ch, input_sz, input_sz), two_head=True)
    out = _apply(net, variables, x, head="B")
    assert out.shape == (5, 2, 10)
    feats = _apply(net, variables, x, trunk_features=True)
    assert feats.shape == (2, 512)


def test_net5g_penultimate_features():
    cfg = SimpleNamespace(output_k=70, num_sub_heads=1, input_sz=32,
                          batchnorm_track=True)
    net = models.build("ClusterNet5g", cfg)
    variables, x = _init(net, (2, 5, 32, 32))
    pen = _apply(net, variables, x, trunk_features=True,
                 penultimate_features=True)
    # input 32: stem 32 -> pool 17 -> L1 17 -> L2 9 -> L3 5; 256 * 5 * 5
    assert pen.shape == (2, 256 * 5 * 5)


def test_net10a_twohead_shapes():
    cfg = SimpleNamespace(output_k_A=15, output_k_B=3, num_sub_heads=2,
                          input_sz=40, batchnorm_track=True)
    net = models.build("SegmentationNet10aTwoHead", cfg)
    variables, x = _init(net, (2, 4, 40, 40), two_head=True)
    out_a = _apply(net, variables, x, head="A")
    out_b = _apply(net, variables, x, head="B")
    assert out_a.shape == (2, 2, 15, 40, 40)
    assert out_b.shape == (2, 2, 3, 40, 40)
    # per-pixel softmax sums to 1
    np.testing.assert_allclose(
        np.asarray(out_b).sum(axis=2), 1.0, rtol=1e-4)


def test_suphead5_shapes():
    from iic_tpu.models import SupHead5Head
    head = SupHead5Head(gt_k=10)
    key = jax.random.PRNGKey(0)
    feats = jnp.ones((6, 512))
    variables = head.init(key, feats)
    out = _apply(head, variables, feats)
    assert out.shape == (6, 10)
    # logits, not softmax
    assert not np.allclose(np.asarray(out).sum(-1), 1.0)


def test_triplets_net_shapes():
    cfg = SimpleNamespace(output_k=10, input_sz=24, batchnorm_track=True)
    net = models.build("TripletsNet6c", cfg)
    variables, x = _init(net, (2, 1, 24, 24))
    out = _apply(net, variables, x)
    assert out.shape == (2, 10)


# ------------------------------------------------------------- init stats

def test_conv_init_is_kaiming():
    cfg = SimpleNamespace(output_k=10, num_sub_heads=1, input_sz=24,
                          batchnorm_track=True)
    net = models.build("ClusterNet6c", cfg)
    variables, _ = _init(net, (2, 1, 24, 24))
    params = variables["params"]
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    conv_kernels = [(jax.tree_util.keystr(p), np.asarray(v))
                    for p, v in flat
                    if v.ndim == 4]
    assert conv_kernels
    for name, k in conv_kernels:
        kh, kw, cin, cout = k.shape
        fan_in = kh * kw * cin
        expected_std = np.sqrt(2.0 / fan_in)
        assert abs(k.std() - expected_std) / expected_std < 0.15, (
            name, k.std(), expected_std)


def test_head_init_std():
    cfg = SimpleNamespace(output_k=10, num_sub_heads=3, input_sz=24,
                          batchnorm_track=True)
    net = models.build("ClusterNet6c", cfg)
    variables, _ = _init(net, (2, 1, 24, 24))
    head_kernel = np.asarray(
        variables["params"]["MultiDenseHead_0"]["kernel"])
    assert head_kernel.shape[0] == 3
    assert abs(head_kernel.std() - 0.01) < 0.002


# --------------------------------------------------------- batchnorm modes

def test_batchnorm_track_semantics():
    from iic_tpu.models import BatchNorm
    key = jax.random.PRNGKey(0)
    x = 3.0 + 2.0 * jax.random.normal(key, (64, 8))

    bn = BatchNorm(track_running_stats=True)
    variables = bn.init(key, x)
    # train step updates running stats
    y, updated = bn.apply(variables, x, use_batch_stats=True,
                          mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y).mean(), 0.0, atol=1e-4)
    ra_mean = np.asarray(updated["batch_stats"]["mean"])
    assert np.abs(ra_mean).max() > 0.01  # moved toward batch mean (3.0)

    # eval with running stats (fresh init: mean 0, var 1 -> y approx x)
    y_eval = bn.apply(variables, x, use_batch_stats=False)
    np.testing.assert_allclose(np.asarray(y_eval), np.asarray(x), rtol=1e-3,
                               atol=1e-3)

    # track=False: no batch_stats collection at all; always batch stats
    bn_nt = BatchNorm(track_running_stats=False)
    v_nt = bn_nt.init(key, x)
    assert "batch_stats" not in v_nt
    y_nt = bn_nt.apply(v_nt, x, use_batch_stats=False)
    np.testing.assert_allclose(np.asarray(y_nt).mean(), 0.0, atol=1e-4)


def test_batchnorm_matches_torch():
    torch = pytest.importorskip("torch")
    from iic_tpu.models import BatchNorm
    rng = np.random.default_rng(0)
    x = rng.standard_normal((32, 16)).astype(np.float32) * 2 + 1

    bn = BatchNorm(track_running_stats=True)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y, upd = bn.apply(variables, jnp.asarray(x), use_batch_stats=True,
                      mutable=["batch_stats"])

    tbn = torch.nn.BatchNorm1d(16, track_running_stats=True)
    tbn.train()
    ty = tbn(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(np.asarray(y), ty, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(upd["batch_stats"]["mean"]),
        tbn.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(upd["batch_stats"]["var"]),
        tbn.running_var.numpy(), atol=1e-4)


# ----------------------------------------------------------- registry

def test_registry_contains_all_archs():
    for name in ["ClusterNet6c", "ClusterNet6cTwoHead", "ClusterNet5g",
                 "ClusterNet5gTwoHead", "SegmentationNet10a",
                 "SegmentationNet10aTwoHead", "TripletsNet5g",
                 "TripletsNet6c"]:
        assert name in models.ARCHS


def test_semisup_head_b_is_single_linear():
    cfg = SimpleNamespace(output_k_A=70, output_k_B=10, num_sub_heads=5,
                          input_sz=24, batchnorm_track=True, semisup=True)
    net = models.build("ClusterNet6cTwoHead", cfg)
    variables, x = _init(net, (2, 1, 24, 24), head="B")
    out = _apply(net, variables, x, head="B")
    assert out.shape == (2, 10)  # single head, logits
