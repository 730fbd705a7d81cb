"""Reference PyTorch checkpoint import (iic_tpu.compat.torch_import).

The transplant parity tests (test_model_parity.py) go flax -> torch; these
go the other way — the direction a reference user migrating trained models
actually needs — and against the REFERENCE's state_dict key layout, not the
twins': sub-heads wrapped in Sequential(op, Softmax) (``head.heads.{i}.0``,
net5g_two_head.py:22-25, net10a.py:44-47), VGG trunks nested as
``trunk.features.{j}`` (net6c.py:22, vgg.py:18-35), ``module.`` DataParallel
prefixes and ``num_batches_tracked`` counters (cluster_sobel_twohead.py:181),
the semisup single-Linear head_B (net5g_two_head.py:26), the SupHead5
wrapper split (sup_head5.py:8-31), and the segmentation combined
``{"net": ..., "optimiser": ...}`` save format (segmentation_twohead.py:
412-421).

Each import test builds a torch twin with torch's own (random) init, wraps
it so its state_dict carries the reference key layout, round-trips through
``state_dict_to_variables``, and asserts forward parity flax-vs-torch.
"""

import collections
import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from iic_tpu.compat import torch_import as ti  # noqa: E402
from iic_tpu.models import (  # noqa: E402
    cluster_nets, init_variables, seg_baselines, segmentation_nets, semisup)

import torch_twins as tw  # noqa: E402

torch.manual_seed(0)
torch.set_num_threads(1)


# ------------------------------------------------- reference-keyed wrappers

def _heads_module(sub_modules, softmax2d=False):
    """Reference head container: ``heads.{i}.0`` = the Linear/Conv, ``.1``
    = the (parameter-free) softmax."""
    m = nn.Module()
    sm = nn.Softmax2d() if softmax2d else nn.Softmax(dim=1)
    m.heads = nn.ModuleList([nn.Sequential(h, sm) for h in sub_modules])
    return m


def _ref_cluster_root(twin, twohead):
    root = nn.Module()
    if hasattr(twin, "trunk"):  # resnet twins: trunk.conv1 / trunk.layerN
        root.trunk = twin.trunk
    else:  # vgg twins: the reference nests trunk.features.{j}
        t = nn.Module()
        t.features = twin.features
        root.trunk = t
    if twohead:
        root.head_A = _heads_module(list(twin.head_A))
        root.head_B = _heads_module(list(twin.head_B))
    else:
        root.head = _heads_module(list(twin.heads))
    return root


def _ref_seg_root(twin, twohead):
    root = nn.Module()
    t = nn.Module()
    t.features = twin.features
    root.trunk = t
    if twohead:
        root.head_A = _heads_module(list(twin.head_A), softmax2d=True)
        root.head_B = _heads_module(list(twin.head_B), softmax2d=True)
    else:
        root.head = _heads_module(list(twin.heads), softmax2d=True)
    return root


def _evolve_bn_stats(twin, x, steps=2):
    """Run train-mode forwards so running stats leave their (0, 1) init —
    otherwise a stats-transfer bug would be invisible in eval parity."""
    twin.train(True)
    with torch.no_grad():
        for _ in range(steps):
            twin(torch.from_numpy(x))


def _save_sd(tmp_path, root, fname, dataparallel=False, seg_combined=False):
    sd = root.state_dict()
    if dataparallel:
        sd = collections.OrderedDict(
            ("module." + k, v) for k, v in sd.items())
    obj = {"net": sd, "optimiser": {}} if seg_combined else sd
    path = os.path.join(tmp_path, fname)
    torch.save(obj, path)
    return path


def _nchw(rng, b, c, h, w):
    return rng.standard_normal((b, c, h, w)).astype(np.float32)


def _flax_forward(net, variables, x, train, **kw):
    v = {"params": variables["params"]}
    if variables.get("batch_stats"):
        v["batch_stats"] = variables["batch_stats"]
        if train:
            out, _ = net.apply(v, jnp.asarray(x), train=True,
                               mutable=["batch_stats"], **kw)
            return np.asarray(out)
    return np.asarray(net.apply(v, jnp.asarray(x), train=train, **kw))


def _torch_forward(tnet, x, train, **kw):
    tnet.train(train)
    with torch.no_grad():
        out = tnet(torch.from_numpy(x), **kw)
    return np.stack([o.numpy() for o in out])


def _assert_close(a, b, atol=3e-5, rtol=1e-4):
    assert a.shape == b.shape, (a.shape, b.shape)
    np.testing.assert_allclose(a, b, atol=atol, rtol=rtol)


# ------------------------------------------------------- cluster net import

def test_net6c_twohead_import_forward_parity(tmp_path):
    rng = np.random.default_rng(0)
    x = _nchw(rng, 4, 1, 24, 24)
    twin = tw.TorchNet6cTwoHead(1, 24, 12, 10, 2, track=True)
    _evolve_bn_stats(twin, x)
    # DataParallel prefix + the cluster scripts' bare-state_dict format
    path = _save_sd(tmp_path, _ref_cluster_root(twin, twohead=True),
                    "best_net.pytorch", dataparallel=True)
    sd = ti.load_torch_file(path)
    assert not any(k.startswith("module.") for k in sd)
    assert not any(k.endswith("num_batches_tracked") for k in sd)

    net = cluster_nets.ClusterNet6cTwoHead(
        output_k_A=12, output_k_B=10, num_sub_heads=2, input_sz=24)
    template = init_variables(net, jax.random.PRNGKey(0), jnp.asarray(x))
    warnings = []
    variables = ti.state_dict_to_variables("ClusterNet6cTwoHead", template,
                                           sd, warnings)
    assert warnings == []
    # ALL eval comparisons first: each torch train-mode forward updates
    # running stats in place, which would poison later eval comparisons
    for train in (False, True):
        for head in ("A", "B"):
            _assert_close(
                _flax_forward(net, variables, x, train, head=head),
                _torch_forward(twin, x, train, head=head))


def test_net5g_twohead_import_forward_parity(tmp_path):
    """ResNet trunk: covers stem + BasicBlock (incl. downsample) ordering."""
    rng = np.random.default_rng(1)
    x = _nchw(rng, 2, 2, 32, 32)
    twin = tw.TorchNet5gTwoHead(2, 32, 15, 10, 2, track=True)
    _evolve_bn_stats(twin, x)
    path = _save_sd(tmp_path, _ref_cluster_root(twin, twohead=True),
                    "latest_net.pytorch")
    sd = ti.load_torch_file(path)
    net = cluster_nets.ClusterNet5gTwoHead(
        output_k_A=15, output_k_B=10, num_sub_heads=2, input_sz=32)
    template = init_variables(net, jax.random.PRNGKey(1), jnp.asarray(x))
    variables = ti.state_dict_to_variables("ClusterNet5gTwoHead", template,
                                           sd)
    for train in (False, True):  # eval first (torch stats mutate in train)
        for head in ("A", "B"):
            _assert_close(
                _flax_forward(net, variables, x, train, head=head),
                _torch_forward(twin, x, train, head=head))


def test_net6c_single_head_import(tmp_path):
    rng = np.random.default_rng(2)
    x = _nchw(rng, 3, 1, 24, 24)
    twin = tw.TorchNet6c(1, 24, 10, 3, track=True)
    _evolve_bn_stats(twin, x)
    path = _save_sd(tmp_path, _ref_cluster_root(twin, twohead=False),
                    "best_net.pytorch")
    net = cluster_nets.ClusterNet6c(output_k=10, num_sub_heads=3,
                                    input_sz=24)
    template = net.init(jax.random.PRNGKey(2), jnp.asarray(x))
    variables = ti.state_dict_to_variables(
        "ClusterNet6c", template, ti.load_torch_file(path))
    _assert_close(_flax_forward(net, variables, x, False),
                  _torch_forward(twin, x, False))


def test_track_false_import_drops_stats_with_warning(tmp_path):
    """A track=True checkpoint into a track=False template: params import,
    running stats are dropped with a warning (not silently)."""
    rng = np.random.default_rng(3)
    x = _nchw(rng, 3, 1, 24, 24)
    twin = tw.TorchNet6c(1, 24, 6, 1, track=True)
    _evolve_bn_stats(twin, x)
    path = _save_sd(tmp_path, _ref_cluster_root(twin, twohead=False),
                    "best_net.pytorch")
    net = cluster_nets.ClusterNet6c(output_k=6, num_sub_heads=1, input_sz=24,
                                    batchnorm_track=False)
    template = net.init(jax.random.PRNGKey(3), jnp.asarray(x))
    warnings = []
    variables = ti.state_dict_to_variables(
        "ClusterNet6c", template, ti.load_torch_file(path), warnings)
    assert warnings and all("stats dropped" in w for w in warnings)
    # train-mode (batch-stats) forward must still agree
    twin_nt = tw.TorchNet6c(1, 24, 6, 1, track=False)
    twin_nt.load_state_dict(
        {k: v for k, v in twin.state_dict().items() if "running" not in k
         and "num_batches" not in k})
    _assert_close(_flax_forward(net, variables, x, True),
                  _torch_forward(twin_nt, x, True))


# -------------------------------------------------- segmentation net import

def test_net10a_twohead_import_forward_parity(tmp_path):
    rng = np.random.default_rng(4)
    x = _nchw(rng, 2, 4, 24, 24)
    twin = tw.TorchNet10aTwoHead(4, 24, 15, 3, 2, track=True)
    _evolve_bn_stats(twin, x)
    # segmentation scripts save {"net": ..., "optimiser": ...} in one file
    path = _save_sd(tmp_path, _ref_seg_root(twin, twohead=True),
                    "best.pytorch", dataparallel=True, seg_combined=True)
    sd = ti.load_torch_file(path)
    net = segmentation_nets.SegmentationNet10aTwoHead(
        output_k_A=15, output_k_B=3, num_sub_heads=2, input_sz=24)
    template = init_variables(net, jax.random.PRNGKey(4), jnp.asarray(x))
    variables = ti.state_dict_to_variables("SegmentationNet10aTwoHead",
                                           template, sd)
    for train in (False, True):  # eval first (torch stats mutate in train)
        for head in ("A", "B"):
            _assert_close(
                _flax_forward(net, variables, x, train, head=head),
                _torch_forward(twin, x, train, head=head))


def test_net10a_single_head_import(tmp_path):
    rng = np.random.default_rng(5)
    x = _nchw(rng, 2, 3, 24, 24)
    twin = tw.TorchNet10a(3, 24, 6, 1, track=True)
    _evolve_bn_stats(twin, x)
    path = _save_sd(tmp_path, _ref_seg_root(twin, twohead=False),
                    "latest.pytorch", seg_combined=True)
    net = segmentation_nets.SegmentationNet10a(
        output_k=6, num_sub_heads=1, input_sz=24)
    template = net.init(jax.random.PRNGKey(5), jnp.asarray(x))
    variables = ti.state_dict_to_variables(
        "SegmentationNet10a", template, ti.load_torch_file(path))
    _assert_close(_flax_forward(net, variables, x, False),
                  _torch_forward(twin, x, False))


# -------------------------------------------------- semisup / SupHead5

def test_semisup_head_B_single_linear_import(tmp_path):
    """The semisup overclustering net: head_B is one bare Linear
    (net5g_two_head.py:26, ``head_B.head.*``), returning logits."""
    rng = np.random.default_rng(6)
    x = _nchw(rng, 2, 2, 32, 32)
    twin = tw.TorchNet5gTwoHead(2, 32, 15, 10, 2, track=True)
    _evolve_bn_stats(twin, x)
    root = _ref_cluster_root(twin, twohead=True)
    head_B = nn.Module()
    head_B.head = nn.Linear(512, 10)
    root.head_B = head_B
    path = _save_sd(tmp_path, root, "best_net.pytorch")
    net = cluster_nets.ClusterNet5gTwoHead(
        output_k_A=15, output_k_B=10, num_sub_heads=2, input_sz=32,
        semisup=True)
    template = init_variables(net, jax.random.PRNGKey(6), jnp.asarray(x))
    variables = ti.state_dict_to_variables("ClusterNet5gTwoHead", template,
                                           sd=ti.load_torch_file(path))
    # head B returns logits directly (no sub-head list, no softmax)
    out = _flax_forward(net, variables, x, False, head="B")
    twin.train(False)
    with torch.no_grad():
        feats = twin.trunk(torch.from_numpy(x))
        t_out = head_B.head(feats).numpy()
    _assert_close(out, t_out)
    # head A still the multi-sub-head path
    _assert_close(_flax_forward(net, variables, x, False, head="A"),
                  _torch_forward(twin, x, False, head="A"))


def test_sup_head5_split_import(tmp_path):
    """SupHead5 wrapper (sup_head5.py:8-31): trunk.* -> the wrapped cluster
    net, head.{0,1,3} -> the finetune MLP."""
    rng = np.random.default_rng(7)
    x = _nchw(rng, 2, 2, 32, 32)
    dlen = 256 * 8 * 8  # net5g penultimate: layer3 output at input_sz 32
    gt_k = 10
    twin = tw.TorchNet5gTwoHead(2, 32, 15, 10, 1, track=True)
    thead = tw.TorchSupHead5(dlen, gt_k, track=True)
    _evolve_bn_stats(twin, x)
    root = nn.Module()
    root.trunk = _ref_cluster_root(twin, twohead=True)
    root.head = nn.Sequential(nn.Linear(dlen, 2048), nn.BatchNorm1d(2048),
                              nn.ReLU(), nn.Linear(2048, gt_k))
    # share parameters with the torch twin head for the parity check
    root.head[0] = thead.lin1
    root.head[1] = thead.bn
    root.head[3] = thead.lin2
    path = _save_sd(tmp_path, root, "best_net.pytorch")
    sd = ti.load_torch_file(path)

    net = cluster_nets.ClusterNet5gTwoHead(
        output_k_A=15, output_k_B=10, num_sub_heads=1, input_sz=32)
    net_template = init_variables(net, jax.random.PRNGKey(7), jnp.asarray(x))
    feats = rng.standard_normal((4, dlen)).astype(np.float32)
    head = semisup.SupHead5Head(gt_k=gt_k)
    head_template = head.init(jax.random.PRNGKey(8), jnp.asarray(feats))

    net_vars, head_vars = ti.sup_head5_state_dict_to_variables(
        "ClusterNet5gTwoHead", net_template, head_template, sd)
    _assert_close(_flax_forward(net, net_vars, x, False, head="B"),
                  _torch_forward(twin, x, False, head="B"))
    out = head.apply({"params": head_vars["params"],
                      "batch_stats": head_vars["batch_stats"]},
                     jnp.asarray(feats), train=False)
    thead.train(False)
    with torch.no_grad():
        t_out = thead(torch.from_numpy(feats)).numpy()
    _assert_close(np.asarray(out), t_out)


# ------------------------------------------------------------- baselines

def test_triplets_import(tmp_path):
    rng = np.random.default_rng(8)
    x = _nchw(rng, 2, 2, 32, 32)
    twin = tw.TorchNet5gTwoHead(2, 32, 10, 10, 1, track=True)
    _evolve_bn_stats(twin, x)
    root = nn.Module()
    root.trunk = twin.trunk
    head = nn.Module()
    head.head = nn.Linear(512, 10)
    root.head = head
    path = _save_sd(tmp_path, root, "best_net.pytorch")
    net = cluster_nets.TripletsNet(output_k=10, input_sz=32, trunk_type="5g")
    template = net.init(jax.random.PRNGKey(9), jnp.asarray(x))
    variables = ti.state_dict_to_variables(
        "TripletsNet5g", template, ti.load_torch_file(path))
    out = np.asarray(net.apply(variables, jnp.asarray(x), train=False))
    twin.train(False)
    with torch.no_grad():
        t_out = head.head(twin.trunk(torch.from_numpy(x))).numpy()
    _assert_close(out, t_out)


def test_doersch_head_import_values(tmp_path):
    """Doersch (net10a_doersch.py:13-97): trunk under ``features.*``,
    siamese head under ``doersch_head.*``. Value-level mapping check (the
    flax patch-extraction forward is covered by its own tests)."""
    rng = np.random.default_rng(10)
    x = _nchw(rng, 2, 3, 16, 16)
    root = nn.Module()
    root.features = tw._vgg_layers(tw.NET10A_CFG, 3, 3, 1, True)
    head = nn.Module()
    head.siamese_branch = nn.Sequential(
        nn.Conv2d(512, 1024, 3, 1, 1, bias=False), nn.BatchNorm2d(1024),
        nn.ReLU(inplace=True))
    ps = 1
    head.joint = nn.Sequential(nn.Linear(2 * 1024 * ps * ps, 1024),
                               nn.ReLU(True), nn.Dropout(),
                               nn.Linear(1024, 9))
    root.doersch_head = head
    with torch.no_grad():  # nontrivial running stats
        head.siamese_branch[1].running_mean.normal_()
        head.siamese_branch[1].running_var.uniform_(0.5, 2.0)
    path = _save_sd(tmp_path, root, "latest.pytorch", seg_combined=True)
    sd = ti.load_torch_file(path)

    net = seg_baselines.SegmentationNet10aDoersch(patch_side=ps, input_sz=16)
    c = jnp.full((2, 2), 8, jnp.int32)
    template = net.init(jax.random.PRNGKey(10), jnp.asarray(x), centre=c,
                        other=c, train=False)
    variables = ti.state_dict_to_variables("SegmentationNet10aDoersch",
                                           template, sd)
    fh = variables["params"]["_SiameseJointHead_0"]
    np.testing.assert_array_equal(
        fh["siamese_conv"]["kernel"],
        np.transpose(head.siamese_branch[0].weight.detach().numpy(),
                     (2, 3, 1, 0)))
    np.testing.assert_array_equal(
        fh["joint_kernel1"], head.joint[0].weight.detach().numpy().T)
    np.testing.assert_array_equal(
        fh["joint_bias1"], head.joint[0].bias.detach().numpy())
    np.testing.assert_array_equal(
        fh["joint_kernel2"], head.joint[3].weight.detach().numpy().T)
    bn_stats = variables["batch_stats"]["_SiameseJointHead_0"]["siamese_bn"]
    np.testing.assert_array_equal(
        bn_stats["mean"], head.siamese_branch[1].running_mean.numpy())
    np.testing.assert_array_equal(
        bn_stats["var"], head.siamese_branch[1].running_var.numpy())


# ----------------------------------------------------------- error paths

def test_wrong_subhead_count_raises(tmp_path):
    twin = tw.TorchNet6cTwoHead(1, 24, 12, 10, 3, track=True)  # 3 sub-heads
    path = _save_sd(tmp_path, _ref_cluster_root(twin, twohead=True),
                    "best_net.pytorch")
    x = jnp.zeros((2, 1, 24, 24))
    net = cluster_nets.ClusterNet6cTwoHead(  # template expects 2
        output_k_A=12, output_k_B=10, num_sub_heads=2, input_sz=24)
    template = init_variables(net, jax.random.PRNGKey(0), x)
    with pytest.raises(ti.TorchImportError, match="sub-head"):
        ti.state_dict_to_variables("ClusterNet6cTwoHead", template,
                                   ti.load_torch_file(path))


def test_wrong_output_k_raises(tmp_path):
    twin = tw.TorchNet6c(1, 24, 10, 2, track=True)
    path = _save_sd(tmp_path, _ref_cluster_root(twin, twohead=False),
                    "best_net.pytorch")
    x = jnp.zeros((2, 1, 24, 24))
    net = cluster_nets.ClusterNet6c(output_k=7, num_sub_heads=2, input_sz=24)
    template = net.init(jax.random.PRNGKey(0), x)
    with pytest.raises(ti.TorchImportError, match="weight"):
        ti.state_dict_to_variables("ClusterNet6c", template,
                                   ti.load_torch_file(path))


def test_wrong_trunk_raises(tmp_path):
    """A net6c checkpoint into a net5g template must fail on the conv
    count, not mis-wire order-matched weights."""
    twin = tw.TorchNet6cTwoHead(2, 24, 12, 10, 2, track=True)
    path = _save_sd(tmp_path, _ref_cluster_root(twin, twohead=True),
                    "best_net.pytorch")
    x = jnp.zeros((2, 2, 32, 32))
    net = cluster_nets.ClusterNet5gTwoHead(
        output_k_A=12, output_k_B=10, num_sub_heads=2, input_sz=32)
    template = init_variables(net, jax.random.PRNGKey(0), x)
    with pytest.raises(ti.TorchImportError, match="convs"):
        ti.state_dict_to_variables("ClusterNet5gTwoHead", template,
                                   ti.load_torch_file(path))


# ------------------------------------------------------------- CLI path

def test_cli_import_end_to_end(tmp_path):
    """Fake reference run dir (config.pickle + best_net/latest_net.pytorch)
    -> cli.import_torch -> a run dir every consumer accepts: checkpoints
    load, forward matches the torch net, config.txt/config.pickle written."""
    from iic_tpu.cli import import_torch as cli
    from iic_tpu.parallel.train_step import create_train_state
    from iic_tpu.train import checkpoint as ckpt
    from iic_tpu.train.cluster_trainer import make_optimizer
    from iic_tpu.train.config import config_from_dict

    rng = np.random.default_rng(11)
    x = _nchw(rng, 4, 1, 24, 24)
    twin = tw.TorchNet6cTwoHead(1, 24, 12, 10, 2, track=True)
    _evolve_bn_stats(twin, x)
    ref_dir = tmp_path / "ref" / "685"
    ref_dir.mkdir(parents=True)
    ref_cfg = {"arch": "ClusterNet6cTwoHead", "dataset": "MNIST",
               "mode": "IID", "output_k_A": 12, "output_k_B": 10,
               "num_sub_heads": 2, "input_sz": 24, "batchnorm_track": True,
               "batch_sz": 60, "num_dataloaders": 3, "lr": 1e-4,
               "pytorch_only_key": "dropped"}
    with open(ref_dir / "config.pickle", "wb") as f:
        pickle.dump(ref_cfg, f)
    root = _ref_cluster_root(twin, twohead=True)
    _save_sd(ref_dir, root, "best_net.pytorch", dataparallel=True)
    _save_sd(ref_dir, root, "latest_net.pytorch", dataparallel=True)

    out_root = tmp_path / "out"
    cli.main(["--ref_dir", str(ref_dir), "--out_root", str(out_root),
              "--model_ind", "685", "--greyscale", "--last_epoch", "3"])

    run_dir = out_root / "685"
    for fname in ("best.ckpt", "latest.ckpt", "config.pickle", "config.txt",
                  "best_config.pickle"):
        assert (run_dir / fname).exists(), fname

    config = config_from_dict({**ref_cfg, "out_root": str(out_root),
                               "model_ind": 685})
    config.finalize(twohead=True, sobel=False)
    net, template = cli.build_template(config)
    state_template = create_train_state(template, make_optimizer(config))
    state, history, last_epoch = ckpt.load_checkpoint(config, state_template,
                                                      name="best")
    assert last_epoch == 3
    assert int(state.step) == 0
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    for head in ("A", "B"):
        _assert_close(_flax_forward(net, variables, x, False, head=head),
                      _torch_forward(twin, x, False, head=head))


# ------------------------------------------------------ migration journey

@pytest.mark.slow
def test_import_then_finetune_eval_export_journey(tmp_path):
    """The full reference-user migration: import a trained torch model,
    continue training on TPU via --restart (the reference's resume flow,
    cluster_sobel_twohead.py:199-221, with the import standing in for the
    previous run), re-evaluate it with the analysis CLI, and export the
    serving predictor — every run-dir consumer accepts the imported dir."""
    from iic_tpu import infer
    from iic_tpu.cli import import_torch as cli_import
    from iic_tpu.cli.analysis import eval as analysis_eval
    from iic_tpu.train import train_cluster_twohead
    from iic_tpu.train import checkpoint as ckpt
    from iic_tpu.train.cluster_trainer import build_net_and_state
    from iic_tpu.train.config import config_from_dict

    rng = np.random.default_rng(12)
    x = _nchw(rng, 4, 1, 24, 24)
    twin = tw.TorchNet6cTwoHead(1, 24, 20, 10, 2, track=True)
    _evolve_bn_stats(twin, x)
    ref_dir = tmp_path / "ref" / "1"
    ref_dir.mkdir(parents=True)
    ref_cfg = {  # a complete trainable config, reference field names
        "arch": "ClusterNet6cTwoHead", "mode": "IID",
        "dataset": "Synthetic10x28x1x128", "dataset_root": "",
        "gt_k": 10, "output_k_A": 20, "output_k_B": 10,
        "lr": 1e-3, "num_epochs": 2, "batch_sz": 32,
        "num_dataloaders": 2, "num_sub_heads": 2,
        "crop_orig": True, "crop_other": True,
        "tf1_crop": "centre_half", "tf1_crop_sz": 20,
        "tf2_crop": "random", "tf2_crop_szs": [16, 20, 24],
        "input_sz": 24, "rot_val": 25.0, "no_flip": True,
        "batchnorm_track": True, "test_code": True, "save_freq": 1}
    with open(ref_dir / "config.pickle", "wb") as f:
        pickle.dump(ref_cfg, f)
    _save_sd(ref_dir, _ref_cluster_root(twin, twohead=True),
             "latest_net.pytorch")

    out_root = tmp_path / "out"
    cli_import.main(["--ref_dir", str(ref_dir), "--out_root", str(out_root),
                     "--model_ind", "1", "--greyscale"])

    # the imported run dir IS a normal run: rebuild the config from it
    with open(out_root / "1" / "config.pickle", "rb") as f:
        meta = pickle.load(f)
    config = config_from_dict(meta["config"])
    _, _, template = build_net_and_state(config)
    imported, _, last = ckpt.load_checkpoint(config, template, name="latest")
    assert last == 0

    # fine-tuning continues under --restart (test_code: 2 batches, 1 epoch)
    config.restart = True
    train_cluster_twohead(config)
    _, history, last = ckpt.load_checkpoint(config, template, name="latest")
    assert last == 1
    assert len(history["eval"].epoch_acc) == 1  # restart path: no pre-eval
    state2, _, _ = ckpt.load_checkpoint(config, template, name="latest")
    diffs = [np.abs(np.asarray(a) - np.asarray(b)).max()
             for a, b in zip(jax.tree_util.tree_leaves(imported.params),
                             jax.tree_util.tree_leaves(state2.params))]
    # moved (training happened) but only by a couple of Adam steps
    # (started FROM the imported weights, not a re-init)
    assert max(diffs) > 0
    assert max(diffs) < 0.05, max(diffs)

    # analysis CLI re-evaluates the run dir
    stats = analysis_eval.main(["--model_ind", "1",
                                "--out_root", str(out_root)])
    assert 0.0 <= stats["best"] <= 1.0

    # serving: fused predictor + StableHLO export round-trip
    config_i, net_i, variables, stats_i = infer.load_run(str(out_root), 1)
    predict = infer.make_cluster_predictor(config_i, net_i, variables,
                                           stats_i)
    imgs = rng.integers(0, 255, (3, 28, 28, 1), dtype=np.uint8)
    ids = np.asarray(jax.jit(predict)(jnp.asarray(imgs)))
    assert ids.shape == (3,) and ((ids >= 0) & (ids < 10)).all()
    path = os.path.join(str(tmp_path), "imported.stablehlo")
    infer.export_predictor(predict, imgs, path=path)
    served = infer.load_exported(path)
    np.testing.assert_array_equal(np.asarray(served(jnp.asarray(imgs))), ids)


def test_cli_import_seg_format(tmp_path):
    """Segmentation run dirs: combined {"net","optimiser"} save files
    (best.pytorch / latest.pytorch, segmentation_twohead.py:412-421) and
    the SegConfig.finalize path through the CLI."""
    from iic_tpu.cli import import_torch as cli

    rng = np.random.default_rng(13)
    # sobel+rgb seg layout: [r, g, b, dx, dy] = 5 input channels
    # (finalize derives in_channels=5 for include_rgb without --no_sobel)
    x = _nchw(rng, 2, 5, 24, 24)
    twin = tw.TorchNet10aTwoHead(5, 24, 6, 3, 1, track=True)
    _evolve_bn_stats(twin, x)
    ref_dir = tmp_path / "ref" / "555"
    ref_dir.mkdir(parents=True)
    ref_cfg = {"arch": "SegmentationNet10aTwoHead", "mode": "IID",
               "dataset": "SyntheticSeg3x48x16", "gt_k": 3,
               "output_k_A": 6, "output_k_B": 3, "num_sub_heads": 1,
               "input_sz": 24, "batchnorm_track": True, "batch_sz": 8,
               "num_dataloaders": 1, "include_rgb": True}
    with open(ref_dir / "config.pickle", "wb") as f:
        pickle.dump(ref_cfg, f)
    _save_sd(ref_dir, _ref_seg_root(twin, twohead=True), "best.pytorch",
             seg_combined=True)

    out_root = tmp_path / "out"
    cli.main(["--ref_dir", str(ref_dir), "--out_root", str(out_root),
              "--model_ind", "555"])
    assert (out_root / "555" / "best.ckpt").exists()

    from iic_tpu.cli.analysis.render_general import load_seg_run
    config, net, state, history = load_seg_run(str(out_root), 555)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    for head in ("A", "B"):
        _assert_close(_flax_forward(net, variables, x, False, head=head),
                      _torch_forward(twin, x, False, head=head))
