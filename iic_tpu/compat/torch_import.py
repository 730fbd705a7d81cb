"""Import reference (xu-ji/IIC) PyTorch checkpoints into iic_tpu.

The reference saves plain torch ``state_dict`` files:

- cluster scripts: ``latest_net.pytorch`` / ``best_net.pytorch`` hold the
  bare net state_dict and the optimiser lives in a separate file
  (code/scripts/cluster/cluster_sobel_twohead.py:429-433);
- segmentation scripts: ``latest.pytorch`` / ``best.pytorch`` hold one
  ``{"net": ..., "optimiser": ...}`` dict
  (code/scripts/segmentation/segmentation_twohead.py:412-421);
- semisup: ``best_net.pytorch`` holds the whole SupHead5 wrapper
  state_dict — ``trunk.*`` is the wrapped cluster net, ``head.*`` the
  finetune MLP (code/scripts/semisup/IID_semisup_STL10.py:298-301,
  code/archs/semisup/sup_head5.py:8-31).

This module converts any of those into iic_tpu flax variable trees so a
reference user's trained models (including the published pretrained
model directories) carry over: write them into a normal run directory
and every consumer — trainers under ``--restart``, the eval/analysis
CLIs, ``iic_tpu.infer`` / ``cli.export_model`` — accepts them.
Optimiser state is NOT imported (torch Adam moments do not transfer
meaningfully onto a fresh optax tree); the optimiser restarts.

Mapping strategy: within a trunk, torch modules are matched to flax
modules of the same kind (conv / batchnorm) in execution order. Torch
state_dicts preserve registration order, and the flax natural-sorted key
traversal visits ``Conv_i`` / ``BatchNorm_i`` in execution order — the
same property the transplant parity tests lock from the other direction
(tests/torch_twins.py::transplant_trunk, verified by forward/lockstep
parity for every arch family). Heads are matched by the reference's
fixed attribute names (``head.heads.{i}.0``, ``head_A`` / ``head_B``,
``head.head``, ``doersch_head`` / ``isola_head``). Every assignment is
shape-checked so drift fails loudly instead of mis-wiring weights.
"""

import collections
import copy
import pickle
import re

import numpy as np


class TorchImportError(ValueError):
    pass


def _check(cond, msg):
    if not cond:
        raise TorchImportError(msg)


# --------------------------------------------------------------- loading

def _to_np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def normalize_state_dict(obj):
    """Any reference save format -> OrderedDict[str, np.ndarray].

    Accepts a bare state_dict (cluster scripts), the segmentation
    scripts' ``{"net": ..., "optimiser": ...}`` wrapper, and tensors or
    arrays as values. Strips a leading ``module.`` (nn.DataParallel)
    prefix and drops ``num_batches_tracked`` counters.
    """
    if isinstance(obj, dict) and "net" in obj and hasattr(obj["net"], "items"):
        obj = obj["net"]
    _check(hasattr(obj, "items"), f"not a state_dict: {type(obj)}")
    sd = collections.OrderedDict()
    for k, v in obj.items():
        _check(isinstance(k, str), f"non-string state_dict key: {k!r}")
        if k.startswith("module."):
            k = k[len("module."):]
        if k.endswith("num_batches_tracked"):
            continue
        sd[k] = _to_np(v)
    return sd


def load_torch_file(path):
    """torch.load a reference ``*.pytorch`` file -> normalized state_dict.

    Falls back to ``encoding='latin1'`` for python-2-era saves (the
    reference is py2; its pickled byte strings need latin1 decoding).
    """
    import torch
    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        obj = torch.load(path, map_location="cpu", weights_only=False,
                         encoding="latin1")
    return normalize_state_dict(obj)


def read_reference_config(path):
    """Best-effort read of a reference run dir's ``config.pickle``
    (a pickled argparse.Namespace, written by py2) -> plain dict.
    Raises TorchImportError when unreadable; callers fall back to
    explicit flags."""
    last = None
    for kw in ({}, {"encoding": "latin1"}, {"encoding": "bytes"}):
        try:
            with open(path, "rb") as f:
                obj = pickle.load(f, **kw)
            d = obj if isinstance(obj, dict) else vars(obj)
            return {k if isinstance(k, str) else k.decode("latin1"): v
                    for k, v in d.items()}
        except Exception as e:  # noqa: BLE001 - collect and re-raise below
            last = e
    raise TorchImportError(f"cannot read reference config {path}: {last}")


# ---------------------------------------------------------- tree helpers

def _nat_key(s):
    return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", s)]


def _walk_modules(tree, path=()):
    """Yield (path, subdict) for every flax module dict holding leaves, in
    natural-sorted (== execution) order."""
    if not isinstance(tree, dict):
        return
    if any(not isinstance(v, dict) for v in tree.values()):
        yield path, tree
    for k in sorted(tree, key=_nat_key):
        if isinstance(tree[k], dict):
            yield from _walk_modules(tree[k], path + (k,))


def _lookup(tree, path):
    for k in path:
        if not isinstance(tree, dict) or k not in tree:
            return None
        tree = tree[k]
    return tree


def _group(sd, prefix):
    """Torch modules under ``prefix``, one dict of leaves per module, in
    state_dict (registration == execution) order."""
    mods = collections.OrderedDict()
    p = prefix + "." if prefix else ""
    for k, v in sd.items():
        if not k.startswith(p):
            continue
        rest = k[len(p):]
        _check("." in rest, f"unexpected bare parameter {k!r}")
        mod, leaf = rest.rsplit(".", 1)
        mods.setdefault(mod, collections.OrderedDict())[leaf] = v
    return list(mods.items())


def _is_conv(m):
    return "weight" in m and m["weight"].ndim == 4


def _is_bn(m):
    return "weight" in m and m["weight"].ndim == 1 and "bias" in m


def _f32(a):
    return np.ascontiguousarray(a, dtype=np.float32)


# ----------------------------------------------------------------- trunks

def _fill_trunk(f_params, f_stats, t_modules, where, warnings):
    """Order-based conv/bn fill of a flax trunk subtree (in place on the
    caller's deep copies)."""
    f_convs, f_bns = [], []
    for path, node in _walk_modules(f_params):
        if "kernel" in node and np.ndim(node["kernel"]) == 4:
            f_convs.append((path, node))
        if "scale" in node:
            f_bns.append((path, node))
    t_convs = [(p, m) for p, m in t_modules if _is_conv(m)]
    t_bns = [(p, m) for p, m in t_modules if _is_bn(m)]
    _check(len(t_convs) == len(f_convs),
           f"{where}: {len(t_convs)} torch convs vs {len(f_convs)} flax")
    _check(len(t_bns) == len(f_bns),
           f"{where}: {len(t_bns)} torch batchnorms vs {len(f_bns)} flax")
    for (fp, node), (tp, m) in zip(f_convs, t_convs):
        _check("bias" not in m,
               f"{where}.{tp}: unexpected conv bias (reference trunk convs "
               "are bias-free, vgg.py:24-27)")
        w = _f32(np.transpose(m["weight"], (2, 3, 1, 0)))  # OIHW -> HWIO
        _check(node["kernel"].shape == w.shape,
               f"{where}: conv {tp} shape {w.shape} != flax "
               f"{'/'.join(fp)} {node['kernel'].shape}")
        node["kernel"] = w
    for (fp, node), (tp, m) in zip(f_bns, t_bns):
        _check(node["scale"].shape == m["weight"].shape,
               f"{where}: bn {tp} width {m['weight'].shape} != flax "
               f"{'/'.join(fp)} {node['scale'].shape}")
        node["scale"] = _f32(m["weight"])
        node["bias"] = _f32(m["bias"])
        stats = _lookup(f_stats, fp)
        if stats is not None:
            _check("running_mean" in m,
                   f"{where}.{tp}: template tracks running stats but the "
                   "checkpoint has none — import with batchnorm_track "
                   "matching the original run")
            stats["mean"] = _f32(m["running_mean"])
            stats["var"] = _f32(m["running_var"])
        elif "running_mean" in m:
            warnings.append(
                f"{where}.{tp}: checkpoint carries running stats but the "
                "template has batchnorm_track=False; stats dropped")


# ------------------------------------------------------------------ heads

def _modmap(t_modules):
    return collections.OrderedDict(t_modules)


def _multidense_from(t_modules, f_head, where):
    """Reference ``heads.{i}.0`` Linears (net5g_two_head.py:22-25) ->
    MultiDenseHead kernel (S, D, K) / bias (S, K)."""
    mods = _modmap(t_modules)
    s, d, k = f_head["kernel"].shape
    ws, bs = [], []
    for i in range(s):
        name = f"heads.{i}.0"
        _check(name in mods, f"{where}: missing sub-head {name} "
               f"(template expects {s} sub-heads)")
        m = mods[name]
        _check(m["weight"].shape == (k, d),
               f"{where}.{name}: weight {m['weight'].shape} != {(k, d)}")
        ws.append(m["weight"].T)
        bs.append(m["bias"])
    _check(len(mods) == s, f"{where}: checkpoint has {len(mods)} sub-heads, "
           f"template {s}")
    return {"kernel": _f32(np.stack(ws)), "bias": _f32(np.stack(bs))}


def _multiconv_from(t_modules, f_head, where):
    """Reference ``heads.{i}.0`` 1x1 convs (net10a.py:44-47) ->
    MultiConvSoftmaxHead kernel (1, 1, C, S*K) packed as (C, S, K)."""
    mods = _modmap(t_modules)
    _, _, c, sk = f_head["kernel"].shape
    s = len(mods)
    _check(s > 0 and sk % s == 0,
           f"{where}: {s} sub-heads does not divide head width {sk}")
    k = sk // s
    per_head = np.zeros((c, s, k), np.float32)
    for i in range(s):
        name = f"heads.{i}.0"
        _check(name in mods, f"{where}: missing sub-head {name}")
        m = mods[name]
        _check("bias" not in m, f"{where}.{name}: unexpected conv bias "
               "(reference seg heads are bias-free, net10a.py:44-46)")
        _check(m["weight"].shape == (k, c, 1, 1),
               f"{where}.{name}: weight {m['weight'].shape} != {(k, c, 1, 1)}")
        per_head[:, i, :] = m["weight"].reshape(k, c).T
    return {"kernel": per_head.reshape(1, 1, c, s * k)}


def _linear_from(m, d, k, where):
    _check(m["weight"].shape == (k, d),
           f"{where}: weight {m['weight'].shape} != {(k, d)}")
    return _f32(m["weight"].T), _f32(m["bias"])


def _siamese_head_from(t_modules, f_head, f_head_stats, where, warnings):
    """DoerschHead / IsolaHead (net10a_doersch.py:13-30, net10a_isola.py:
    13-37): siamese_branch (conv3x3 -> BN -> ReLU) + joint MLP. The flax
    head flattens patches in NCHW order (models/seg_baselines.py:51-55)
    precisely so these joint Linear weights transfer as plain
    transposes."""
    mods = _modmap(t_modules)
    for need in ("siamese_branch.0", "siamese_branch.1", "joint.0",
                 "joint.3"):
        _check(need in mods, f"{where}: missing module {need}")
    conv = mods["siamese_branch.0"]
    w = _f32(np.transpose(conv["weight"], (2, 3, 1, 0)))
    node = f_head["siamese_conv"]
    _check(node["kernel"].shape == w.shape,
           f"{where}.siamese_branch.0: {w.shape} != {node['kernel'].shape}")
    node["kernel"] = w
    bn = mods["siamese_branch.1"]
    f_head["siamese_bn"]["scale"] = _f32(bn["weight"])
    f_head["siamese_bn"]["bias"] = _f32(bn["bias"])
    stats = (f_head_stats or {}).get("siamese_bn")
    if stats is not None and "running_mean" in bn:
        stats["mean"] = _f32(bn["running_mean"])
        stats["var"] = _f32(bn["running_var"])
    elif "running_mean" in bn:
        # the reference head BN always tracks (nn.BatchNorm2d default);
        # a track=False template cannot hold the stats
        warnings.append(f"{where}: siamese BN running stats dropped "
                        "(template batchnorm_track=False)")
    d1, k1 = f_head["joint_kernel1"].shape
    f_head["joint_kernel1"], f_head["joint_bias1"] = _linear_from(
        mods["joint.0"], d1, k1, f"{where}.joint.0")
    d2, k2 = f_head["joint_kernel2"].shape
    f_head["joint_kernel2"], f_head["joint_bias2"] = _linear_from(
        mods["joint.3"], d2, k2, f"{where}.joint.3")


# ------------------------------------------------------------- dispatcher

_TRUNK_KEYS = {
    "ClusterNet6c": "ClusterNet6cTrunk_0",
    "ClusterNet6cTwoHead": "ClusterNet6cTrunk_0",
    "ClusterNet5g": "ClusterNet5gTrunk_0",
    "ClusterNet5gTwoHead": "ClusterNet5gTrunk_0",
    "SegmentationNet10a": "SegmentationNet10aTrunk_0",
    "SegmentationNet10aTwoHead": "SegmentationNet10aTrunk_0",
    "TripletsNet5g": "ClusterNet5gTrunk_0",
    "TripletsNet6c": "ClusterNet6cTrunk_0",
    "SegmentationNet10aDoersch": "SegmentationNet10aTrunk_0",
    "SegmentationNet10aIsola": "SegmentationNet10aTrunk_0",
}


def state_dict_to_variables(arch, template, sd, warnings=None):
    """Convert a reference net state_dict into flax variables shaped like
    ``template`` (the arch's init_variables output). Returns a new
    variables dict; ``template`` is not mutated. ``warnings`` (optional
    list) collects non-fatal notes (dropped running stats)."""
    if warnings is None:
        warnings = []
    _check(arch in _TRUNK_KEYS, f"unknown arch {arch!r}")
    v = copy.deepcopy({k: template[k] for k in template})
    params = v["params"]
    stats = v.get("batch_stats", {})
    trunk_key = _TRUNK_KEYS[arch]
    sd_trunk_prefix = ("features" if arch.endswith(("Doersch", "Isola"))
                       else "trunk")
    # VGG trunks nest one level deeper in the state_dict (trunk.features.*)
    # but _group/_walk both flatten by module, so the same fill works.
    _fill_trunk(params[trunk_key], stats.get(trunk_key),
                _group(sd, sd_trunk_prefix), f"{arch}.{sd_trunk_prefix}",
                warnings)

    if arch in ("ClusterNet6c", "ClusterNet5g"):
        params["MultiDenseHead_0"] = _multidense_from(
            _group(sd, "head"), params["MultiDenseHead_0"], f"{arch}.head")
    elif arch in ("ClusterNet6cTwoHead", "ClusterNet5gTwoHead"):
        params["head_A"] = _multidense_from(
            _group(sd, "head_A"), params["head_A"], f"{arch}.head_A")
        if "head_B_kernel" in params:
            # semisup variant: head B is one Linear, no softmax
            # (net5g_two_head.py:26,39)
            m = _modmap(_group(sd, "head_B"))
            _check("head" in m, f"{arch}.head_B: expected semisup single "
                   "Linear (head_B.head.*)")
            d, k = params["head_B_kernel"].shape
            params["head_B_kernel"], params["head_B_bias"] = _linear_from(
                m["head"], d, k, f"{arch}.head_B.head")
        else:
            params["head_B"] = _multidense_from(
                _group(sd, "head_B"), params["head_B"], f"{arch}.head_B")
    elif arch in ("SegmentationNet10a",):
        params["MultiConvSoftmaxHead_0"] = _multiconv_from(
            _group(sd, "head"), params["MultiConvSoftmaxHead_0"],
            f"{arch}.head")
    elif arch == "SegmentationNet10aTwoHead":
        params["head_A"] = _multiconv_from(
            _group(sd, "head_A"), params["head_A"], f"{arch}.head_A")
        params["head_B"] = _multiconv_from(
            _group(sd, "head_B"), params["head_B"], f"{arch}.head_B")
    elif arch in ("TripletsNet5g", "TripletsNet6c"):
        # single Linear at head.head (baselines/triplets.py:16,54)
        m = _modmap(_group(sd, "head"))
        _check("head" in m, f"{arch}.head: expected head.head.*")
        d, k = params["kernel"].shape
        params["kernel"], params["bias"] = _linear_from(
            m["head"], d, k, f"{arch}.head.head")
    else:  # Doersch / Isola
        attr = ("doersch_head" if arch.endswith("Doersch") else "isola_head")
        _siamese_head_from(
            _group(sd, attr), params["_SiameseJointHead_0"],
            stats.get("_SiameseJointHead_0"), f"{arch}.{attr}", warnings)
    return v


def sup_head5_state_dict_to_variables(inner_arch, net_template,
                                      head_template, sd, warnings=None):
    """Split a SupHead5 wrapper state_dict (sup_head5.py:8-31) into the
    wrapped cluster net's variables (``trunk.*``) and the finetune head's
    SupHead5Head variables (``head.{0,1,3}.*``: Linear -> BatchNorm1d ->
    [ReLU] -> Linear). Returns (net_variables, head_variables)."""
    if warnings is None:
        warnings = []
    inner = collections.OrderedDict(
        (k[len("trunk."):], v) for k, v in sd.items()
        if k.startswith("trunk."))
    _check(inner, "no trunk.* keys — not a SupHead5 state_dict")
    net_vars = state_dict_to_variables(inner_arch, net_template, inner,
                                       warnings)
    hv = copy.deepcopy({k: head_template[k] for k in head_template})
    hp = hv["params"]
    mods = _modmap(_group(sd, "head"))
    for need in ("0", "1", "3"):
        _check(need in mods, f"SupHead5.head: missing module head.{need}")
    d1, k1 = hp["kernel1"].shape
    hp["kernel1"], hp["bias1"] = _linear_from(mods["0"], d1, k1,
                                              "SupHead5.head.0")
    bn = mods["1"]
    hp["BatchNorm_0"]["scale"] = _f32(bn["weight"])
    hp["BatchNorm_0"]["bias"] = _f32(bn["bias"])
    bn_stats = hv.get("batch_stats", {}).get("BatchNorm_0")
    if bn_stats is not None and "running_mean" in bn:
        bn_stats["mean"] = _f32(bn["running_mean"])
        bn_stats["var"] = _f32(bn["running_var"])
    elif "running_mean" in bn:
        warnings.append("SupHead5.head.1: running stats dropped "
                        "(template batchnorm_track=False)")
    d2, k2 = hp["kernel2"].shape
    hp["kernel2"], hp["bias2"] = _linear_from(mods["3"], d2, k2,
                                              "SupHead5.head.3")
    return net_vars, hv
