"""PyTorch twins of the flax networks + flax->torch weight transplant.

These re-create the reference architectures in modern PyTorch (py3) so the
parity tests can transplant flax parameters into a live torch model and
assert forward/training equivalence — the strongest achievable proxy for
accuracy parity in an environment without the paper's datasets.

Twinned architectures (reference citations):
  - TorchNet6c / TorchNet6cTwoHead  <- code/archs/cluster/net6c.py:10-88,
    net6c_two_head.py:9-98, vgg.py:4-35
  - TorchNet5g / TorchNet5gTwoHead  <- code/archs/cluster/net5g.py:10-103,
    residual.py:10-86
  - TorchNet10a / TorchNet10aTwoHead <- code/archs/segmentation/
    net10a.py:13-80, net10a_twohead.py:8-31

Written from the SURVEY.md architecture notes, not imported or copied from
the (python2) reference. Init values do not matter: every test transplants
flax-initialised weights before comparing.
"""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

NET6C_CFG = [(64, 1), ("M", None), (128, 1), ("M", None),
             (256, 1), ("M", None), (512, 1)]
NET10A_CFG = [(64, 1), (128, 1), ("M", None), (256, 1), (256, 1),
              (512, 2), (512, 2)]


def _vgg_layers(cfg, in_ch, conv_size, pad, track):
    layers = []
    for out, dilation in cfg:
        if out == "M":
            layers.append(nn.MaxPool2d(2, 2))
        elif out == "A":
            layers.append(nn.AvgPool2d(2, 2))
        else:
            layers += [
                nn.Conv2d(in_ch, out, conv_size, stride=1, padding=pad,
                          dilation=dilation, bias=False),
                nn.BatchNorm2d(out, track_running_stats=track),
                nn.ReLU(inplace=True),
            ]
            in_ch = out
    return nn.Sequential(*layers)


class TorchBasicBlock(nn.Module):
    def __init__(self, inplanes, planes, stride, track):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes, track_running_stats=track)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes, track_running_stats=track)
        self.downsample = None
        if stride != 1 or inplanes != planes:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, planes, 1, stride, bias=False),
                nn.BatchNorm2d(planes, track_running_stats=track))

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        res = x if self.downsample is None else self.downsample(x)
        return F.relu(out + res)


class TorchNet5gTrunk(nn.Module):
    def __init__(self, in_ch, input_sz, track):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, 64, 3, 1, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(64, track_running_stats=track)
        self.maxpool = nn.MaxPool2d(2, 2, padding=1)

        def make_layer(inplanes, planes, blocks, stride):
            return nn.Sequential(*[
                TorchBasicBlock(inplanes if i == 0 else planes, planes,
                                stride if i == 0 else 1, track)
                for i in range(blocks)])

        self.layer1 = make_layer(64, 64, 3, 1)
        self.layer2 = make_layer(64, 128, 4, 2)
        self.layer3 = make_layer(128, 256, 6, 2)
        self.layer4 = make_layer(256, 512, 3, 2)
        self.avgpool = nn.AvgPool2d({96: 7, 64: 5, 32: 3}[input_sz],
                                    stride=1)

    def forward(self, x, penultimate_features=False):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        x = self.layer3(self.layer2(self.layer1(x)))
        if not penultimate_features:
            x = self.avgpool(self.layer4(x))
        return x.flatten(1)


class _MultiLinearSoftmaxHeads(nn.ModuleList):
    def __init__(self, d, output_k, num_sub_heads):
        super().__init__([nn.Linear(d, output_k)
                          for _ in range(num_sub_heads)])

    def forward(self, x):
        return [F.softmax(h(x), dim=1) for h in self]


class TorchNet6c(nn.Module):
    def __init__(self, in_ch, input_sz, output_k, num_sub_heads, track=True):
        super().__init__()
        self.features = _vgg_layers(NET6C_CFG, in_ch, 5, 2, track)
        sp = {24: 3, 64: 8}[input_sz]
        self.heads = _MultiLinearSoftmaxHeads(512 * sp * sp, output_k,
                                              num_sub_heads)

    def forward(self, x):
        return self.heads(self.features(x).flatten(1))


class TorchNet6cTwoHead(nn.Module):
    def __init__(self, in_ch, input_sz, output_k_A, output_k_B,
                 num_sub_heads, track=True):
        super().__init__()
        self.features = _vgg_layers(NET6C_CFG, in_ch, 5, 2, track)
        sp = {24: 3, 64: 8}[input_sz]
        d = 512 * sp * sp
        self.head_A = _MultiLinearSoftmaxHeads(d, output_k_A, num_sub_heads)
        self.head_B = _MultiLinearSoftmaxHeads(d, output_k_B, num_sub_heads)

    def forward(self, x, head="B"):
        feats = self.features(x).flatten(1)
        return (self.head_A if head == "A" else self.head_B)(feats)


class TorchNet5g(nn.Module):
    def __init__(self, in_ch, input_sz, output_k, num_sub_heads, track=True):
        super().__init__()
        self.trunk = TorchNet5gTrunk(in_ch, input_sz, track)
        self.heads = _MultiLinearSoftmaxHeads(512, output_k, num_sub_heads)

    def forward(self, x):
        return self.heads(self.trunk(x))


class TorchNet5gTwoHead(nn.Module):
    def __init__(self, in_ch, input_sz, output_k_A, output_k_B,
                 num_sub_heads, track=True):
        super().__init__()
        self.trunk = TorchNet5gTrunk(in_ch, input_sz, track)
        self.head_A = _MultiLinearSoftmaxHeads(512, output_k_A, num_sub_heads)
        self.head_B = _MultiLinearSoftmaxHeads(512, output_k_B, num_sub_heads)

    def forward(self, x, head="B", penultimate_features=False):
        feats = self.trunk(x, penultimate_features=penultimate_features)
        return (self.head_A if head == "A" else self.head_B)(feats)


class _MultiConvSoftmaxHeads(nn.ModuleList):
    """1x1 conv (with the reference's padding=1 quirk) -> Softmax2d ->
    bilinear upsample to input_sz."""

    def __init__(self, c, output_k, num_sub_heads, input_sz):
        super().__init__([nn.Conv2d(c, output_k, 1, 1, padding=1, bias=False)
                          for _ in range(num_sub_heads)])
        self.input_sz = input_sz

    def forward(self, x):
        return [F.interpolate(F.softmax(h(x), dim=1), size=self.input_sz,
                              mode="bilinear", align_corners=False)
                for h in self]


class TorchNet10a(nn.Module):
    def __init__(self, in_ch, input_sz, output_k, num_sub_heads, track=True):
        super().__init__()
        self.features = _vgg_layers(NET10A_CFG, in_ch, 3, 1, track)
        self.heads = _MultiConvSoftmaxHeads(512, output_k, num_sub_heads,
                                            input_sz)

    def forward(self, x):
        return self.heads(self.features(x))


class TorchNet10aTwoHead(nn.Module):
    def __init__(self, in_ch, input_sz, output_k_A, output_k_B,
                 num_sub_heads, track=True):
        super().__init__()
        self.features = _vgg_layers(NET10A_CFG, in_ch, 3, 1, track)
        self.head_A = _MultiConvSoftmaxHeads(512, output_k_A, num_sub_heads,
                                             input_sz)
        self.head_B = _MultiConvSoftmaxHeads(512, output_k_B, num_sub_heads,
                                             input_sz)

    def forward(self, x, head="B"):
        feats = self.features(x)
        return (self.head_A if head == "A" else self.head_B)(feats)


# ----------------------------------------------------------------- transplant

def _walk_modules(tree, path=()):
    """Yield (path, subdict) for every flax module dict holding leaf params,
    in sorted-key (== execution) order."""
    if not isinstance(tree, dict):
        return
    leaf_names = {k for k, v in tree.items() if not isinstance(v, dict)}
    if leaf_names:
        yield path, tree
    for k in sorted(tree):
        if isinstance(tree[k], dict):
            yield from _walk_modules(tree[k], path + (k,))


def _lookup(tree, path):
    for k in path:
        if not isinstance(tree, dict) or k not in tree:
            return None
        tree = tree[k]
    return tree


def _t(x):
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


def transplant_trunk(flax_params, flax_stats, torch_module):
    """Copy flax trunk params (+ batch stats) into a torch twin module.

    Relies on two orderings matching (verified by the parity tests):
    flax sorted-key traversal visits Conv_i / BatchNorm_i in execution
    order within each module scope, and the torch twins define their
    submodules in the same execution order.
    """
    t_convs = [m for m in torch_module.modules() if isinstance(m, nn.Conv2d)]
    t_bns = [m for m in torch_module.modules()
             if isinstance(m, nn.BatchNorm2d)]
    f_convs, f_bns = [], []
    for path, node in _walk_modules(flax_params):
        if "kernel" in node and np.ndim(node["kernel"]) == 4:
            f_convs.append(node)
        if "scale" in node:
            f_bns.append((path, node))
    assert len(t_convs) == len(f_convs), (len(t_convs), len(f_convs))
    assert len(t_bns) == len(f_bns), (len(t_bns), len(f_bns))
    with torch.no_grad():
        for tc, fc in zip(t_convs, f_convs):
            w = _t(np.transpose(fc["kernel"], (3, 2, 0, 1)))
            assert tc.weight.shape == w.shape, (tc.weight.shape, w.shape)
            tc.weight.copy_(w)
        for tb, (path, fb) in zip(t_bns, f_bns):
            tb.weight.copy_(_t(fb["scale"]))
            tb.bias.copy_(_t(fb["bias"]))
            stats = _lookup(flax_stats, path) if flax_stats else None
            if stats is not None and tb.track_running_stats:
                tb.running_mean.copy_(_t(stats["mean"]))
                tb.running_var.copy_(_t(stats["var"]))


def transplant_linear_heads(flax_head, torch_heads):
    """MultiDenseHead kernel (S, D, K) / bias (S, K) -> S torch Linears."""
    kernel = np.asarray(flax_head["kernel"])
    bias = np.asarray(flax_head["bias"])
    assert len(torch_heads) == kernel.shape[0]
    with torch.no_grad():
        for i, lin in enumerate(torch_heads):
            lin.weight.copy_(_t(kernel[i].T))
            lin.bias.copy_(_t(bias[i]))


def transplant_conv_heads(flax_head, torch_heads):
    """MultiConvSoftmaxHead kernel (1, 1, C, S*K) -> S torch 1x1 convs."""
    kernel = np.asarray(flax_head["kernel"])
    _, _, c, sk = kernel.shape
    s = len(torch_heads)
    k = sk // s
    per_head = kernel.reshape(c, s, k)  # matches the flax reshape
    with torch.no_grad():
        for i, conv in enumerate(torch_heads):
            w = per_head[:, i, :].T.reshape(k, c, 1, 1)
            conv.weight.copy_(_t(w))


def transplant_cluster_net(variables, torch_net, trunk_key, twohead):
    params, stats = variables["params"], variables.get("batch_stats", {})
    trunk = (torch_net.features if hasattr(torch_net, "features")
             else torch_net.trunk)
    transplant_trunk(params[trunk_key], stats.get(trunk_key), trunk)
    if twohead:
        transplant_linear_heads(params["head_A"], torch_net.head_A)
        transplant_linear_heads(params["head_B"], torch_net.head_B)
    else:
        transplant_linear_heads(params["MultiDenseHead_0"], torch_net.heads)


def transplant_seg_net(variables, torch_net, twohead):
    params, stats = variables["params"], variables.get("batch_stats", {})
    transplant_trunk(params["SegmentationNet10aTrunk_0"],
                     stats.get("SegmentationNet10aTrunk_0"),
                     torch_net.features)
    if twohead:
        transplant_conv_heads(params["head_A"], torch_net.head_A)
        transplant_conv_heads(params["head_B"], torch_net.head_B)
    else:
        transplant_conv_heads(params["MultiConvSoftmaxHead_0"],
                              torch_net.heads)


class TorchSupHead5(nn.Module):
    """SupHead5 finetune head twin (code/archs/semisup/sup_head5.py:8-37):
    Linear(dlen, 2048) -> BatchNorm1d -> ReLU -> Linear(2048, gt_k), no
    softmax. The trunk forward is composed by the caller, matching the
    functional split in iic_tpu.models.semisup."""

    def __init__(self, dlen, gt_k, track=True):
        super().__init__()
        self.lin1 = nn.Linear(dlen, 2048)
        self.bn = nn.BatchNorm1d(2048, track_running_stats=track)
        self.lin2 = nn.Linear(2048, gt_k)

    def forward(self, feats):
        return self.lin2(torch.relu(self.bn(self.lin1(feats))))


def transplant_sup_head(head_vars, torch_head):
    """SupHead5Head flax params (kernel1/bias1, BatchNorm_0, kernel2/bias2)
    -> TorchSupHead5."""
    params = head_vars["params"]
    stats = head_vars.get("batch_stats", {})
    with torch.no_grad():
        torch_head.lin1.weight.copy_(_t(np.asarray(params["kernel1"]).T))
        torch_head.lin1.bias.copy_(_t(params["bias1"]))
        torch_head.lin2.weight.copy_(_t(np.asarray(params["kernel2"]).T))
        torch_head.lin2.bias.copy_(_t(params["bias2"]))
        bn_p = params["BatchNorm_0"]
        torch_head.bn.weight.copy_(_t(bn_p["scale"]))
        torch_head.bn.bias.copy_(_t(bn_p["bias"]))
        bn_s = _lookup(stats, ("BatchNorm_0",))
        if bn_s is not None and torch_head.bn.track_running_stats:
            torch_head.bn.running_mean.copy_(_t(bn_s["mean"]))
            torch_head.bn.running_var.copy_(_t(bn_s["var"]))
