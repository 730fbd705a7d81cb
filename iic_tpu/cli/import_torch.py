"""Import a reference (xu-ji/IIC) PyTorch run directory into an iic_tpu run.

Usage::

  python -m iic_tpu.cli.import_torch --ref_dir <reference out/NNN> \\
      --out_root out --model_ind NNN [--greyscale] [--arch NAME] \\
      [--net_file FILE] [--set key=value ...]

Converts the reference's trained checkpoints — cluster-format
``latest_net.pytorch`` / ``best_net.pytorch``
(cluster_sobel_twohead.py:429-433), segmentation-format
``latest.pytorch`` / ``best.pytorch`` (segmentation_twohead.py:412-421),
or any explicit ``--net_file`` — into a normal iic_tpu run directory:
``out_root/model_ind`` with ``latest.ckpt`` / ``best.ckpt`` +
``config.pickle`` + ``config.txt``. The result is consumable by every
run-dir reader: trainers under ``--restart`` (fine-tuning continues on
TPU), ``cli/analysis/eval`` and friends, and the serving export
(``cli/export_model``). This also covers the pretrained model
directories the reference publishes.

The config comes from the reference dir's ``config.pickle`` when
readable (py2 pickle; argparse.Namespace fields map 1:1 onto the
iic_tpu dataclasses, unknown keys dropped), overridable/completable
with ``--arch`` and repeated ``--set key=value`` (values parsed as
JSON, falling back to string). Optimiser state is not imported — the
optax optimiser starts fresh (torch Adam moments do not transfer onto
a fresh optax tree); ``step`` restarts at 0 with ``last_epoch`` taken
from ``--last_epoch`` (default 0).

SupHead5 (semisup) wrapper checkpoints: pass the file as ``--net_file``
with ``--sup_head5``; the wrapped cluster net (``trunk.*``) is imported
into the run dir, and the finetune head mapping is available at library
level via ``iic_tpu.compat.sup_head5_state_dict_to_variables``.
"""

import argparse
import collections
import json
import os

from iic_tpu.compat import torch_import as ti
from iic_tpu.train.config import ClusterConfig, SegConfig, config_from_dict

# reference filename -> iic_tpu checkpoint name, in discovery order
_NET_FILES = [
    ("best_net.pytorch", "best"),      # cluster + semisup scripts
    ("latest_net.pytorch", "latest"),
    ("best.pytorch", "best"),          # segmentation scripts
    ("latest.pytorch", "latest"),
]


def build_template(config, semisup_head_B=False):
    """Net + init variables for any registry arch (baselines included)."""
    import jax
    import jax.numpy as jnp

    from iic_tpu import models

    if semisup_head_B:
        # models.make_* reads getattr(config, "semisup", False)
        config.semisup = True
    net = models.build(config.arch, config)
    x = jnp.zeros((2, config.in_channels, config.input_sz, config.input_sz),
                  jnp.float32)
    key = jax.random.PRNGKey(0)
    if config.arch.endswith(("Doersch", "Isola")):
        c = jnp.full((2, 2), config.input_sz // 2, jnp.int32)
        return net, net.init(key, x, centre=c, other=c, train=False)
    heads = ("A", "B") if "TwoHead" in config.arch else None
    return net, models.init_variables(net, key, x, heads=heads)


def _fresh_history(arch):
    if arch.startswith("Triplets"):
        return {"epoch_acc": [], "epoch_loss": [], "masses": [],
                "per_class_acc": []}
    if arch.endswith(("Doersch", "Isola")):
        return {"epoch_acc": [], "epoch_loss": []}
    from iic_tpu.train.cluster_trainer import _make_history
    return _make_history()


def assemble_config(args):
    ref_cfg, notes = {}, []
    if args.ref_dir:
        p = os.path.join(args.ref_dir, "config.pickle")
        if os.path.exists(p):
            try:
                ref_cfg = ti.read_reference_config(p)
            except ti.TorchImportError as e:
                notes.append(f"reference config unreadable ({e}); "
                             "relying on --arch/--set flags")
    overrides = {}
    for kv in args.set or []:
        k, _, v = kv.partition("=")
        try:
            overrides[k] = json.loads(v)
        except json.JSONDecodeError:
            overrides[k] = v
    merged = {**ref_cfg, **overrides}
    if args.arch:
        merged["arch"] = args.arch
    if "arch" not in merged:
        raise SystemExit("no arch: pass --arch or a readable reference "
                         "config.pickle")
    merged["out_root"] = args.out_root
    merged["model_ind"] = args.model_ind
    config = config_from_dict(merged)
    twohead = "TwoHead" in config.arch
    if isinstance(config, SegConfig):
        config.finalize(twohead=twohead)
    else:
        config.finalize(twohead=twohead, sobel=not args.greyscale)
    # explicit overrides win over finalize()'s derivations (e.g. an
    # in_channels the reference run dir recorded)
    for k, v in overrides.items():
        if hasattr(config, k):
            setattr(config, k, v)
    return config, notes


def import_one(config, net_path, name, sup_head5=False,
               semisup_head_B=False, last_epoch=0):
    """Import one reference net file into config's run dir as <name>.ckpt.
    Returns the warnings list."""
    from iic_tpu.parallel.train_step import create_train_state
    from iic_tpu.train import checkpoint as ckpt
    from iic_tpu.train.cluster_trainer import make_optimizer

    sd = ti.load_torch_file(net_path)
    if sup_head5:
        sd = collections.OrderedDict(
            (k[len("trunk."):], v) for k, v in sd.items()
            if k.startswith("trunk."))
        if not sd:
            raise ti.TorchImportError(
                f"{net_path}: no trunk.* keys — not a SupHead5 checkpoint")
        semisup_head_B = True
    warnings = []
    net, template = build_template(config, semisup_head_B=semisup_head_B)
    variables = ti.state_dict_to_variables(config.arch, template, sd,
                                           warnings)
    tx = make_optimizer(config)
    state = create_train_state(variables, tx)
    ckpt.save_checkpoint(config, state, _fresh_history(config.arch),
                         name=name, last_epoch=last_epoch)
    return warnings


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Import reference IIC torch checkpoints")
    parser.add_argument("--ref_dir", type=str, default="",
                        help="reference run dir (out/<model_ind>)")
    parser.add_argument("--net_file", type=str, default="",
                        help="explicit .pytorch file instead of scanning "
                        "--ref_dir")
    parser.add_argument("--out_root", type=str, required=True)
    parser.add_argument("--model_ind", type=int, required=True)
    parser.add_argument("--arch", type=str, default="")
    parser.add_argument("--greyscale", default=False, action="store_true",
                        help="greyscale (non-sobel) cluster config")
    parser.add_argument("--sup_head5", default=False, action="store_true",
                        help="--net_file is a SupHead5 wrapper: import the "
                        "wrapped cluster net (--arch = the wrapped arch)")
    parser.add_argument("--last_epoch", type=int, default=0)
    parser.add_argument("--set", action="append", metavar="KEY=VALUE",
                        help="config field override (JSON value)")
    args = parser.parse_args(argv)

    if not args.ref_dir and not args.net_file:
        parser.error("need --ref_dir and/or --net_file")
    config, notes = assemble_config(args)
    for n in notes:
        print(f"note: {n}")

    jobs = []
    if args.net_file:
        name = "best" if "best" in os.path.basename(args.net_file) \
            else "latest"
        jobs.append((args.net_file, name))
    else:
        for fname, name in _NET_FILES:
            p = os.path.join(args.ref_dir, fname)
            if os.path.exists(p) and not any(n == name for _, n in jobs):
                jobs.append((p, name))
    if not jobs:
        raise SystemExit(f"no .pytorch net files found in {args.ref_dir}")

    for path, name in jobs:
        warnings = import_one(config, path, name, sup_head5=args.sup_head5,
                              last_epoch=args.last_epoch)
        for w in warnings:
            print(f"warning: {w}")
        print(f"imported {path} -> "
              f"{os.path.join(config.out_root, str(config.model_ind))}"
              f"/{name}.ckpt")


if __name__ == "__main__":
    main()
