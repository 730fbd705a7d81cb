"""Inference / serving path — a TPU-native addition beyond the reference.

The reference stops at analysis scripts that reload checkpoints inside
the training codebase; there is no deployable predictor. Here a trained
run directory becomes a servable artifact:

- ``load_run``: reload config + best (or latest) weights + the best
  epoch's sub-head/Hungarian match for any cluster or segmentation run.
- ``make_cluster_predictor`` / ``make_seg_predictor``: jitted batch
  predictors taking raw uint8 images and returning final class ids —
  tf3 preprocessing, sobel, eval-mode forward of the best sub-head,
  argmax, and the stored match reordering all fused into one program.
- ``export_predictor`` / ``load_exported``: serialize the predictor via
  ``jax.export`` (StableHLO) with a symbolic batch dimension, so a
  serving container can run any batch size without retracing or needing
  this package at all.
"""

import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp

from iic_tpu.ops.sobel import sobel_process
from iic_tpu.train.config import config_from_dict


def _best_epoch_stats(history):
    ev = history["eval"]
    accs = list(ev.epoch_acc)
    if not accs:
        raise ValueError("run has no eval history")
    return ev.epoch_stats[int(np.argmax(accs))]


def load_run(out_root, model_ind, name="best"):
    """Reload a trained run: (config, net, variables, stats).

    ``stats`` is the best epoch's stats dict (best sub-head index + its
    match). Falls back to the latest checkpoint when no best exists,
    probing the backend the run actually used (msgpack or orbax)."""
    from iic_tpu.train import checkpoint as ckpt

    run_dir = os.path.join(out_root, str(model_ind))
    with open(os.path.join(run_dir, "config.pickle"), "rb") as f:
        meta = pickle.load(f)
    config = config_from_dict(meta["config"])
    # load the checkpoint from where the CALLER found the run, not from
    # the out_root pickled at train time — a moved/copied run dir would
    # otherwise load stale weights from the old location (or crash)
    config.out_root = out_root

    if "Segmentation" in config.arch:
        from iic_tpu.train.seg_trainer import build_seg_net_and_state
        net, _, template = build_seg_net_and_state(config)
    else:
        from iic_tpu.train.cluster_trainer import build_net_and_state
        net, _, template = build_net_and_state(config)

    best_file = ("best_orbax" if getattr(config, "use_orbax", False)
                 else "best.ckpt")
    if name == "best" and not os.path.exists(
            os.path.join(run_dir, best_file)):
        name = "latest"
    state, history, last_epoch = ckpt.load_checkpoint(config, template,
                                                      name=name)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    # the sub-head/Hungarian match must come from the SAME epoch as the
    # weights: cluster identities drift between epochs, so pairing latest
    # weights with the best epoch's match would permute ids wrongly
    ev = history["eval"]
    if not list(ev.epoch_acc):
        raise ValueError("run has no eval history")
    if name == "latest":
        idx = min(int(last_epoch), len(ev.epoch_stats) - 1)
        stats = ev.epoch_stats[idx]
    else:
        stats = _best_epoch_stats(history)
    return config, net, variables, stats


def _clean_variables(variables):
    """Drop an empty batch_stats collection (track_running_stats=False
    runs have none)."""
    v = {"params": variables["params"]}
    if variables.get("batch_stats"):
        v["batch_stats"] = variables["batch_stats"]
    return v


def _match_table(match, output_k, dtype=jnp.int32):
    """(pred, target) pairs -> a dense lookup vector."""
    table = np.zeros(output_k, np.int32)
    for pred, target in match:
        table[pred] = target
    return jnp.asarray(table, dtype)


def make_cluster_predictor(config, net, variables, stats):
    """uint8 (b, H, W, C) raw images -> (b,) int32 final class ids.

    Applies tf3 (deterministic centre-crop/resize eval transform), sobel
    channels when the run used them, the eval-mode forward of the best
    sub-head, argmax, and the stored Hungarian match."""
    from iic_tpu.data.pipeline import _is_greyscale
    from iic_tpu.data.transforms import (
        make_greyscale_pair_transforms, make_sobel_pair_transforms)

    if _is_greyscale(config):
        _, _, tf3 = make_greyscale_pair_transforms(config)
    else:
        _, _, tf3 = make_sobel_pair_transforms(config)

    sub_head = stats["best_train_sub_head"]
    table = _match_table(stats["best_train_sub_head_match"],
                         config.output_k)
    head_kw = {"head": "B"} if getattr(config, "twohead", False) else {}
    variables = _clean_variables(variables)

    def predict(imgs_u8):
        imgs = imgs_u8.astype(jnp.float32) / 255.0
        imgs = jax.vmap(tf3)(imgs)
        imgs = jnp.transpose(imgs, (0, 3, 1, 2))  # NCHW
        if config.sobel:
            imgs = sobel_process(imgs, config.include_rgb)
        out = net.apply(variables, imgs, train=False, **head_kw)
        preds = jnp.argmax(out[sub_head], axis=-1)  # (b,)
        return table[preds]

    return predict


def make_seg_predictor(config, net, variables, stats):
    """uint8 (b, sz, sz, C_raw) prepared images -> (b, sz, sz) int32 final
    per-pixel class ids (same input convention as the mapping loaders:
    geometry already at input_sz; channel prep/sobel happen here)."""
    from iic_tpu.data.transforms import append_grey, to_grey

    sub_head = stats["best_train_sub_head"]
    table = _match_table(stats["best_train_sub_head_match"],
                         config.output_k)
    head_kw = {"head": "B"} if getattr(config, "twohead", False) else {}
    variables = _clean_variables(variables)

    def predict(imgs_u8):
        imgs = imgs_u8.astype(jnp.float32) / 255.0
        if config.using_IR:
            rgb, ir = imgs[..., :3], imgs[..., 3:4]
        else:
            rgb, ir = imgs, None
        if config.sobel:
            out = jax.vmap(
                lambda im: append_grey(im, config.include_rgb))(rgb)
        elif not config.include_rgb:
            out = jax.vmap(to_grey)(rgb)
        else:
            out = rgb
        if ir is not None:
            out = jnp.concatenate([out, ir], axis=-1)
        x = jnp.transpose(out, (0, 3, 1, 2))
        if config.sobel:
            x = sobel_process(x, config.include_rgb,
                              using_IR=config.using_IR)
        probs = net.apply(variables, x, train=False, **head_kw)
        preds = jnp.argmax(probs[sub_head], axis=1)  # (b, sz, sz)
        return table[preds]

    return predict


def export_predictor(predict_fn, example_u8, path=None,
                     symbolic_batch=True):
    """Serialize a predictor to a StableHLO artifact (jax.export).

    ``example_u8``: one example batch (its non-batch dims fix the served
    shape). ``symbolic_batch=True`` exports with a polymorphic leading
    dim so any batch size is servable from the one artifact. Returns the
    serialized bytes (also written to ``path`` when given)."""
    shape = example_u8.shape
    if symbolic_batch:
        spec_str = ", ".join(["b"] + [str(s) for s in shape[1:]])
        (spec,) = jax.export.symbolic_args_specs(
            (jax.ShapeDtypeStruct(shape, jnp.uint8),), spec_str)
    else:
        spec = jax.ShapeDtypeStruct(shape, jnp.uint8)
    exported = jax.export.export(jax.jit(predict_fn))(spec)
    data = exported.serialize()
    if path is not None:
        with open(path, "wb") as f:
            f.write(data)
    return data


def load_exported(path_or_bytes):
    """Deserialize an exported predictor; returns a callable."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    exported = jax.export.deserialize(data)
    return lambda imgs_u8: exported.call(imgs_u8)
