"""Checkpointing with the reference's run-directory layout and restart
semantics (SURVEY.md §5.4): ``out_root/model_ind/`` holds latest/best model+
optimiser state, a pickled config + metric history (the reference's
"config-as-experiment-database"), and a human-readable config.txt. State is
serialised with flax msgpack; checkpoints are device-agnostic."""

import dataclasses
import os
import pickle

import jax
import numpy as np
from flax import serialization

from iic_tpu.parallel.train_step import TrainState
from iic_tpu.train.config import config_to_str


def run_dir(config):
    d = os.path.join(config.out_root, str(config.model_ind))
    os.makedirs(d, exist_ok=True)
    return d


def enable_compile_cache(config):
    """Point JAX's persistent compilation cache at a dir shared across
    runs (``out_root/.jax_cache``) so CLI restarts / sibling model_inds
    skip the multi-minute fused-program compiles. No-op when a cache dir
    is already configured (tests configure their own in conftest) or
    when ``config.no_compile_cache`` is set."""
    if getattr(config, "no_compile_cache", False):
        return
    if jax.config.jax_compilation_cache_dir:
        return
    d = os.path.join(config.out_root or ".", ".jax_cache")
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _state_to_bytes(state):
    pure = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "step": int(state.step),
    }
    return serialization.to_bytes(pure)


def _write_meta(config, history, last_epoch, name):
    """config.pickle + config.txt each save; additionally snapshot
    best_config.pickle when saving a best checkpoint, like the reference's
    separate best-epoch config dump (cluster_sobel_twohead.py:444-449)."""
    d = run_dir(config)
    cfg_dict = (dataclasses.asdict(config)
                if dataclasses.is_dataclass(config) else dict(vars(config)))
    meta = {
        "config": cfg_dict,
        "history": history,
        "last_epoch": last_epoch,
    }
    with open(os.path.join(d, "config.pickle"), "wb") as f:
        pickle.dump(meta, f)
    if name == "best":
        with open(os.path.join(d, "best_config.pickle"), "wb") as f:
            pickle.dump(meta, f)
    with open(os.path.join(d, "config.txt"), "w") as f:
        f.write(config_to_str(config) + f"\nlast_epoch: {last_epoch}\n")


def save_meta(config, history, last_epoch):
    """config.pickle + config.txt only — written EVERY epoch like the
    reference (cluster_sobel_twohead.py:449-455), so analysis/report
    tooling sees the full metric history even between checkpoint epochs
    and after --test_code runs. ``last_epoch`` must stay the last epoch
    whose LATEST weights were saved (reference :433) so a plain restart
    pairs meta with on-disk weights."""
    _write_meta(config, history, last_epoch, name="meta")


def save_checkpoint(config, state, history, name="latest", last_epoch=None):
    """Write <name>.ckpt + config.pickle + config.txt (+ best_config.pickle
    for best saves). ``last_epoch`` mirrors config.last_epoch (restart
    bookmark). ``config.use_orbax`` routes through the Orbax backend."""
    if getattr(config, "use_orbax", False):
        return save_checkpoint_orbax(config, state, history, name=name,
                                     last_epoch=last_epoch)
    d = run_dir(config)
    with open(os.path.join(d, f"{name}.ckpt"), "wb") as f:
        f.write(_state_to_bytes(state))
    _write_meta(config, history, last_epoch, name)


_ASYNC_CKPTR = None


def _orbax_checkpointer():
    """Process-wide AsyncCheckpointer: saves overlap the next epochs of
    training; waits happen lazily (before the next save of the same
    process, before any load, and via wait_for_orbax())."""
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        import orbax.checkpoint as ocp
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(
            ocp.StandardCheckpointHandler())
    return _ASYNC_CKPTR


def wait_for_orbax():
    """Block until any in-flight async orbax save has committed."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def save_checkpoint_orbax(config, state, history, name="latest",
                          last_epoch=None):
    """Orbax-backed checkpoint (async, multi-host-safe) — the production
    alternative to the msgpack files; same run-dir layout. The save is
    dispatched in the background; the previous in-flight save (if any) is
    drained first so at most one write is outstanding."""
    d = run_dir(config)
    path = os.path.abspath(os.path.join(d, f"{name}_orbax"))
    ckptr = _orbax_checkpointer()
    ckptr.wait_until_finished()
    pure = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "step": int(state.step),
        # committed ATOMICALLY with the weights: restart trusts this over
        # config.pickle's last_epoch, which is written while the async
        # save may still be in flight (a crash in that window would
        # otherwise pair epoch-N metadata with older weights)
        "last_epoch": int(last_epoch),
    }
    ckptr.save(path, args=_orbax_save_args(pure), force=True)
    _write_meta(config, history, last_epoch, name)


def _orbax_save_args(pure):
    import orbax.checkpoint as ocp
    return ocp.args.StandardSave(pure)


def load_checkpoint_orbax(config, state_template, name="latest"):
    import orbax.checkpoint as ocp

    from iic_tpu.parallel.train_step import TrainState as TS

    wait_for_orbax()  # drain any in-flight async save first
    d = run_dir(config)
    path = os.path.abspath(os.path.join(d, f"{name}_orbax"))
    ckptr = ocp.StandardCheckpointer()
    target = {
        "params": jax.device_get(state_template.params),
        "batch_stats": jax.device_get(state_template.batch_stats),
        "opt_state": jax.device_get(state_template.opt_state),
        "step": 0,
        "last_epoch": 0,
    }
    # Probe the checkpoint's own structure for the last_epoch leaf instead
    # of retrying on arbitrary restore errors (a genuinely corrupt
    # checkpoint must surface its original exception, not a misleading
    # structure-mismatch one from a blind retry).
    try:
        saved_keys = set(ckptr.metadata(path).keys())
    except Exception:
        saved_keys = None  # no readable metadata: assume current format
    if saved_keys is not None and "last_epoch" not in saved_keys:
        # checkpoints from before last_epoch was stored in the tree
        target.pop("last_epoch")
    pure = ckptr.restore(path, target)
    state = TS(params=pure["params"], batch_stats=pure["batch_stats"],
               opt_state=pure["opt_state"],
               step=np.asarray(pure["step"], np.int32))
    with open(os.path.join(d, "config.pickle"), "rb") as f:
        meta = pickle.load(f)
    # the checkpoint's own last_epoch is authoritative (committed with the
    # weights); meta may be one save ahead if a crash hit an in-flight
    # async write — the trainer's history truncation then trims the extra
    last_epoch = int(pure.get("last_epoch", meta["last_epoch"]))
    return state, meta["history"], last_epoch


def load_checkpoint(config, state_template, name="latest"):
    """Restore (state, history, last_epoch) from a run dir. The template
    provides the pytree structure (same shapes as at save time).
    ``config.use_orbax`` routes through the Orbax backend."""
    if getattr(config, "use_orbax", False):
        return load_checkpoint_orbax(config, state_template, name=name)
    d = run_dir(config)
    with open(os.path.join(d, f"{name}.ckpt"), "rb") as f:
        raw = f.read()
    target = {
        "params": jax.device_get(state_template.params),
        "batch_stats": jax.device_get(state_template.batch_stats),
        "opt_state": jax.device_get(state_template.opt_state),
        "step": 0,
    }
    pure = serialization.from_bytes(target, raw)
    state = TrainState(
        params=pure["params"], batch_stats=pure["batch_stats"],
        opt_state=pure["opt_state"],
        step=np.asarray(pure["step"], np.int32))
    with open(os.path.join(d, "config.pickle"), "rb") as f:
        meta = pickle.load(f)
    return state, meta["history"], meta["last_epoch"]
