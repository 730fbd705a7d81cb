"""Semi-supervised finetune workload.

Mirror of code/scripts/semisup/IID_semisup_STL10.py: reload a pretrained
IID+ overclustering run by ``old_model_ind`` (config + best checkpoint),
wrap its trunk with the SupHead5 head (Linear-BN-ReLU-Linear), train with
cross-entropy under the tf2 augmentations, with TWO learning rates (trunk
vs head — the reference's two Adam optimisers become one
``optax.multi_transform``), and evaluate with 10-crop block-averaged logits
(``assess_acc_block``, code/utils/semisup/general.py:46-94).
"""

import dataclasses
import os
import pickle
import sys
from datetime import datetime
from types import SimpleNamespace

import numpy as np
import jax
import jax.numpy as jnp
import optax

from iic_tpu import models
from iic_tpu.data import readers
from iic_tpu.data.semisup import SemisupTrainLoader, make_tencrop_batch_fn
from iic_tpu.data.transforms import (
    make_greyscale_pair_transforms, make_sobel_pair_transforms)
from iic_tpu.models.semisup import SupHead5Head
from iic_tpu.ops.sobel import sobel_process
from iic_tpu.parallel.train_step import TrainState
from iic_tpu.train import checkpoint as ckpt
from iic_tpu.train.cluster_trainer import (build_net_and_state,
                                           host_prefetch_iter)
from iic_tpu.train.config import ClusterConfig, config_to_str


def _log(msg):
    print(msg)
    sys.stdout.flush()


def load_old_run(config):
    """Reload old config + best checkpoint for the feature trunk
    (reference IID_semisup_STL10.py:106-166)."""
    old_dir = os.path.join(config.out_root, str(config.old_model_ind))
    with open(os.path.join(old_dir, "config.pickle"), "rb") as f:
        meta = pickle.load(f)
    old_config = ClusterConfig(**{
        k: v for k, v in meta["config"].items()
        if k in {f.name for f in dataclasses.fields(ClusterConfig)}})
    # tuples got pickled as lists
    for f in dataclasses.fields(ClusterConfig):
        v = getattr(old_config, f.name)
        if isinstance(v, list):
            setattr(old_config, f.name, tuple(v))
    assert old_config.model_ind == config.old_model_ind

    net, tx, template = build_net_and_state(old_config)
    # probe the backend the old run actually used (msgpack or orbax dir)
    best_file = ("best_orbax" if getattr(old_config, "use_orbax", False)
                 else "best.ckpt")
    name = "best"
    if not os.path.exists(os.path.join(old_dir, best_file)):
        name = "latest"  # no epoch beat the pre-eval yet
    state, _, _ = ckpt.load_checkpoint(old_config, template, name=name)
    return old_config, net, state


def get_dlen(net, variables, dummy_imgs, penultimate_features=False):
    """Probe trunk feature dim (reference utils/semisup/general.py:9-20)."""
    feats = net.apply(
        {k: v for k, v in variables.items() if v}, dummy_imgs,
        train=False, trunk_features=True,
        penultimate_features=penultimate_features)
    return int(np.prod(feats.shape[1:]))


def assess_acc_block(apply_fn, test_images_u8, test_labels, tencrop_fn,
                     gt_k, batch_images=64):
    """10-crop block-averaged accuracy (reference general.py:46-94):
    average logits over each image's 10 crops, argmax, compare."""
    n = len(test_images_u8)
    correct = 0
    for start in range(0, n, batch_images):
        imgs = test_images_u8[start:start + batch_images]
        labels = test_labels[start:start + batch_images]
        crops = tencrop_fn(jnp.asarray(imgs))  # (b*10, C, s, s)
        logits = np.asarray(apply_fn(crops))  # (b*10, gt_k)
        logits = logits.reshape(len(imgs), 10, -1).mean(axis=1)
        preds = logits.argmax(axis=1)
        assert preds.min() >= 0 and preds.max() < gt_k
        correct += (preds == labels).sum()
    return correct / float(n)


def _multi_set_lr_mult(state, lr_mult):
    """Multiply the learning rate of every labelled sub-optimizer inside a
    multi_transform state (reference ``update_lr`` applied to both Adams,
    IID_semisup_STL10.py:229-234)."""
    def fix(node):
        if hasattr(node, "hyperparams"):
            hp = dict(node.hyperparams)
            hp["learning_rate"] = hp["learning_rate"] * lr_mult
            return node._replace(hyperparams=hp)
        if hasattr(node, "inner_state"):
            return node._replace(inner_state=fix(node.inner_state))
        return node

    opt_state = state.opt_state
    inner = {k: fix(v) for k, v in opt_state.inner_states.items()}
    return dataclasses.replace(
        state, opt_state=opt_state._replace(inner_states=inner))


def train_semisup(config):
    """Run the semisup finetune. Returns (state, history dict)."""
    _log(config_to_str(config))
    ckpt.enable_compile_cache(config)
    old_config, trunk_net, trunk_state = load_old_run(config)

    if config.new_batch_sz == -1:
        config.new_batch_sz = old_config.batch_sz

    # data: supervised train split + TenCrop test split
    sup_cfg = SimpleNamespace(**dataclasses.asdict(old_config))
    sup_cfg.cutout = config.cutout
    sup_cfg.cutout_p = config.cutout_p
    sup_cfg.cutout_max_box = config.cutout_max_box
    sup_cfg.use_random_affine = config.random_affine
    sup_cfg.affine_p = config.affine_p
    # the reference workload is STL10 (sobel); greyscale old models
    # (MNIST/Digits overclustering) finetune through the greyscale tf2
    # with no sobel stage — a capability extension beyond the reference
    from iic_tpu.data.pipeline import _is_greyscale
    grey = _is_greyscale(old_config)
    if grey:
        tf1, tf2, tf3 = make_greyscale_pair_transforms(sup_cfg)
    else:
        tf1, tf2, tf3 = make_sobel_pair_transforms(sup_cfg)

    if old_config.dataset == "STL10":
        train_part, test_part = "train", "test"
    else:  # synthetic / other clustering datasets (testing)
        train_part, test_part = True, False
    train_d = readers.load_dataset(old_config.dataset,
                                   old_config.dataset_root, train_part)
    test_d = readers.load_dataset(old_config.dataset,
                                  old_config.dataset_root, test_part)

    train_imgs, train_labels = train_d["images"], train_d["labels"]
    pc = getattr(config, "train_label_pc", 1.0)
    if pc < 1.0:  # fewer-labels semisup: keep a random fixed fraction
        rng = np.random.default_rng(config.seed)
        keep = rng.permutation(len(train_imgs))[:int(len(train_imgs) * pc)]
        train_imgs, train_labels = train_imgs[keep], train_labels[keep]
        _log(f"train_label_pc {pc}: {len(train_imgs)} labelled samples")

    train_loader = SemisupTrainLoader(
        config, train_imgs, train_labels,
        min(config.new_batch_sz, len(train_imgs)), seed=config.seed)
    tencrop_fn = make_tencrop_batch_fn(old_config.input_sz,
                                       old_config.include_rgb,
                                       grey_append=not grey)

    # model: trunk (pretrained) + SupHead5 head
    dummy = jnp.zeros((2, old_config.in_channels, old_config.input_sz,
                       old_config.input_sz))
    trunk_vars = {"params": trunk_state.params,
                  "batch_stats": trunk_state.batch_stats}
    dlen = get_dlen(trunk_net, trunk_vars, dummy,
                    penultimate_features=config.penultimate_features)
    _log(f"dlen: {dlen}")

    head = SupHead5Head(gt_k=old_config.gt_k,
                        batchnorm_track=old_config.batchnorm_track)
    head_vars = head.init(jax.random.PRNGKey(config.seed),
                          jnp.zeros((2, dlen)))

    params = {"trunk": trunk_state.params, "head": head_vars["params"]}
    batch_stats = {"trunk": trunk_state.batch_stats,
                   "head": head_vars.get("batch_stats", {})}

    # two Adams (reference :183-190) as one multi_transform
    tx = optax.multi_transform(
        {"trunk": optax.inject_hyperparams(optax.adam)(config.trunk_lr),
         "head": optax.inject_hyperparams(optax.adam)(config.head_lr)},
        {"trunk": "trunk", "head": "head"})
    state = TrainState(params=params, batch_stats=batch_stats,
                       opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))

    include_rgb = old_config.include_rgb
    penult = config.penultimate_features

    def forward(params, batch_stats, imgs, train):
        tv = {"params": params["trunk"]}
        if batch_stats["trunk"]:
            tv["batch_stats"] = batch_stats["trunk"]
            if train:
                feats, upd = trunk_net.apply(
                    tv, imgs, train=True, trunk_features=True,
                    penultimate_features=penult, mutable=["batch_stats"])
                bs_trunk = upd["batch_stats"]
            else:
                feats = trunk_net.apply(
                    tv, imgs, train=False, trunk_features=True,
                    penultimate_features=penult)
                bs_trunk = batch_stats["trunk"]
        else:
            feats = trunk_net.apply(tv, imgs, train=train,
                                    trunk_features=True,
                                    penultimate_features=penult)
            bs_trunk = batch_stats["trunk"]

        hv = {"params": params["head"]}
        if batch_stats["head"]:
            hv["batch_stats"] = batch_stats["head"]
            if train:
                logits, upd = head.apply(hv, feats, train=True,
                                         mutable=["batch_stats"])
                bs_head = upd["batch_stats"]
            else:
                logits = head.apply(hv, feats, train=False)
                bs_head = batch_stats["head"]
        else:
            logits = head.apply(hv, feats, train=train)
            bs_head = batch_stats["head"]
        return logits, {"trunk": bs_trunk, "head": bs_head}

    def augment_train(imgs_u8, key):
        imgs = imgs_u8.astype(jnp.float32) / 255.0
        keys = jax.random.split(key, imgs.shape[0])
        out = jax.vmap(tf2)(imgs, keys)  # (b, sz, sz, C')
        imgs = jnp.transpose(out, (0, 3, 1, 2))
        if not grey:
            imgs = sobel_process(imgs, include_rgb)
        return imgs

    # data-parallel mesh (the reference runs semisup on 4-GPU
    # DataParallel, commands.txt:89): batch sharded over the data axis,
    # CE mean + grads pmean'd (equal shards -> identical global mean).
    # Ragged final batches fall back to a lazily-built unsharded step.
    mesh = None
    n_dev = getattr(config, "n_devices", None)
    if n_dev is not None and n_dev > 1:
        from iic_tpu.parallel import make_mesh
        mesh = make_mesh(n_dev)
        bs_used = train_loader.batch_sz
        if bs_used % n_dev:
            train_loader.batch_sz = max((bs_used // n_dev) * n_dev, n_dev)
            train_loader.num_batches = int(np.ceil(
                len(train_loader.images) / train_loader.batch_sz))
            _log(f"mesh({n_dev}): adjusted semisup batch_sz "
                 f"{bs_used} -> {train_loader.batch_sz}")

    from iic_tpu.parallel.train_step import make_semisup_train_step
    step_sharded = make_semisup_train_step(forward, augment_train, tx,
                                           mesh=mesh)
    _fallback = {}

    def train_step(state, imgs_u8, labels, key):
        if mesh is not None and imgs_u8.shape[0] % mesh.size:
            if "step" not in _fallback:
                _log(f"ragged semisup batch ({imgs_u8.shape[0]}): "
                     "building unsharded step")
                _fallback["step"] = make_semisup_train_step(
                    forward, augment_train, tx, mesh=None)
            return _fallback["step"](state, (imgs_u8, labels), key)
        return step_sharded(state, (imgs_u8, labels), key)

    @jax.jit
    def eval_apply(params, batch_stats, imgs):
        if not grey:
            imgs = sobel_process(imgs, include_rgb)
        logits, _ = forward(params, batch_stats, imgs, False)
        return logits

    history = {"epoch_acc": [], "epoch_loss": []}
    start_epoch = 0
    if config.restart:
        state, history, last_epoch = ckpt.load_checkpoint(config, state,
                                                          name="latest")
        start_epoch = last_epoch + 1
        # config.pickle is written EVERY epoch but latest.ckpt only every
        # 10: drop history entries past the restored weights (reference
        # IID_semisup_STL10.py:96-97) so re-run epochs are not
        # double-appended and is_best is judged against the surviving
        # trajectory only. epoch_acc has a "pre" entry at index 0, so
        # epoch e lives at index e + 1; epoch_loss at index e.
        del history["epoch_acc"][last_epoch + 2:]
        del history["epoch_loss"][last_epoch + 1:]
        if config.restart_new_model_ind:
            # continue under a new run id (reference :215-222)
            config.model_ind = config.new_model_ind
            _log(f"restarting as model {config.model_ind}")
    else:
        acc = assess_acc_block(
            lambda im: eval_apply(state.params, state.batch_stats, im),
            test_d["images"], test_d["labels"], tencrop_fn,
            old_config.gt_k)
        _log(f"pre: model {config.model_ind} old model "
             f"{config.old_model_ind}, acc {acc:.6f} {datetime.now()}")
        history["epoch_acc"].append(float(acc))

    last_saved = start_epoch - 1  # epoch of the on-disk latest weights
    for e_i in range(start_epoch, config.num_epochs):
        if e_i in set(config.lr_schedule):
            state = _multi_set_lr_mult(state, config.lr_mult)
            _log(f"e_i {e_i}, multiplying trunk and head lr by "
                 f"{config.lr_mult}")

        avg_loss = 0.0
        count = 0
        it = host_prefetch_iter(train_loader.epoch(e_i), config)
        for b_i, (imgs, labels, key) in enumerate(it):
            state, loss = train_step(state, imgs, labels, key)
            loss = float(loss)
            if not np.isfinite(loss):
                _log(f"Loss is NaN/inf ({loss}). Exiting.")
                sys.exit(1)
            avg_loss += loss
            count += 1
            if b_i % 100 == 0:
                _log(f"batch {b_i} of {len(train_loader)}, loss {loss:.5f} "
                     f"{datetime.now()}")
            if config.test_code and b_i >= 1:
                break
        if hasattr(it, "close"):
            it.close()  # early-exit safe; no-op when exhausted
        avg_loss /= count

        acc = assess_acc_block(
            lambda im: eval_apply(state.params, state.batch_stats, im),
            test_d["images"], test_d["labels"], tencrop_fn,
            old_config.gt_k)
        _log(f"model {config.model_ind} old model {config.old_model_ind} "
             f"epoch {e_i} acc {acc:.6f} {datetime.now()}")

        is_best = acc > max(history["epoch_acc"])
        history["epoch_acc"].append(float(acc))
        history["epoch_loss"].append(avg_loss)

        if e_i % 10 == 0 or e_i == config.num_epochs - 1:
            ckpt.save_checkpoint(config, state, history, "latest",
                                 last_epoch=e_i)
            last_saved = e_i
        if is_best:
            ckpt.save_checkpoint(config, state, history, "best",
                                 last_epoch=last_saved)
        # config.pickle/txt every epoch (reference :449-455); last_epoch
        # stays pinned to the epoch of the on-disk latest weights
        ckpt.save_meta(config, history, last_saved)
        if config.test_code:
            break

    ckpt.wait_for_orbax()  # commit any in-flight async save
    return state, history
