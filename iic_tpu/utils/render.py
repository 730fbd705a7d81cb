"""Rendering utilities.

Segmentation render (reference: code/utils/segmentation/render.py:11-149):
save images / relevancy masks / label maps / prediction maps / affine
matrices to PNG (label colour maps via a consistent palette).

MNIST progression rendering (reference: code/utils/cluster/render.py:
13-170): per-epoch convex-combination point cloud of soft predictions with
the fixed GT_TO_ORDER colour permutation, plus per-cluster average images.
"""

import os
from colorsys import hsv_to_rgb

import numpy as np

# consistent colour permutation for MNIST progression
# (code/utils/cluster/render.py:13)
GT_TO_ORDER = [2, 5, 3, 8, 6, 7, 0, 9, 1, 4]


def _palette(k):
    hues = np.linspace(0.0, 1.0, k + 1)[:-1]
    return np.array([(np.array(hsv_to_rgb(h, 0.8, 0.8)) * 255)
                     for h in hues], dtype=np.uint8)


def render(data, mode, name, colour_map=None, offset=0, out_dir=""):
    """Save data to ``out_dir/name[...].png``. Modes: image | image_ir |
    image_as_feat | mask | label | matrix | preds."""
    from PIL import Image

    data = np.asarray(data)
    if mode.startswith("image") or mode == "label":
        if data.ndim == 4:
            for i in range(data.shape[0]):
                render(data[i], mode, f"{name}_{i + offset}",
                       colour_map=colour_map, out_dir=out_dir)
            return
    else:
        if data.ndim == 3:
            for i in range(data.shape[0]):
                render(data[i], mode, f"{name}_{i + offset}",
                       colour_map=colour_map, out_dir=out_dir)
            return

    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    out_handle = os.path.join(out_dir, name)

    if mode == "image":
        img = np.transpose(data, (1, 2, 0))
        if img.shape[2] >= 3:
            img = img[:, :, :3]
        else:
            img = img[:, :, 0]
        Image.fromarray(
            (np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
                out_handle + ".png")
    elif mode == "image_ir":
        ir = data[-1]
        Image.fromarray(
            (np.clip(ir, 0, 1) * 255).astype(np.uint8)).save(
                out_handle + "_ir.png")
    elif mode == "image_as_feat":
        # render each channel of a feature/heat map
        for c in range(data.shape[0]):
            ch = data[c]
            rng_ = ch.max() - ch.min()
            norm = (ch - ch.min()) / (rng_ + 1e-8)
            Image.fromarray((norm * 255).astype(np.uint8)).save(
                f"{out_handle}_c{c}.png")
    elif mode == "mask":
        Image.fromarray(
            (data.astype(np.float32) * 255).astype(np.uint8)).save(
                out_handle + ".png")
    elif mode in ("label", "preds"):
        lab = data if data.ndim == 2 else data[0]
        k = int(lab.max()) + 1 if lab.size else 1
        cmap = colour_map if colour_map is not None else _palette(max(k, 1))
        rgb = np.zeros(lab.shape + (3,), np.uint8)
        for c in range(len(cmap)):
            rgb[lab == c] = cmap[c]
        rgb[lab < 0] = 0
        Image.fromarray(rgb).save(out_handle + ".png")
    elif mode == "matrix":
        with open(out_handle + ".txt", "w") as f:
            f.write(str(data))
    else:
        raise ValueError(mode)


def save_progress(config, apply_fn, mapping_assignment_dataloader,
                  mapping_test_dataloader, index, render_count=50,
                  out_dir=None):
    """MNIST progression point cloud (reference code/utils/cluster/
    render.py:16-170): soft predictions of the best sub-head, reordered by
    the Hungarian match, drawn as convex combinations of gt_k anchor points
    on a circle (colour via GT_TO_ORDER), plus per-cluster average images.
    """
    from PIL import Image

    from iic_tpu.evals.cluster_eval import get_assignment_data_matches

    out_dir = out_dir or os.path.join(config.out_root,
                                      str(config.model_ind), "progression")
    os.makedirs(out_dir, exist_ok=True)

    all_matches, train_accs = get_assignment_data_matches(
        config, apply_fn, mapping_assignment_dataloader)
    best_sub_head = int(np.argmax(train_accs))
    match = all_matches[best_sub_head]

    # soft predictions over the test set
    softs, targets, imgs_all = [], [], []
    for batch in mapping_test_dataloader:
        imgs, tgts = batch[0], batch[1]
        outs = np.asarray(apply_fn(imgs))  # (H, bn, k)
        softs.append(outs[best_sub_head])
        targets.append(np.asarray(tgts))
        imgs_all.append(np.asarray(imgs))
    soft_preds = np.concatenate(softs)
    targets = np.concatenate(targets)
    imgs_all = np.concatenate(imgs_all)

    k = config.gt_k
    reordered = np.zeros_like(soft_preds)
    for pred_i, target_i in match:
        order = GT_TO_ORDER[target_i] if k == 10 else target_i
        reordered[:, order] += soft_preds[:, pred_i]

    # anchor points on a circle, point = convex combination of anchors
    angles = np.linspace(0, 2 * np.pi, k, endpoint=False)
    anchors = np.stack([np.cos(angles), np.sin(angles)], axis=1)
    points = reordered @ anchors  # (N, 2)

    side = 400
    canvas = np.full((side, side, 3), 255, np.uint8)
    colours = _palette(k)
    coords = ((points + 1.1) / 2.2 * (side - 1)).astype(int)
    hard = reordered.argmax(axis=1)
    for (x, y), c in zip(coords, hard):
        canvas[np.clip(y, 0, side - 1), np.clip(x, 0, side - 1)] = \
            colours[c]
    Image.fromarray(canvas).save(
        os.path.join(out_dir, f"progression_{index:04d}.png"))

    # per-cluster average images
    for c in range(k):
        sel = hard == c
        if sel.sum() == 0:
            continue
        avg = imgs_all[sel].mean(axis=0)[0]  # grey channel
        Image.fromarray(
            (np.clip(avg, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(out_dir, f"avg_{index:04d}_cluster{c}.png"))
    return out_dir
