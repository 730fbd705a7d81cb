"""Prove the paper-parity harness's LAUNCH path end-to-end (round-4
verdict item 2): `tools/paper_parity.py run` must assemble each row's
trainer argv, gate on the dataset-layout check, stream the trainer's
stdout to <out_root>/<model_ind>.out, and `report` must read the
produced run history — all exercised as real subprocesses against
synthetic datasets written in the exact on-disk formats the readers
expect (MNIST idx, STL10 .bin, COCO-164k jpg/png tree + curated lists +
fine_to_coarse pickle, Potsdam .mat tiles + split lists).

The day the real datasets mount, the same code path reproduces the
BASELINE.md rows (reference flow: examples/commands.txt:18-89); this
test guarantees a typo in the argv assembly or log plumbing cannot
survive until that day. Rows cover all three trainer modules and all
five reference dataset formats: cluster_greyscale_twohead (mnist idx),
cluster_sobel_twohead (stl10 .bin incl. mix_train, cifar10/cifar20
pickle batches), segmentation_twohead (coco3 jpg/png tree, potsdam3
.mat tiles driving the no-sobel RGBIR path)."""

import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

from test_lazy_readers import _make_mnist, _make_stl10

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
HARNESS = os.path.join(REPO, "tools", "paper_parity.py")
sys.path.insert(0, os.path.join(REPO, "tools"))

import paper_parity  # noqa: E402


# ------------------------------------------------------- fixture datasets

def _make_cifar10(root, n_per_batch=10, n_test=10, seed=0):
    """cifar-10-batches-py/ pickle batches (data (N,3072) u8 + labels)."""
    rng = np.random.RandomState(seed)
    base = os.path.join(root, "cifar-10-batches-py")
    os.makedirs(base, exist_ok=True)
    names = [f"data_batch_{i}" for i in range(1, 6)] + ["test_batch"]
    for name in names:
        n = n_test if name == "test_batch" else n_per_batch
        d = {"data": rng.randint(0, 256, (n, 3072), np.uint8),
             "labels": rng.randint(0, 10, n).tolist()}
        with open(os.path.join(base, name), "wb") as f:
            pickle.dump(d, f)


def _make_cifar20(root, n_train=40, n_test=12, seed=0):
    """cifar-100-python/{train,test} pickles with fine_labels."""
    rng = np.random.RandomState(seed)
    base = os.path.join(root, "cifar-100-python")
    os.makedirs(base, exist_ok=True)
    for name, n in (("train", n_train), ("test", n_test)):
        d = {"data": rng.randint(0, 256, (n, 3072), np.uint8),
             "fine_labels": rng.randint(0, 100, n).tolist()}
        with open(os.path.join(base, name), "wb") as f:
            pickle.dump(d, f)

def _make_coco164k_curated(root, n_train=6, n_val=4, sz=192, seed=0):
    """Tiny Coco164kCuratedFew tree: images/<split>/*.jpg,
    annotations/<split>/*.png (fine labels, 255 = unlabelled), curated
    id lists, and a fine->coarse pickle whose fine ids 21/22/23 map to
    ground/plant/sky-stuff so the Few filter keeps most pixels."""
    import cv2

    rng = np.random.RandomState(seed)
    fine_to_coarse = {f: f % 27 for f in range(182)}
    with open(os.path.join(root, "fine_to_coarse_dict.pickle"), "wb") as f:
        pickle.dump({"fine_index_to_coarse_index": fine_to_coarse}, f)
    for split, n in (("train2017", n_train), ("val2017", n_val)):
        for sub in ("images", "annotations"):
            os.makedirs(os.path.join(root, sub, split), exist_ok=True)
        os.makedirs(os.path.join(root, "curated", split), exist_ok=True)
        ids = [f"{split}_{i:06d}" for i in range(n)]
        for image_id in ids:
            img = rng.randint(0, 256, (sz, sz, 3), np.uint8)
            assert cv2.imwrite(
                os.path.join(root, "images", split, image_id + ".jpg"), img)
            # mostly relevant fine labels (21=ground 22=plant 23=sky under
            # the identity-mod-27 map), sprinkled 255 = unlabelled
            label = rng.choice([21, 22, 23], (sz, sz)).astype(np.uint8)
            label[rng.random((sz, sz)) < 0.05] = 255
            assert cv2.imwrite(
                os.path.join(root, "annotations", split, image_id + ".png"),
                label)
        with open(os.path.join(root, "curated", split,
                               "Coco164kFew_Stuff_6.txt"), "w") as f:
            f.write("\n".join(ids) + "\n")


def _make_potsdam(root, n_unlab=6, n_lab_train=4, n_lab_test=4, seed=0):
    """Potsdam layout: imgs/<id>.mat {"img": uint8 (200,200,4) RGBIR},
    gt/<id>.mat {"gt"} for labelled ids, and the three split lists."""
    import scipy.io as sio

    rng = np.random.RandomState(seed)
    for sub in ("imgs", "gt"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    splits = {"unlabelled_train": [f"u{i}" for i in range(n_unlab)],
              "labelled_train": [f"lt{i}" for i in range(n_lab_train)],
              "labelled_test": [f"le{i}" for i in range(n_lab_test)]}
    for split, ids in splits.items():
        for image_id in ids:
            sio.savemat(os.path.join(root, "imgs", image_id + ".mat"),
                        {"img": rng.randint(0, 256, (200, 200, 4),
                                            np.uint8)})
            if split != "unlabelled_train":
                sio.savemat(os.path.join(root, "gt", image_id + ".mat"),
                            {"gt": rng.randint(0, 6, (200, 200),
                                               np.int32)})
        with open(os.path.join(root, split + ".txt"), "w") as f:
            f.write("\n".join(ids) + "\n")


def _make_all(root):
    _make_mnist(root, n_train=60, n_test=20)
    _make_stl10(root, n_train=12, n_test=8, n_unlab=30)
    _make_cifar10(root)
    _make_cifar20(root)
    _make_coco164k_curated(root)
    _make_potsdam(root)


# ------------------------------------------------------------- the proof

def _env():
    env = dict(os.environ)
    env["IIC_TPU_PLATFORM"] = "cpu"  # deterministic, chip-independent
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform"))
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(HERE, ".jax_cache")
    return env


# (row key, row-specific trainer overrides appended after `--`; shapes
# shrunk so the CPU subprocess compiles in seconds — the launch path
# under test is identical at paper scale)
RUN_ROWS = [
    ("mnist", ["--batch_sz", "20"]),
    ("stl10", ["--batch_sz", "20", "--rand_crop_sz", "32",
               "--input_sz", "32"]),
    ("cifar10", ["--batch_sz", "18"]),   # row has num_dataloaders 3
    ("cifar20", ["--batch_sz", "20"]),
    ("coco3", ["--batch_sz", "8", "--input_sz", "64"]),
    ("potsdam3", ["--batch_sz", "8", "--input_sz", "64"]),
]


@pytest.mark.slow
def test_run_and_report_end_to_end(tmp_path):
    data_root = tmp_path / "data"
    out_root = tmp_path / "out"
    data_root.mkdir()
    _make_all(str(data_root))
    env = _env()

    for key, overrides in RUN_ROWS:
        row = paper_parity.ROW_MAP[key]
        argv = [sys.executable, HARNESS, "run",
                "--dataset_root", str(data_root),
                "--out_root", str(out_root), "--rows", key,
                # num_epochs 2 = pre-eval + ONE training epoch (the epoch
                # loop spans 1..num_epochs-1, reference structure);
                # --test_code caps it at 2 batches regardless
                "--", "--test_code", "--num_epochs", "2"] + overrides
        proc = subprocess.run(argv, env=env, capture_output=True,
                              text=True, timeout=1800)
        log_p = out_root / f"{row.model_ind}.out"
        assert proc.returncode == 0, (
            f"{key}: harness rc={proc.returncode}\n--- harness out:\n"
            f"{proc.stdout[-2000:]}\n--- trainer log tail:\n"
            + (log_p.read_text()[-3000:] if log_p.exists() else "<none>"))
        # log streaming: the trainer's stdout landed in <model_ind>.out
        assert log_p.exists() and log_p.stat().st_size > 0
        # run dir with the config-as-db history the report reads
        assert (out_root / str(row.model_ind) / "config.pickle").exists()

    proc = subprocess.run(
        [sys.executable, HARNESS, "report", "--out_root", str(out_root),
         "--rows"] + [k for k, _ in RUN_ROWS],
        env=env, capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    out = proc.stdout
    assert "no run at" not in out
    for key, _ in RUN_ROWS:
        row = paper_parity.ROW_MAP[key]
        (line,) = [ln for ln in out.splitlines()
                   if ln.startswith(key + " ")]
        # a real accuracy was parsed out of the run history
        assert str(row.model_ind) in line
        best = float(line.split()[3])
        assert 0.0 <= best <= 1.0
        assert "baseline" in line or "PARITY" in line


@pytest.mark.slow
def test_run_refuses_missing_dataset(tmp_path):
    """The check gate: `run` against an empty root must refuse to launch
    (rc 1, no out dirs) instead of crashing mid-train."""
    data_root = tmp_path / "empty"
    out_root = tmp_path / "out"
    data_root.mkdir()
    proc = subprocess.run(
        [sys.executable, HARNESS, "run", "--dataset_root", str(data_root),
         "--out_root", str(out_root), "--rows", "mnist", "coco3"],
        env=_env(), capture_output=True, text=True, timeout=300)
    assert proc.returncode == 1
    assert "dataset check FAILED" in proc.stdout
    assert not (out_root / "685").exists()
    assert not (out_root / "555").exists()
