"""Host-side dataset readers (no torchvision dependency).

Parse the standard on-disk formats the reference consumes through
torchvision (code/utils/cluster/data.py:30-72): MNIST idx, CIFAR-10/100
python pickles, STL10 binaries. Every reader returns
``{"images": uint8 (N, H, W, C), "labels": int32 (N,)}`` with label -1 for
unlabelled samples. A clusterable synthetic generator stands in when the
real files are absent (this container has no dataset downloads)."""

import gzip
import os
import pickle

import numpy as np

# CIFAR-100 fine -> coarse (CIFAR20) mapping, identical to the reference's
# ``_cifar100_to_cifar20`` dict (code/utils/cluster/data.py:393-497), which
# is CIFAR-100's own published coarse-label hierarchy.
CIFAR100_TO_CIFAR20 = np.array([
    4, 1, 14, 8, 0, 6, 7, 7, 18, 3, 3, 14, 9, 18, 7, 11, 3, 9, 7, 11,
    6, 11, 5, 10, 7, 6, 13, 15, 3, 15, 0, 11, 1, 10, 12, 14, 16, 9, 11, 5,
    5, 19, 8, 8, 15, 13, 14, 17, 18, 10, 16, 4, 17, 4, 2, 0, 17, 4, 18, 17,
    10, 3, 2, 12, 12, 16, 12, 1, 9, 19, 2, 10, 0, 1, 16, 12, 9, 13, 15, 13,
    16, 19, 2, 4, 6, 19, 5, 5, 8, 19, 18, 1, 2, 15, 6, 0, 17, 8, 14, 13,
], dtype=np.int32)


def _find(root, *candidates):
    for c in candidates:
        p = os.path.join(root, c)
        if os.path.exists(p):
            return p
    return None


def _read_idx(path):
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        data = f.read()
    magic = int.from_bytes(data[0:4], "big")
    ndim = magic & 0xFF
    dims = [int.from_bytes(data[4 + 4 * i: 8 + 4 * i], "big")
            for i in range(ndim)]
    arr = np.frombuffer(data, dtype=np.uint8, offset=4 + 4 * ndim)
    return arr.reshape(dims)


class LazyBinaryArray:
    """Memmap-backed decode-on-demand view over the binary built-in
    dataset formats (MNIST idx rasters, STL10 column-major .bin): holds
    ``np.memmap`` parts plus a per-batch layout ``transform``, so no
    loader or eval path requires whole-set host residency — pages stream
    from disk per accessed batch. Same array protocol as
    ``LazyImageArray`` (len/shape/dtype, int/slice/fancy/bool-mask
    ``__getitem__`` returning materialised uint8 numpy, lazy
    ``.select``, and ``np.asarray`` for the explicit resident path)."""

    dtype = np.dtype(np.uint8)

    def __init__(self, parts, transform, item_shape, idx=None):
        self.parts = list(parts)
        lens = [len(p) for p in self.parts]
        self._starts = np.cumsum([0] + lens)
        self.idx = (np.arange(self._starts[-1], dtype=np.int64)
                    if idx is None else np.asarray(idx, np.int64))
        self.transform = transform
        self.item_shape = tuple(int(s) for s in item_shape)

    @property
    def shape(self):
        return (len(self.idx),) + self.item_shape

    def __len__(self):
        return len(self.idx)

    @staticmethod
    def _as_index_list(idx):
        arr = np.asarray(idx)
        if arr.dtype == bool:  # boolean mask, not 0/1 integer indices
            arr = np.flatnonzero(arr)
        return arr.reshape(-1)

    def _materialise(self, gidx):
        raw_shape = self.parts[0].shape[1:]
        if len(gidx) == 0:
            return np.zeros((0,) + self.item_shape, np.uint8)
        part_of = np.searchsorted(self._starts, gidx, side="right") - 1
        raw = np.empty((len(gidx),) + raw_shape, np.uint8)
        # One vectorised memmap gather per part (not per item): the
        # common cases — a whole batch from one part, or a resident
        # stage over train+unlabeled — become a handful of numpy calls.
        for pi in np.unique(part_of):
            sel = part_of == pi
            raw[sel] = self.parts[pi][gidx[sel] - self._starts[pi]]
        return np.ascontiguousarray(self.transform(raw))

    def __getitem__(self, idx):
        if isinstance(idx, (int, np.integer)):
            return self._materialise(self.idx[idx:][:1])[0]
        if isinstance(idx, slice):
            return self._materialise(self.idx[idx])
        return self._materialise(self.idx[self._as_index_list(idx)])

    def select(self, idx):
        """Lazy re-index (truncation / reorder) — no page reads."""
        return LazyBinaryArray(self.parts, self.transform, self.item_shape,
                               idx=self.idx[self._as_index_list(idx)])

    def __array__(self, dtype=None, copy=None):
        out = self._materialise(self.idx)
        return out.astype(dtype) if dtype is not None else out


def _memmap_idx(path):
    """np.memmap over an (uncompressed) idx file's raster payload."""
    with open(path, "rb") as f:
        head = f.read(4)
        ndim = int.from_bytes(head, "big") & 0xFF
        dims = [int.from_bytes(f.read(4), "big") for _ in range(ndim)]
    return np.memmap(path, dtype=np.uint8, mode="r",
                     offset=4 + 4 * ndim, shape=tuple(dims))


def load_mnist(root, train=True, lazy=False):
    """MNIST idx files (raw or .gz), under root or root/raw. ``lazy``
    memory-maps uncompressed idx rasters (decode-on-demand,
    ``LazyBinaryArray``); .gz files fall back to the eager decode."""
    prefix = "train" if train else "t10k"
    for sub in ("", "raw", "MNIST/raw"):
        base = os.path.join(root, sub)
        imgs_p = _find(base, f"{prefix}-images-idx3-ubyte",
                       f"{prefix}-images-idx3-ubyte.gz")
        lbls_p = _find(base, f"{prefix}-labels-idx1-ubyte",
                       f"{prefix}-labels-idx1-ubyte.gz")
        if imgs_p and lbls_p:
            labels = _read_idx(lbls_p).astype(np.int32)
            if lazy and not imgs_p.endswith(".gz"):
                mm = _memmap_idx(imgs_p)
                images = LazyBinaryArray(
                    [mm], lambda x: x[..., None], mm.shape[1:] + (1,))
            else:
                images = _read_idx(imgs_p)[..., None]  # (N, 28, 28, 1)
            return {"images": images, "labels": labels}
    raise FileNotFoundError(f"MNIST idx files not found under {root}")


def _load_cifar_batch(path):
    with open(path, "rb") as f:
        d = pickle.load(f, encoding="latin1")
    imgs = d["data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    return imgs, d


def load_cifar10(root, train=True):
    base = _find(root, "cifar-10-batches-py", "")
    if base is None or not os.path.isdir(base):
        raise FileNotFoundError(f"CIFAR-10 not found under {root}")
    if train:
        imgs_list, lbls = [], []
        for i in range(1, 6):
            p = os.path.join(base, f"data_batch_{i}")
            imgs, d = _load_cifar_batch(p)
            imgs_list.append(imgs)
            lbls += d["labels"]
        return {"images": np.concatenate(imgs_list),
                "labels": np.array(lbls, np.int32)}
    imgs, d = _load_cifar_batch(os.path.join(base, "test_batch"))
    return {"images": imgs, "labels": np.array(d["labels"], np.int32)}


def load_cifar100(root, train=True, coarse=False):
    base = _find(root, "cifar-100-python", "")
    if base is None or not os.path.isdir(base):
        raise FileNotFoundError(f"CIFAR-100 not found under {root}")
    split = "train" if train else "test"
    imgs, d = _load_cifar_batch(os.path.join(base, split))
    fine = np.array(d["fine_labels"], np.int32)
    labels = CIFAR100_TO_CIFAR20[fine] if coarse else fine
    return {"images": imgs, "labels": labels}


def load_cifar20(root, train=True):
    """CIFAR100 with the fine->coarse remap applied as target transform
    (reference code/utils/cluster/data.py:36-37)."""
    return load_cifar100(root, train=train, coarse=True)


def _read_stl_bin(path):
    arr = np.fromfile(path, dtype=np.uint8)
    # column-major 96x96x3 per image per STL10 spec
    n = arr.size // (3 * 96 * 96)
    imgs = arr.reshape(n, 3, 96, 96).transpose(0, 3, 2, 1)  # (N, H, W, C)
    return imgs


def _memmap_stl_bin(path):
    n = os.path.getsize(path) // (3 * 96 * 96)
    return np.memmap(path, dtype=np.uint8, mode="r", shape=(n, 3, 96, 96))


_STL_TO_NHWC = (0, 3, 2, 1)  # column-major 96x96x3 per the STL10 spec


def load_stl10(root, split="train", lazy=False):
    """STL10 binary splits. ``lazy`` memory-maps the .bin files
    (decode-on-demand ``LazyBinaryArray``; the 2.6 GB unlabeled split then
    streams through the loaders page by page instead of residing in host
    RAM — train+unlabeled is a lazy two-part concat)."""
    base = _find(root, "stl10_binary", "")
    if base is None or not os.path.isdir(base):
        raise FileNotFoundError(f"STL10 not found under {root}")

    def part_labels(part, n):
        lbl_path = os.path.join(base, f"{part}_y.bin")
        if os.path.exists(lbl_path):
            return np.fromfile(lbl_path, dtype=np.uint8).astype(np.int32) - 1
        return np.full(n, -1, np.int32)

    parts = {"train": ["train"], "test": ["test"],
             "unlabeled": ["unlabeled"],
             "train+unlabeled": ["train", "unlabeled"]}.get(split)
    if parts is None:
        raise ValueError(split)

    if lazy:
        mms = [_memmap_stl_bin(os.path.join(base, f"{p}_X.bin"))
               for p in parts]
        images = LazyBinaryArray(
            mms, lambda x: x.transpose(_STL_TO_NHWC), (96, 96, 3))
        labels = np.concatenate(
            [part_labels(p, len(mm)) for p, mm in zip(parts, mms)])
    else:
        imgs = [_read_stl_bin(os.path.join(base, f"{p}_X.bin"))
                for p in parts]
        labels = np.concatenate(
            [part_labels(p, len(im)) for p, im in zip(parts, imgs)])
        images = imgs[0] if len(imgs) == 1 else np.concatenate(imgs)
    return {"images": images, "labels": labels}


_IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".ppm", ".webp")


class LazyImageArray:
    """Decode-on-demand view of an ImageFolder stack: holds file PATHS (not
    pixels) and decodes per access, so image-folder datasets larger than
    host RAM stream through the loaders batch by batch (``--lazy_images``;
    the decode for batch i+1 runs on the loaders' prefetch thread while the
    device works on batch i). Mimics the eager (n, h, w, 3) uint8 array for
    every pipeline access pattern: ``len()``, ``.shape``/``.dtype``,
    int / slice / fancy-index ``__getitem__`` (returns DECODED uint8 numpy),
    ``np.asarray``/``np.ascontiguousarray`` (materialises the whole stack —
    the resident-HBM path), and ``.select(idx)`` — a still-lazy reordered /
    truncated view used by ``truncate_pc``."""

    dtype = np.dtype(np.uint8)

    def __init__(self, paths, target_hw):
        self.paths = list(paths)
        self.target_hw = (int(target_hw[0]), int(target_hw[1]))

    @property
    def shape(self):
        return (len(self.paths),) + self.target_hw + (3,)

    def __len__(self):
        return len(self.paths)

    def _decode(self, path):
        import cv2

        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is not None:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        else:
            # cv2-undecodable but PIL-openable (the scan kept it): decode
            # via PIL with the same EXIF-orientation semantics cv2 applies,
            # instead of raising mid-epoch.
            img = _pil_decode_rgb(path)
            if img is None:
                raise IOError(f"undecodable image: {path}")
        if img.shape[:2] != self.target_hw:
            img = cv2.resize(img, (self.target_hw[1], self.target_hw[0]),
                             interpolation=cv2.INTER_LINEAR)
        return img

    @staticmethod
    def _as_index_list(idx):
        arr = np.asarray(idx)
        if arr.dtype == bool:  # boolean mask, not 0/1 integer indices
            arr = np.flatnonzero(arr)
        return arr.reshape(-1)

    def __getitem__(self, idx):
        if isinstance(idx, (int, np.integer)):
            return self._decode(self.paths[idx])
        if isinstance(idx, slice):
            paths = self.paths[idx]
        else:
            paths = [self.paths[int(i)] for i in self._as_index_list(idx)]
        if not paths:
            return np.zeros((0,) + self.target_hw + (3,), np.uint8)
        return np.stack([self._decode(p) for p in paths])

    def select(self, idx):
        """Lazy re-index (truncation / reorder) — no decode."""
        return LazyImageArray(
            [self.paths[int(i)] for i in self._as_index_list(idx)],
            self.target_hw)

    def __array__(self, dtype=None, copy=None):
        out = self[np.arange(len(self.paths))]
        return out.astype(dtype) if dtype is not None else out


def _scan_image_folder(root, subdir):
    """(sorted class names, per-file paths, int32 labels) — the shared
    directory scan of the eager and lazy ImageFolder loaders (torchvision
    convention: one class per subfolder, both levels sorted)."""
    base = os.path.join(root, subdir) if subdir else root
    if not os.path.isdir(base):
        raise FileNotFoundError(base)
    classes = sorted(d for d in os.listdir(base)
                     if os.path.isdir(os.path.join(base, d)))
    if not classes:
        raise FileNotFoundError(f"no class subfolders under {base}")
    paths, labels = [], []
    for ci, cname in enumerate(classes):
        cdir = os.path.join(base, cname)
        for fname in sorted(os.listdir(cdir)):
            if fname.lower().endswith(_IMG_EXTS):
                paths.append(os.path.join(cdir, fname))
                labels.append(ci)
    if not paths:
        raise FileNotFoundError(f"no images under {base}")
    return classes, paths, np.array(labels, np.int32)


def _pil_decode_rgb(path):
    """PIL decode -> RGB uint8 (h, w, 3), applying EXIF orientation like
    cv2.imread does. None when PIL can't decode either."""
    try:
        from PIL import Image, ImageOps

        with Image.open(path) as im:
            im = ImageOps.exif_transpose(im)
            return np.asarray(im.convert("RGB"))
    except Exception:
        return None


# EXIF Orientation values 5-8 rotate the raster by 90/270 degrees, so the
# decoded image's (h, w) is the header size transposed.
_EXIF_ORIENTATION_TAG = 0x0112
_EXIF_TRANSPOSED = (5, 6, 7, 8)


def load_image_folder_lazy(root, subdir):
    """Lazy twin of ``load_image_folder``: probes each file's (h, w) from
    its header only (PIL ``Image.open`` reads no pixel data), picks the
    modal shape exactly like the eager loader, and returns a
    ``LazyImageArray`` that decodes on access. The probe accounts for EXIF
    orientation (cv2.imread auto-rotates, so orientations 5-8 swap the
    decoded h/w vs the header size). Unreadable files are dropped at scan
    time, as closely as a header probe can match the eager loader's
    cv2-decode keep decision; a PIL-openable file whose pixels cv2 can't
    decode falls back to a PIL decode at access time (never raises for a
    file both libraries reject only at pixel level)."""
    from PIL import Image

    _, paths, labels = _scan_image_folder(root, subdir)
    shapes, keep = [], []
    for i, p in enumerate(paths):
        try:
            with Image.open(p) as im:
                w, h = im.size
                try:
                    orientation = im.getexif().get(_EXIF_ORIENTATION_TAG)
                except Exception:
                    orientation = None
                if orientation in _EXIF_TRANSPOSED:
                    h, w = w, h
        except Exception:
            continue
        shapes.append((h, w))
        keep.append(i)
    if not keep:
        raise FileNotFoundError(f"no decodable images under "
                                f"{os.path.join(root, subdir or '')}")
    modal = max(set(shapes), key=shapes.count)
    return {"images": LazyImageArray([paths[i] for i in keep], modal),
            "labels": labels[keep]}


def load_image_folder(root, subdir):
    """torchvision ImageFolder equivalent (reference
    code/utils/cluster/data.py:530-564 feeds ImageFolder(root/train) into
    ``create_basic_clustering_dataloaders``): one class per subfolder of
    ``root/subdir``, classes sorted alphabetically, files sorted within each
    class. Decodes via cv2 (BGR->RGB). Images of mixed sizes are resized
    (bilinear) to the modal (h, w) so the batch stacks — the on-device tf1/
    tf2 crops then sample from that common frame."""
    import cv2

    _, paths, all_labels = _scan_image_folder(root, subdir)
    imgs, labels = [], []
    for p, lab in zip(paths, all_labels):
        img = cv2.imread(p, cv2.IMREAD_COLOR)
        if img is not None:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        else:
            # keep-decision parity with the lazy loader: fall back to PIL
            # before dropping, so both loaders keep the same file set
            # except for the (pathological) cv2-decodable-but-PIL-
            # unopenable case.
            img = _pil_decode_rgb(p)
            if img is None:
                continue
        imgs.append(img)
        labels.append(lab)
    if not imgs:
        raise FileNotFoundError(f"no decodable images under "
                                f"{os.path.join(root, subdir or '')}")

    shapes = [im.shape[:2] for im in imgs]
    if len(set(shapes)) > 1:
        # mode over full (h, w) tuples — per-axis modes can combine into a
        # shape no image has
        modal = max(set(shapes), key=shapes.count)
        imgs = [im if im.shape[:2] == modal else
                cv2.resize(im, (modal[1], modal[0]),
                           interpolation=cv2.INTER_LINEAR)
                for im in imgs]
    return {"images": np.stack(imgs),
            "labels": np.array(labels, np.int32)}


def load_digits_sklearn(train=True, upscale=3):
    """Real handwritten digits bundled with scikit-learn (UCI optical
    digits test fold: 1797 images, 8x8, 10 classes) — the only real image
    dataset available offline in this environment, used for real-data
    accuracy evidence where MNIST (reference commands.txt:30) cannot be
    downloaded. Nearest-upsampled x``upscale`` (8 -> 24 by default) so the
    paper's MNIST-style crop/rotate configs apply unchanged. Deterministic
    split: first 1500 train / last 297 test (the IID partition tables
    concatenate both, i.e. training and mapping use all 1797 like the
    paper's full-MNIST protocol)."""
    from sklearn.datasets import load_digits
    d = load_digits()
    imgs = np.round(d.images * (255.0 / 16.0)).astype(np.uint8)
    imgs = np.repeat(np.repeat(imgs, upscale, axis=1), upscale, axis=2)
    imgs = imgs[..., None]  # (N, 8*u, 8*u, 1)
    labels = d.target.astype(np.int32)
    sl = slice(0, 1500) if train else slice(1500, None)
    return {"images": imgs[sl], "labels": labels[sl]}


def load_digits_nuisance(train=True, canvas=32, upscale=3, seed=0):
    """Real digits with STRONG static per-image nuisance baked into the
    dataset: each (upscaled, 24x24) digit is rotated uniformly in +-30 deg,
    contrast-scaled by [0.5, 1] and placed at a uniformly random offset in
    a ``canvas`` x ``canvas`` frame (one fixed draw per image — the
    dataset is deterministic). Probe for semisup trunk quality
    (VERDICT r2 #8): the nuisance family is exactly what the paper's
    MNIST tf2 marginalises over (random crops + rotation,
    examples/commands.txt:30), so an IIC-pretrained trunk learns
    nuisance-invariant digit features, while a FROZEN RANDOM trunk's
    spatially-flattened features entangle position/rotation/contrast with
    class and a small-label probe on them fails — unlike plain centred
    Digits, where random features are nearly linearly separable
    (VALIDATION.md round-2 table)."""
    import cv2
    base = load_digits_sklearn(train=train, upscale=upscale)
    imgs, labels = base["images"], base["labels"]
    rng = np.random.default_rng(seed if train else seed + 1)
    d = imgs.shape[1]
    assert canvas >= d, (canvas, d)
    m = canvas - d
    out = np.zeros((len(imgs), canvas, canvas, 1), np.uint8)
    for i, im in enumerate(imgs):
        ang = float(rng.uniform(-30.0, 30.0))
        contrast = float(rng.uniform(0.5, 1.0))
        y, x = (int(v) for v in rng.integers(0, m + 1, 2))
        mat = cv2.getRotationMatrix2D((d / 2.0, d / 2.0), ang, 1.0)
        rot = cv2.warpAffine(im[:, :, 0].astype(np.float32), mat, (d, d))
        out[i, y:y + d, x:x + d, 0] = np.clip(
            rot * contrast, 0, 255).astype(np.uint8)
    return {"images": out, "labels": labels}


def reorder_train_deterministic_ids(n_train=5000, per=20):
    """STL10 mix_train interleave: first 5k spread one-every-20 through the
    100k unlabelled (reference code/utils/cluster/general.py:26-45)."""
    ids = []
    for i in range(n_train):
        ids.append(i)
        ids.extend(range(n_train + i * per, n_train + (i + 1) * per))
    return np.array(ids, dtype=np.int64)


def make_synthetic(n, num_classes, sz, channels, seed=0, noise=0.35):
    """Clusterable synthetic images: each class is a distinct smooth spatial
    pattern plus noise — unsupervised MI training on these actually
    converges, so smoke runs exercise the whole stack meaningfully."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:sz, 0:sz].astype(np.float32) / sz
    patterns = []
    for c in range(num_classes):
        fx = 1 + (c % 4)
        fy = 1 + (c // 4)
        phase = c * 0.7
        base = 0.5 + 0.5 * np.sin(2 * np.pi * fx * xx + phase) * \
            np.cos(2 * np.pi * fy * yy + 0.3 * phase)
        patterns.append(base)
    patterns = np.stack(patterns)  # (K, sz, sz)

    labels = rng.integers(0, num_classes, n).astype(np.int32)
    imgs = patterns[labels][..., None]  # (N, sz, sz, 1)
    imgs = np.repeat(imgs, channels, axis=-1)
    imgs = imgs + noise * rng.standard_normal(imgs.shape).astype(np.float32)
    imgs = np.clip(imgs, 0, 1)
    return {"images": (imgs * 255).astype(np.uint8), "labels": labels}


DATASET_LOADERS = {
    "MNIST": lambda root, part: load_mnist(root, train=part),
    "CIFAR10": lambda root, part: load_cifar10(root, train=part),
    "CIFAR100": lambda root, part: load_cifar100(root, train=part),
    "CIFAR20": lambda root, part: load_cifar20(root, train=part),
    "STL10": lambda root, part: load_stl10(root, split=part),
    "Digits": lambda root, part: load_digits_sklearn(train=part),
    "DigitsNuisance": lambda root, part: load_digits_nuisance(train=part),
}


def load_dataset(name, root, partition, lazy=False):
    """partition: bool (train/test) for MNIST/CIFAR, split string for STL10.
    name "Synthetic<K>x<SZ>x<C>[x<N>]" generates synthetic data (N = train
    set size, default 2048; test split is N//4). ``lazy`` (ImageFolder
    only): return a decode-on-demand ``LazyImageArray`` instead of the
    whole decoded stack — see ``load_image_folder_lazy``."""
    if name.startswith("Synthetic"):
        fields = [int(v) for v in name[len("Synthetic"):].split("x")]
        k, sz, c = fields[:3]
        n_train = fields[3] if len(fields) > 3 else 2048
        is_train = partition in (True, "train", "train+unlabeled")
        n = n_train if is_train else max(n_train // 4, k * 4)
        return make_synthetic(n, k, sz, c, seed=0 if is_train else 1)
    if name == "ImageFolder":
        sub = partition if isinstance(partition, str) else (
            "train" if partition else "test")
        return (load_image_folder_lazy(root, sub) if lazy
                else load_image_folder(root, sub))
    if name == "MNIST":
        return load_mnist(root, train=partition, lazy=lazy)
    if name == "STL10":
        return load_stl10(root, split=partition, lazy=lazy)
    # CIFAR is pickled (not memmap-able) and the Digits sets are tiny:
    # lazy requests fall back to the eager decode for them.
    return DATASET_LOADERS[name](root, partition)
