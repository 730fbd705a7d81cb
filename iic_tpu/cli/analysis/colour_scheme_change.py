"""Analysis: re-colour saved prediction renders with a different palette.
Mirror of code/scripts/cluster/analysis/colour_scheme_change.py."""

import argparse
import glob
import os

import numpy as np


def main(argv=None):
    from PIL import Image
    from iic_tpu.utils.render import _palette

    parser = argparse.ArgumentParser()
    parser.add_argument("--in_dir", type=str, required=True)
    parser.add_argument("--out_dir", type=str, required=True)
    parser.add_argument("--num_classes", type=int, required=True)
    parser.add_argument("--rotate", type=int, default=1,
                        help="rotate palette by this many hues")
    args = parser.parse_args(argv)

    os.makedirs(args.out_dir, exist_ok=True)
    old = _palette(args.num_classes)
    new = np.roll(old, args.rotate, axis=0)
    for path in glob.glob(os.path.join(args.in_dir, "*.png")):
        img = np.array(Image.open(path).convert("RGB"))
        out = img.copy()
        for c in range(args.num_classes):
            sel = (img == old[c]).all(axis=-1)
            out[sel] = new[c]
        Image.fromarray(out).save(
            os.path.join(args.out_dir, os.path.basename(path)))
    print(f"recoloured renders written to {args.out_dir}")


if __name__ == "__main__":
    main()
