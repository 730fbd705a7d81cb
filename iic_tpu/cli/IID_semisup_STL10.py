"""CLI: semi-supervised finetune of a pretrained IID+ run. Mirror of
code/scripts/semisup/IID_semisup_STL10.py (examples/commands.txt:45)."""

import argparse
import dataclasses

from iic_tpu.train.config import SemisupConfig
from iic_tpu.train.semisup_trainer import train_semisup


def main(argv=None):
    parser = argparse.ArgumentParser()
    for f in dataclasses.fields(SemisupConfig):
        name = "--" + f.name
        if isinstance(f.default, bool):
            parser.add_argument(name, action="store_true", default=f.default)
        elif isinstance(f.default, tuple):
            parser.add_argument(name, type=int, nargs="+",
                                default=list(f.default))
        elif f.default is None:
            parser.add_argument(name, type=int, default=None)
        else:
            parser.add_argument(name, type=type(f.default),
                                default=f.default)
    args = parser.parse_args(argv)
    cfg = SemisupConfig()
    for f in dataclasses.fields(SemisupConfig):
        v = getattr(args, f.name)
        setattr(cfg, f.name, tuple(v) if isinstance(v, list) else v)
    cfg.finalize()
    return train_semisup(cfg)


if __name__ == "__main__":
    main()
