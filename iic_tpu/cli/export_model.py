"""CLI: export a trained run as a servable StableHLO predictor.

A TPU-native serving addition beyond the reference (which has no
deployable inference path). Loads the run's best checkpoint + match,
builds the fused preprocessing+forward+match predictor, and serializes
it with jax.export (symbolic batch dim by default).

  python -m iic_tpu.cli.export_model --out_root out --model_ind 640 \
      --dest model.stablehlo [--raw_sz 32] [--raw_channels 3] [--fixed_batch 64]
"""

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out_root", required=True)
    p.add_argument("--model_ind", type=int, required=True)
    p.add_argument("--dest", required=True)
    p.add_argument("--which", default="best", choices=["best", "latest"])
    p.add_argument("--raw_sz", type=int, default=0,
                   help="raw input H=W (default: the run's pre-crop size)")
    p.add_argument("--raw_channels", type=int, default=0,
                   help="raw input channels (default from the run config)")
    p.add_argument("--fixed_batch", type=int, default=0,
                   help="export a fixed batch size instead of symbolic")
    args = p.parse_args(argv)

    from iic_tpu import infer

    config, net, variables, stats = infer.load_run(
        args.out_root, args.model_ind, name=args.which)

    is_seg = "Segmentation" in config.arch
    if is_seg:
        predict = infer.make_seg_predictor(config, net, variables, stats)
        sz = args.raw_sz or config.input_sz
        c = args.raw_channels or (4 if config.using_IR else 3)
    else:
        predict = infer.make_cluster_predictor(config, net, variables,
                                               stats)
        sz = args.raw_sz or getattr(config, "rand_crop_sz", 0) \
            or config.input_sz
        c = args.raw_channels or (1 if config.in_channels in (1, 2) else 3)

    b = args.fixed_batch or 1
    example = np.zeros((b, sz, sz, c), np.uint8)
    infer.export_predictor(predict, example, path=args.dest,
                           symbolic_batch=not args.fixed_batch)
    print(f"exported {'seg' if is_seg else 'cluster'} predictor "
          f"(input ({'b' if not args.fixed_batch else b}, {sz}, {sz}, {c}) "
          f"uint8) -> {args.dest}")


if __name__ == "__main__":
    main()
