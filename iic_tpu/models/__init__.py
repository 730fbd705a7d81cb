"""Model registry: name -> constructor taking a config object, mirroring the
reference's ``archs.__dict__[config.arch](config)`` lookup
(code/archs/__init__.py:1-3). Config needs only the attributes each arch
reads (works with dataclasses, argparse Namespaces, SimpleNamespace)."""

from iic_tpu.models.cluster_nets import (
    ClusterNet5g, ClusterNet5gTrunk, ClusterNet5gTwoHead, ClusterNet6c,
    ClusterNet6cTrunk, ClusterNet6cTwoHead, TripletsNet)
from iic_tpu.models.segmentation_nets import (
    SegmentationNet10a, SegmentationNet10aTrunk, SegmentationNet10aTwoHead)
from iic_tpu.models.semisup import SupHead5Head
from iic_tpu.models.layers import (
    BatchNorm, MultiConvSoftmaxHead, MultiDenseHead)


def _build_common(config):
    import jax.numpy as jnp
    dtype = getattr(config, "model_dtype", "float32")
    if isinstance(dtype, str):
        dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype]
    return dict(
        batchnorm_track=getattr(config, "batchnorm_track", True),
        bn_axis_name=getattr(config, "bn_axis_name", None),
        dtype=dtype,
    )


def make_ClusterNet6c(config):
    return ClusterNet6c(
        output_k=config.output_k, num_sub_heads=config.num_sub_heads,
        input_sz=config.input_sz, **_build_common(config))


def make_ClusterNet6cTwoHead(config):
    return ClusterNet6cTwoHead(
        output_k_A=config.output_k_A, output_k_B=config.output_k_B,
        num_sub_heads=config.num_sub_heads, input_sz=config.input_sz,
        semisup=getattr(config, "semisup", False), **_build_common(config))


def make_ClusterNet5g(config):
    return ClusterNet5g(
        output_k=config.output_k, num_sub_heads=config.num_sub_heads,
        input_sz=config.input_sz, **_build_common(config))


def make_ClusterNet5gTwoHead(config):
    return ClusterNet5gTwoHead(
        output_k_A=config.output_k_A, output_k_B=config.output_k_B,
        num_sub_heads=config.num_sub_heads, input_sz=config.input_sz,
        semisup=getattr(config, "semisup", False), **_build_common(config))


def make_SegmentationNet10a(config):
    return SegmentationNet10a(
        output_k=config.output_k, num_sub_heads=config.num_sub_heads,
        input_sz=config.input_sz, **_build_common(config))


def make_SegmentationNet10aTwoHead(config):
    return SegmentationNet10aTwoHead(
        output_k_A=config.output_k_A, output_k_B=config.output_k_B,
        num_sub_heads=config.num_sub_heads, input_sz=config.input_sz,
        **_build_common(config))


def make_SegmentationNet10aDoersch(config):
    from iic_tpu.models.seg_baselines import SegmentationNet10aDoersch
    return SegmentationNet10aDoersch(
        patch_side=getattr(config, "doersch_patch_side", 9),
        input_sz=config.input_sz,
        batchnorm_track=getattr(config, "batchnorm_track", True))


def make_SegmentationNet10aIsola(config):
    from iic_tpu.models.seg_baselines import SegmentationNet10aIsola
    return SegmentationNet10aIsola(
        patch_side=getattr(config, "isola_patch_side", 9),
        input_sz=config.input_sz,
        batchnorm_track=getattr(config, "batchnorm_track", True))


def make_TripletsNet5g(config):
    return TripletsNet(output_k=config.output_k, input_sz=config.input_sz,
                       trunk_type="5g", **_build_common(config))


def make_TripletsNet6c(config):
    return TripletsNet(output_k=config.output_k, input_sz=config.input_sz,
                       trunk_type="6c", **_build_common(config))


ARCHS = {
    "ClusterNet6c": make_ClusterNet6c,
    "ClusterNet6cTwoHead": make_ClusterNet6cTwoHead,
    "ClusterNet5g": make_ClusterNet5g,
    "ClusterNet5gTwoHead": make_ClusterNet5gTwoHead,
    "SegmentationNet10a": make_SegmentationNet10a,
    "SegmentationNet10aTwoHead": make_SegmentationNet10aTwoHead,
    "TripletsNet5g": make_TripletsNet5g,
    "TripletsNet6c": make_TripletsNet6c,
    "SegmentationNet10aDoersch": make_SegmentationNet10aDoersch,
    "SegmentationNet10aIsola": make_SegmentationNet10aIsola,
}


def build(name, config):
    """``archs.__dict__[config.arch](config)`` equivalent."""
    return ARCHS[name](config)


def init_variables(model, key, x, heads=("A", "B"), **kwargs):
    """Initialise a model's variables; for two-head nets, trace every head so
    both heads' parameters exist in one tree (flax only creates params for
    branches traced at init). Single-head nets: pass ``heads=None``."""
    if heads is None:
        return model.init(key, x, **kwargs)
    merged = None
    for h in heads:
        v = model.init(key, x, head=h, **kwargs)
        if merged is None:
            merged = {k: dict(sub) for k, sub in v.items()}
        else:
            for col, sub in v.items():
                merged.setdefault(col, {})
                for name, val in sub.items():
                    merged[col].setdefault(name, val)
    return merged


__all__ = [
    "ARCHS", "build",
    "ClusterNet5g", "ClusterNet5gTrunk", "ClusterNet5gTwoHead",
    "ClusterNet6c", "ClusterNet6cTrunk", "ClusterNet6cTwoHead",
    "SegmentationNet10a", "SegmentationNet10aTrunk",
    "SegmentationNet10aTwoHead", "SupHead5Head", "TripletsNet",
    "BatchNorm", "MultiDenseHead", "MultiConvSoftmaxHead",
]
