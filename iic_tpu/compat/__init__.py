"""Interop with the reference implementation's on-disk artifacts."""

from iic_tpu.compat.torch_import import (
    load_torch_file, normalize_state_dict, read_reference_config,
    state_dict_to_variables, sup_head5_state_dict_to_variables)

__all__ = [
    "load_torch_file", "normalize_state_dict", "read_reference_config",
    "state_dict_to_variables", "sup_head5_state_dict_to_variables",
]
