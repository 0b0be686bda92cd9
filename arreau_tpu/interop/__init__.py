"""Interoperability with the reference (PyTorch) implementation."""

from arreau_tpu.interop.torch_import import (  # noqa: F401
    convert_reference_checkpoint,
    convert_state_dict,
    load_reference_checkpoint,
)
