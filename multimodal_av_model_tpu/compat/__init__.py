"""Interop with the reference system's artifacts (torch checkpoints)."""

from .torch_import import (
    convert_decoder_state_dict,
    convert_fusion_state_dict,
    convert_visual_state_dict,
    import_reference_checkpoint,
)

__all__ = [
    "convert_decoder_state_dict",
    "convert_fusion_state_dict",
    "convert_visual_state_dict",
    "import_reference_checkpoint",
]
