from .native import (
    have_native,
    levenshtein,
    mix_and_mask,
    pcm16_to_f32,
    resample_linear,
    resize_bilinear,
)

__all__ = [
    "have_native",
    "levenshtein",
    "mix_and_mask",
    "pcm16_to_f32",
    "resample_linear",
    "resize_bilinear",
]
