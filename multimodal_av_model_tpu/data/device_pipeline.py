"""On-device batch preprocessing: raw media → model-ready tensors in one jit.

The reference does all per-sample preprocessing in Python DataLoader workers
(grayscale, per-frame cv2.resize, mixing, mask generation —
dataset/multi_speaker_dataset.py:13-84).  Host work here is reduced to
decode + pad-to-bucket; everything else happens on device in one compiled
region per bucket shape:

* two-speaker mixing + peak-norm + 0/1/2/3 masks (`mixing.mix_pair_batched_device`);
* lip grayscale + bilinear 128→96 resize + /255 via the matmul-separable
  form (ops/resize.py) — MXU work, not gathers;
* outputs exactly the collator's tensor layout (collate.collate_pairs), so
  the trainer is agnostic to which pipeline produced the batch.

Equivalence with the host path is tested in tests/test_device_pipeline.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.resize import resize_bilinear_matmul
from .mixing import mix_pair_batched_device


@functools.partial(jax.jit, static_argnames=("out_size", "use_pallas"))
def preprocess_batch_device(
    lips1_raw,
    lips2_raw,
    audio1,
    audio2,
    audio1_len,
    audio2_len,
    out_size: int = 96,
    use_pallas: bool | None = None,
):
    """Args:
      lips1_raw, lips2_raw: ``[B, T, H, W, C]`` raw frames (uint8/float 0..255),
        zero-padded past each clip's length.
      audio1, audio2: ``[B, S]`` per-speaker waveforms, zero-padded.
      audio1_len, audio2_len: ``[B]`` true sample counts.

    Returns a dict with ``lip1/lip2 [B,T,1,out,out]``, ``audio [B,S]``,
    ``mask1/mask2 [B,S]`` (pad = 3) — the collator layout.
    """

    fused = use_pallas if use_pallas is not None else jax.default_backend() == "tpu"

    def prep_lips(raw):
        if fused:
            # Fused Pallas kernel: gray + matmul resize + /255 in one pass
            # (ops/pallas/lip_kernel.py) — the TPU production path.
            from ..ops.pallas.lip_kernel import lip_preprocess_pallas

            B, T, H, W, C = raw.shape
            flat = jnp.reshape(jnp.asarray(raw, jnp.float32), (B * T, H, W, C))
            out = lip_preprocess_pallas(flat, out_size)   # [B*T, 1, out, out]
            return jnp.reshape(out, (B, T, 1, out_size, out_size))
        x = jnp.asarray(raw, jnp.float32)
        gray = x.mean(axis=-1)                       # [B, T, H, W]
        resized = resize_bilinear_matmul(gray, out_size, out_size)
        return (resized / 255.0)[:, :, None, :, :]   # [B, T, 1, out, out]

    mixed, mask1, mask2, mix_len = mix_pair_batched_device(
        audio1, audio2, audio1_len, audio2_len
    )
    return {
        "lip1": prep_lips(lips1_raw),
        "lip2": prep_lips(lips2_raw),
        "audio": mixed,
        "mask1": mask1,
        "mask2": mask2,
        "audio_lengths": mix_len,
    }


_PASSTHROUGH_KEYS = (
    "lip1_lengths", "lip2_lengths",
    "text1", "text1_lengths", "text2", "text2_lengths",
    "valid", "num_real",
)


def device_preprocessed_batches(raw_batches, out_size: int = 96,
                                use_pallas: bool | None = None):
    """Wrap raw collated batches (collate.collate_pairs_raw) into the standard
    trainer layout, preprocessing on device — the production path that keeps
    the (single-core) host out of the per-frame work."""
    for rb in raw_batches:
        proc = preprocess_batch_device(
            rb["lip1_raw"], rb["lip2_raw"], rb["audio1"], rb["audio2"],
            rb["audio1_len"], rb["audio2_len"],
            out_size=out_size, use_pallas=use_pallas,
        )
        batch = {k: rb[k] for k in _PASSTHROUGH_KEYS if k in rb}
        batch.update(proc)
        yield batch
