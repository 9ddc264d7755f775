"""Fused Pallas log-mel kernel: frame + window + DFT + mel + log in one pass.

The jnp reference path (ops/logmel.py) materializes the overlapping frame
matrix ``[T, n_fft]`` in HBM (≈16.6× the audio size at hop 160 / win 400)
before the FFT.  This kernel streams the raw waveform HBM→VMEM once per
frame-tile and never materializes frames off-chip.

The DFT is computed as matmuls against windowed cosine/sine bases — the
GEMM-native NDFT formulation (cf. "MelT", PAPERS.md) — so the whole frontend
runs on the MXU; the only VPU work is squaring and the log.

Mosaic-friendly data layout: the waveform is reshaped host-side to hop-width
columns and transposed to ``[B, hop, R]`` (R = number of hops).  In that
layout frame ``t`` is columns ``t..t+q`` and every slice the kernel takes is
lane-aligned:

* the per-tile DMA window starts at lane ``j·tile_f`` (tile_f = 128) with a
  128-multiple width;
* hop-slab alignment uses ``pltpu.roll`` on the lane axis (offset-0 slices);
* the windowed DFT accumulates per slab:
  ``re[t,f] = Σ_k  v_k[:, t]ᵀ · (W·C)[k·hop + d, f]`` — a ``dot_general``
  contracting the sublane axis, which the MXU takes directly.

Numerics match ops/logmel.py (same bases, full-f32 MXU passes); golden tests
check closeness against the torch.stft-verified jnp path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..logmel import mel_filterbank, num_frames

LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=8)
def _dft_bases(n_fft: int) -> tuple[np.ndarray, np.ndarray, int]:
    """Cos/sin DFT bases ``[n_fft, F_pad]`` for the rfft bins, lane-padded."""
    n_freqs = n_fft // 2 + 1
    f_pad = _round_up(n_freqs, LANE)
    k = np.arange(n_freqs)
    n = np.arange(n_fft)
    ang = 2.0 * np.pi * np.outer(n, k) / n_fft
    cos = np.zeros((n_fft, f_pad), np.float32)
    sin = np.zeros((n_fft, f_pad), np.float32)
    cos[:, :n_freqs] = np.cos(ang)
    sin[:, :n_freqs] = -np.sin(ang)
    return cos, sin, f_pad


_CONTRACT_SUBLANE = (((0,), (0,)), ((), ()))  # lhs dim0 × rhs dim0


def _kernel(sig_ref, cos_ref, sin_ref, fb_ref, out_ref,
            sig_vmem, sem,
            *, tile_f: int, n_fft: int, hop: int, log_eps: float,
            apply_log: bool):
    b = pl.program_id(0)
    j = pl.program_id(1)
    q, r = n_fft // hop, n_fft % hop
    lanes = _round_up(tile_f + q + 1, LANE)

    dma = pltpu.make_async_copy(
        sig_ref.at[b, :, pl.ds(j * tile_f, lanes)],
        sig_vmem,
        sem,
    )
    dma.start()
    dma.wait()

    hi = jax.lax.Precision.HIGHEST  # feature fidelity: full-f32 MXU passes
    v = sig_vmem[:, :]                                  # [hop, lanes]
    re = jnp.zeros((tile_f, cos_ref.shape[1]), jnp.float32)
    im = jnp.zeros((tile_f, cos_ref.shape[1]), jnp.float32)
    for k in range(q):
        part = v if k == 0 else pltpu.roll(v, lanes - k, axis=1)
        part = part[:, :tile_f]                          # [hop, tile_f], offset 0
        wc = cos_ref[k * hop : (k + 1) * hop, :]
        ws = sin_ref[k * hop : (k + 1) * hop, :]
        re += jax.lax.dot_general(part, wc, _CONTRACT_SUBLANE,
                                  preferred_element_type=jnp.float32, precision=hi)
        im += jax.lax.dot_general(part, ws, _CONTRACT_SUBLANE,
                                  preferred_element_type=jnp.float32, precision=hi)
    if r:
        part = pltpu.roll(v, lanes - q, axis=1)[:r, :tile_f]
        wc = cos_ref[q * hop : q * hop + r, :]
        ws = sin_ref[q * hop : q * hop + r, :]
        re += jax.lax.dot_general(part, wc, _CONTRACT_SUBLANE,
                                  preferred_element_type=jnp.float32, precision=hi)
        im += jax.lax.dot_general(part, ws, _CONTRACT_SUBLANE,
                                  preferred_element_type=jnp.float32, precision=hi)

    power = re * re + im * im
    mel = jnp.dot(power, fb_ref[:, :], preferred_element_type=jnp.float32,
                  precision=hi)
    out_ref[0, :, :] = jnp.log(mel + log_eps) if apply_log else mel


def log_mel_spectrogram_pallas(
    signal,
    sample_rate: int = 16000,
    n_fft: int = 400,
    hop_length: int = 160,
    win_length: int | None = None,
    n_mels: int = 80,
    f_min: float = 0.0,
    f_max: float | None = None,
    log_eps: float = 1e-6,
    center: bool = True,
    apply_log: bool = True,
    tile_frames: int = 128,
    interpret: bool = False,
):
    """Drop-in fused equivalent of ops.logmel.log_mel_spectrogram.

    Args:
      signal: ``[B, S]`` (or ``[S]``) float32 waveform.
      interpret: run in the Pallas interpreter (CPU testing).
    """
    win_length = win_length or n_fft
    assert win_length == n_fft, "win_length < n_fft: use the jnp path"
    squeeze = False
    signal = jnp.asarray(signal, jnp.float32)
    if signal.ndim == 1:
        signal, squeeze = signal[None], True
    B, S = signal.shape

    if center:
        signal = jnp.pad(signal, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    T = num_frames(S, n_fft, hop_length, center)
    tile_f = tile_frames                      # lane-slice width: keep 128-aligned
    n_tiles = -(-T // tile_f)
    T_pad = n_tiles * tile_f

    # Hop-column layout [B, hop, R]: lane axis = hop index, padded so every
    # tile's lane window is in bounds and 128-aligned.
    q = n_fft // hop_length
    lanes = _round_up(tile_f + q + 1, LANE)
    R = _round_up((n_tiles - 1) * tile_f + lanes, LANE)
    need = R * hop_length
    signal = jnp.pad(signal, ((0, 0), (0, max(0, need - signal.shape[1]))))
    signal = jnp.swapaxes(signal.reshape(B, R, hop_length), 1, 2)  # [B, hop, R]

    cos, sin, f_pad = _dft_bases(n_fft)
    fb = np.zeros((f_pad, n_mels), np.float32)
    fb[: n_fft // 2 + 1] = mel_filterbank(
        n_fft // 2 + 1, n_mels, sample_rate, f_min, f_max
    )
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft))
    wcos = (window[:, None] * cos).astype(np.float32)  # window folded into DFT
    wsin = (window[:, None] * sin).astype(np.float32)

    out = pl.pallas_call(
        functools.partial(
            _kernel, tile_f=tile_f, n_fft=n_fft, hop=hop_length,
            log_eps=log_eps, apply_log=apply_log,
        ),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # signal stays in HBM
            pl.BlockSpec((n_fft, f_pad), lambda b, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, f_pad), lambda b, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f_pad, n_mels), lambda b, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_f, n_mels), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, T_pad, n_mels), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((hop_length, _round_up(tile_f + q + 1, LANE)), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(signal, jnp.asarray(wcos), jnp.asarray(wsin), jnp.asarray(fb))

    out = out[:, :T]
    return out[0] if squeeze else out
