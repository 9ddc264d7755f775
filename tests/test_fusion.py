"""Fusion frame-compaction/interpolation semantics vs the reference module's
ragged implementation (imported read-only as a torch oracle)."""

import numpy as np
import pytest

import jax.numpy as jnp

from multimodal_av_model_tpu.models.fusion import (
    compact_speech_frames,
    interp_linear_to,
    interp_nearest_mask,
)

torch = pytest.importorskip("torch")


def _reference_compact_interp(audio_feat, mask, T_v):
    """The ragged filter + pad + interpolate stage of reference
    model/fusion_module.py:40-55, run through torch as an oracle."""
    import torch.nn.functional as F

    a = torch.tensor(audio_feat)
    m = torch.tensor(mask)
    speech = (m != 0) & (m != 3)
    feats, masks = [], []
    for i in range(a.shape[0]):
        feats.append(a[i][speech[i]])
        masks.append(m[i][speech[i]])
    a = torch.nn.utils.rnn.pad_sequence(feats, batch_first=True)
    m = torch.nn.utils.rnn.pad_sequence(masks, batch_first=True)
    if a.shape[1] != T_v:
        a = F.interpolate(a.permute(0, 2, 1), size=T_v, mode="linear", align_corners=True)
        a = a.permute(0, 2, 1)
        m = F.interpolate(m.unsqueeze(1).float(), size=T_v, mode="nearest").squeeze(1).long()
    input_lengths = torch.tensor([(mm != 0).sum().item() for mm in m])
    return a.numpy(), m.numpy(), input_lengths.numpy()


@pytest.mark.parametrize("seed,T_v", [(0, 7), (1, 12), (2, 5)])
def test_matches_reference_ragged_path(seed, T_v):
    rng = np.random.default_rng(seed)
    B, T_a, D = 3, 20, 6
    audio = rng.standard_normal((B, T_a, D)).astype(np.float32)
    mask = rng.integers(0, 4, size=(B, T_a)).astype(np.int64)
    # Ensure at least one kept frame per sample (the reference crashes
    # otherwise; our static path would produce zeros).
    mask[:, 0] = 1

    audio_c, mask_c, kept = compact_speech_frames(jnp.asarray(audio), jnp.asarray(mask))
    t_in = jnp.max(kept)
    a_i = np.asarray(interp_linear_to(audio_c, t_in, T_v))
    m_i = np.asarray(interp_nearest_mask(mask_c, t_in, T_v))

    ref_a, ref_m, ref_len = _reference_compact_interp(audio, mask, T_v)
    np.testing.assert_allclose(a_i, ref_a, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(m_i, ref_m)
    np.testing.assert_array_equal((m_i != 0).sum(axis=1), ref_len)


def test_compaction_is_stable_gather():
    audio = jnp.arange(12, dtype=jnp.float32).reshape(1, 12, 1)
    mask = jnp.asarray([[0, 1, 3, 2, 0, 1, 3, 3, 2, 0, 1, 3]])
    audio_c, mask_c, kept = compact_speech_frames(audio, mask)
    assert int(kept[0]) == 5
    # Kept frames appear in original order: indices 1,3,5,8,10.
    np.testing.assert_array_equal(np.asarray(audio_c)[0, :5, 0], [1, 3, 5, 8, 10])
    np.testing.assert_array_equal(np.asarray(mask_c)[0, :5], [1, 2, 1, 2, 1])
    # Tail zeroed.
    assert (np.asarray(audio_c)[0, 5:, 0] == 0).all()
    assert (np.asarray(mask_c)[0, 5:] == 0).all()
