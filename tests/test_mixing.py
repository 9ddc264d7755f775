"""Mixing + speaker-mask semantics (reference dataset/multi_speaker_dataset.py:13-45)
and host/device consistency."""

import numpy as np

import jax.numpy as jnp

from multimodal_av_model_tpu.data.mixing import (
    MASK_OTHER_SOLO,
    MASK_OVERLAP,
    MASK_PAD,
    MASK_TARGET_SOLO,
    downsample_mask_nearest,
    make_speaker_masks,
    mix_pair,
    mix_pair_batched_device,
)


def test_mask_codes_longer_speaker1():
    m1, m2 = make_speaker_masks(10, 6)
    assert m1.shape == (10,)
    assert (m1[:6] == MASK_OVERLAP).all()
    assert (m1[6:10] == MASK_TARGET_SOLO).all()
    assert (m2[:6] == MASK_OVERLAP).all()
    assert (m2[6:10] == MASK_OTHER_SOLO).all()


def test_mask_codes_equal_lengths():
    m1, m2 = make_speaker_masks(5, 5)
    assert (m1 == MASK_OVERLAP).all() and (m2 == MASK_OVERLAP).all()


def test_mix_peak_normalized():
    rng = np.random.default_rng(0)
    a1 = rng.standard_normal(100).astype(np.float32) * 3
    a2 = rng.standard_normal(60).astype(np.float32)
    mixed, m1, m2 = mix_pair(a1, a2)
    assert mixed.shape == (100,)
    expect = np.pad(a2, (0, 40)) + a1
    expect = expect / (np.abs(expect).max() + 1e-6)
    np.testing.assert_allclose(mixed, expect, rtol=1e-6)
    assert np.abs(mixed).max() <= 1.0


def test_device_matches_host():
    rng = np.random.default_rng(1)
    S = 120
    a1 = np.zeros((2, S), np.float32)
    a2 = np.zeros((2, S), np.float32)
    lens = [(100, 70), (50, 110)]
    for b, (l1, l2) in enumerate(lens):
        a1[b, :l1] = rng.standard_normal(l1)
        a2[b, :l2] = rng.standard_normal(l2)

    mixed_d, m1_d, m2_d, mix_len = mix_pair_batched_device(
        jnp.asarray(a1), jnp.asarray(a2),
        jnp.asarray([l for l, _ in lens]), jnp.asarray([l for _, l in lens]),
    )
    for b, (l1, l2) in enumerate(lens):
        mh, m1h, m2h = mix_pair(a1[b, :l1], a2[b, :l2])
        n = max(l1, l2)
        assert int(mix_len[b]) == n
        np.testing.assert_allclose(np.asarray(mixed_d)[b, :n], mh, rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(m1_d)[b, :n], m1h)
        np.testing.assert_array_equal(np.asarray(m2_d)[b, :n], m2h)
        assert (np.asarray(m1_d)[b, n:] == MASK_PAD).all()
        assert (np.asarray(m2_d)[b, n:] == MASK_PAD).all()


def test_downsample_mask_matches_torch_nearest():
    import pytest

    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    mask = rng.integers(0, 4, size=(3, 97)).astype(np.int64)
    for target in [10, 48, 97, 31]:
        ours = downsample_mask_nearest(mask, target)
        ref = (
            torch.nn.functional.interpolate(
                torch.tensor(mask).unsqueeze(1).float(), size=target, mode="nearest"
            )
            .squeeze(1)
            .long()
            .numpy()
        )
        np.testing.assert_array_equal(ours, ref)


def test_bucketed_batches_multi_bucket_routing():
    """Samples route to the smallest fitting bucket; each emitted batch is
    a single static shape; leftovers flush with num_real."""
    import numpy as np

    from multimodal_av_model_tpu.data.collate import make_bucket_specs
    from multimodal_av_model_tpu.data.pipeline import bucketed_batches

    specs = make_bucket_specs((8, 16), audio_samples_per_video_frame=100,
                              max_label_len=4)

    def sample(T):
        S = T * 90
        return {
            "audio": np.zeros(S, np.float32),
            "mask1": np.zeros(S, np.int64),
            "mask2": np.zeros(S, np.int64),
            "lip1": np.zeros((T, 1, 8, 8), np.float32),
            "label1": np.array([5, 6], np.int64),
            "lip1_len": T,
            "lip2": np.zeros((T, 1, 8, 8), np.float32),
            "label2": np.array([7], np.int64),
            "lip2_len": T,
        }

    stream = [sample(6), sample(12), sample(7), sample(5), sample(14)]
    batches = list(bucketed_batches(iter(stream), specs, batch_size=2))
    shapes = sorted(b["lip1"].shape[1] for b in batches)
    assert shapes == [8, 8, 16]           # two small-bucket batches, one large
    flushed = [b for b in batches if "num_real" in b]
    assert len(flushed) == 1              # the small bucket's leftover flushes
    assert int(flushed[0]["num_real"]) == 1
    for b in batches:
        assert b["lip1"].shape[0] == 2    # static batch dim everywhere
