"""On-device beam search vs the reference host-Python decoder (imported
read-only as an oracle)."""

import numpy as np
import pytest

import jax.numpy as jnp

from multimodal_av_model_tpu.ops.beam_search import beam_search_decode

torch = pytest.importorskip("torch")


def _ref_decode(reference_path, log_probs, beam_width, blank):
    from beam_search import simple_beam_search  # type: ignore

    return simple_beam_search(torch.tensor(log_probs), beam_width=beam_width, blank=blank)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_matches_reference_decoder(reference_path, seed):
    rng = np.random.default_rng(seed)
    T, V = 25, 12
    logits = rng.standard_normal((T, V)).astype(np.float32)
    lp = np.log(np.exp(logits) / np.exp(logits).sum(-1, keepdims=True))

    ids, out_len, _ = beam_search_decode(
        jnp.asarray(lp)[None], jnp.asarray([T]), beam_width=5, blank_id=0
    )
    ours = np.asarray(ids)[0, : int(out_len[0])].tolist()
    ref = _ref_decode(reference_path, lp, 5, 0)
    assert ours == ref


def test_blank3_and_batched(reference_path):
    rng = np.random.default_rng(7)
    B, T, V = 3, 18, 20
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    lp = np.log(np.exp(logits) / np.exp(logits).sum(-1, keepdims=True))
    ids, out_len, _ = beam_search_decode(
        jnp.asarray(lp), jnp.full((B,), T), beam_width=5, blank_id=3
    )
    for b in range(B):
        ref = _ref_decode(reference_path, lp[b], 5, 3)
        assert np.asarray(ids)[b, : int(out_len[b])].tolist() == ref


def test_length_masking_ignores_padding():
    # Frames past `length` must not change the decoded sequence.
    rng = np.random.default_rng(9)
    T, V, n = 24, 10, 15
    logits = rng.standard_normal((T, V)).astype(np.float32)
    lp = np.log(np.exp(logits) / np.exp(logits).sum(-1, keepdims=True))
    full = lp.copy()
    full[n:] = rng.standard_normal((T - n, V))  # garbage past length

    a, alen, _ = beam_search_decode(jnp.asarray(lp[:n])[None], jnp.asarray([n]), 5, 0)
    b, blen, _ = beam_search_decode(jnp.asarray(full)[None], jnp.asarray([n]), 5, 0)
    assert np.asarray(a)[0, : int(alen[0])].tolist() == np.asarray(b)[0, : int(blen[0])].tolist()


def test_peaked_distribution_recovers_sequence():
    # With near-one-hot frames, beam search must return the CTC collapse of
    # the argmax path.
    path = [0, 1, 1, 0, 2, 2, 3, 0, 3]
    V = 5
    lp = np.full((len(path), V), -20.0, dtype=np.float32)
    for t, c in enumerate(path):
        lp[t, c] = 0.0
    ids, out_len, _ = beam_search_decode(
        jnp.asarray(lp)[None], jnp.asarray([len(path)]), beam_width=5, blank_id=0
    )
    assert np.asarray(ids)[0, : int(out_len[0])].tolist() == [1, 2, 3, 3]
