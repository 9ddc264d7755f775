"""CTC loss and greedy decode vs the torch CTCLoss oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_av_model_tpu.ops.ctc import (
    ctc_collapse,
    ctc_greedy_decode,
    ctc_loss,
    ctc_loss_from_logits,
)

torch = pytest.importorskip("torch")


def _random_case(rng, B=4, T=20, V=7, L=6, blank=0):
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    log_probs = torch.log_softmax(torch.tensor(logits), dim=-1).numpy()
    labels = rng.integers(1, V, size=(B, L)).astype(np.int64)
    input_lengths = rng.integers(L * 2 + 2, T + 1, size=B).astype(np.int64)
    label_lengths = rng.integers(1, L + 1, size=B).astype(np.int64)
    return log_probs, labels, input_lengths, label_lengths


@pytest.mark.parametrize("reduction", ["mean", "sum", "none"])
def test_matches_torch(reduction):
    rng = np.random.default_rng(0)
    log_probs, labels, il, ll = _random_case(rng)
    ours = ctc_loss(log_probs, labels, il, ll, blank_id=0, reduction=reduction)
    ref = torch.nn.CTCLoss(blank=0, reduction=reduction, zero_infinity=True)(
        torch.tensor(log_probs).transpose(0, 1),
        torch.tensor(labels),
        torch.tensor(il),
        torch.tensor(ll),
    )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_blank_id_nonzero():
    # The project vocab uses blank=3 (SURVEY.md §2 row 5).
    rng = np.random.default_rng(1)
    B, T, V, L = 3, 15, 9, 4
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    log_probs = torch.log_softmax(torch.tensor(logits), dim=-1).numpy()
    labels = rng.integers(4, V, size=(B, L)).astype(np.int64)
    il = np.full(B, T, dtype=np.int64)
    ll = np.array([4, 2, 3], dtype=np.int64)
    ours = ctc_loss(log_probs, labels, il, ll, blank_id=3)
    ref = torch.nn.CTCLoss(blank=3, zero_infinity=True)(
        torch.tensor(log_probs).transpose(0, 1),
        torch.tensor(labels), torch.tensor(il), torch.tensor(ll),
    )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_zero_infinity_clamps_impossible():
    # Label longer than input frames → inf in plain CTC → 0 with zero_infinity.
    rng = np.random.default_rng(2)
    B, T, V, L = 2, 4, 6, 4
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    log_probs = np.log(np.exp(logits) / np.exp(logits).sum(-1, keepdims=True))
    labels = np.array([[1, 1, 1, 1], [1, 2, 3, 4]], dtype=np.int64)  # repeats need 2L+? frames
    il = np.array([4, 4], dtype=np.int64)
    ll = np.array([4, 2], dtype=np.int64)
    ours = ctc_loss(log_probs, labels, il, ll, blank_id=0, reduction="none")
    ref = torch.nn.CTCLoss(blank=0, reduction="none", zero_infinity=True)(
        torch.tensor(log_probs, dtype=torch.float32).transpose(0, 1),
        torch.tensor(labels), torch.tensor(il), torch.tensor(ll),
    )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5)
    assert np.asarray(ours)[0] == 0.0  # the impossible one


def test_zero_length_label():
    rng = np.random.default_rng(3)
    B, T, V, L = 2, 8, 5, 3
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    log_probs = np.log(np.exp(logits) / np.exp(logits).sum(-1, keepdims=True))
    labels = np.ones((B, L), dtype=np.int64)
    il = np.array([8, 6], dtype=np.int64)
    ll = np.array([0, 2], dtype=np.int64)
    ours = ctc_loss(log_probs, labels, il, ll, blank_id=0, reduction="none")
    ref = torch.nn.CTCLoss(blank=0, reduction="none", zero_infinity=True)(
        torch.tensor(log_probs, dtype=torch.float32).transpose(0, 1),
        torch.tensor(labels), torch.tensor(il), torch.tensor(ll),
    )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_gradients_match_torch():
    rng = np.random.default_rng(4)
    B, T, V, L = 2, 10, 6, 3
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    labels = rng.integers(1, V, size=(B, L)).astype(np.int64)
    il = np.full(B, T, dtype=np.int64)
    ll = np.full(B, L, dtype=np.int64)

    grad = jax.grad(
        lambda lg: ctc_loss_from_logits(lg, labels, il, ll, blank_id=0)
    )(jnp.asarray(logits))

    t_logits = torch.tensor(logits, requires_grad=True)
    loss = torch.nn.CTCLoss(blank=0, zero_infinity=True)(
        torch.log_softmax(t_logits, dim=-1).transpose(0, 1),
        torch.tensor(labels), torch.tensor(il), torch.tensor(ll),
    )
    loss.backward()
    np.testing.assert_allclose(np.asarray(grad), t_logits.grad.numpy(), rtol=1e-3, atol=1e-4)


def _collapse_oracle(ids, blank):
    out, prev = [], None
    for i in ids:
        if i != blank and i != prev:
            out.append(i)
        prev = i
    return out


def test_ctc_collapse_matches_host_loop():
    rng = np.random.default_rng(5)
    ids = rng.integers(0, 4, size=(6, 30)).astype(np.int32)
    lengths = rng.integers(1, 31, size=6).astype(np.int32)
    out, out_len = ctc_collapse(jnp.asarray(ids), jnp.asarray(lengths), blank_id=0)
    out, out_len = np.asarray(out), np.asarray(out_len)
    for b in range(6):
        expect = _collapse_oracle(ids[b, : lengths[b]].tolist(), 0)
        assert out_len[b] == len(expect)
        assert out[b, : len(expect)].tolist() == expect
        assert (out[b, len(expect):] == -1).all()


def test_greedy_decode_shapes_and_jit():
    rng = np.random.default_rng(6)
    lp = jnp.asarray(rng.standard_normal((3, 12, 8)).astype(np.float32))
    lengths = jnp.asarray([12, 7, 1])
    ids, out_len = jax.jit(
        lambda a, b: ctc_greedy_decode(a, b, blank_id=3)
    )(lp, lengths)
    assert ids.shape == (3, 12)
    assert (np.asarray(out_len) <= np.asarray(lengths)).all()
