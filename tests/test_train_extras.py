"""Production-training extras beyond reference parity: LR schedules,
gradient accumulation, SpecAugment.  All default OFF / constant (parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from multimodal_av_model_tpu.config import Config
from multimodal_av_model_tpu.ops.specaugment import spec_augment
from multimodal_av_model_tpu.train.trainer import make_lr_schedule, make_optimizer


# -- SpecAugment --------------------------------------------------------------

def test_spec_augment_masks_valid_region_only():
    rng = np.random.default_rng(0)
    B, T, F = 3, 50, 16
    mel = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32) + 5.0)
    valid = jnp.arange(T)[None, :] < jnp.asarray([50, 30, 10])[:, None]

    out = spec_augment(jax.random.PRNGKey(0), mel, valid,
                       freq_masks=2, freq_mask_width=6,
                       time_masks=2, time_mask_frac=0.2)
    out = np.asarray(out)
    melh = np.asarray(mel)
    validh = np.asarray(valid)

    # Padding frames are untouched.
    np.testing.assert_array_equal(out[~validh], melh[~validh])
    # Something was masked somewhere (probabilistically certain at these
    # settings), and masked cells hold the per-utterance valid-frame mean.
    changed = out != melh
    assert changed.any()
    for b in range(B):
        if changed[b].any():
            fill = melh[b][validh[b]].mean()
            np.testing.assert_allclose(out[b][changed[b]], fill, rtol=1e-4)


def test_spec_augment_is_jittable_and_deterministic_per_key():
    mel = jnp.ones((2, 20, 8))
    f = jax.jit(lambda k, m: spec_augment(k, m, None, freq_masks=1,
                                          freq_mask_width=3, time_masks=1,
                                          time_mask_frac=0.3))
    a = f(jax.random.PRNGKey(1), mel)
    b = f(jax.random.PRNGKey(1), mel)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_specaug_defaults_off():
    cfg = Config()
    assert cfg.model.audio.specaug_freq_masks == 0
    assert cfg.model.audio.specaug_time_masks == 0


def test_specaug_in_audio_encoder_train_mode():
    from multimodal_av_model_tpu.models.audio import AudioEncoder

    cfg = Config()
    acfg = cfg.model.audio
    acfg.num_layers = 1
    acfg.d_model = 16
    acfg.num_heads = 2
    acfg.ffn_dim = 32
    acfg.output_dim = 16
    acfg.middle_layers = (0,)
    acfg.specaug_freq_masks = 2
    acfg.specaug_time_masks = 2
    acfg.dropout = 0.0
    enc = AudioEncoder(acfg, cfg.model.frontend)
    wav = jnp.asarray(np.random.default_rng(0)
                      .standard_normal((2, 3200)).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), wav)

    def run(key):
        return enc.apply(params, wav, deterministic=False,
                         rngs={"dropout": key})[0]

    a = jax.jit(run)(jax.random.PRNGKey(1))
    b = jax.jit(run)(jax.random.PRNGKey(2))
    # Different specaug draws → different features (dropout is 0, so the
    # only stochasticity is the augmentation).
    assert not np.allclose(np.asarray(a), np.asarray(b))
    # Eval mode ignores specaug entirely.
    c = enc.apply(params, wav, deterministic=True)[0]
    d = enc.apply(params, wav, deterministic=True)[0]
    np.testing.assert_array_equal(np.asarray(c), np.asarray(d))


# -- LR schedules --------------------------------------------------------------

def test_warmup_cosine_schedule_shape():
    cfg = Config()
    cfg.train.lr_schedule = "warmup_cosine"
    cfg.train.warmup_steps = 10
    cfg.train.decay_steps = 100
    cfg.train.lr_min_ratio = 0.1
    sched = make_lr_schedule(cfg.train, 1e-3)
    assert float(sched(0)) == pytest.approx(0.0, abs=1e-12)
    assert float(sched(10)) == pytest.approx(1e-3, rel=1e-6)
    assert float(sched(100)) == pytest.approx(1e-4, rel=1e-3)
    assert float(sched(5)) < 1e-3


def test_noam_schedule_peaks_at_warmup():
    cfg = Config()
    cfg.train.lr_schedule = "noam"
    cfg.train.warmup_steps = 20
    sched = make_lr_schedule(cfg.train, 2e-4)
    peak = float(sched(20))
    assert peak == pytest.approx(2e-4, rel=1e-5)
    assert float(sched(5)) < peak
    assert float(sched(200)) < peak
    # Inverse-sqrt tail: lr(4*warmup) = peak / 2.
    assert float(sched(80)) == pytest.approx(peak / 2, rel=1e-5)


def test_constant_schedule_is_parity_default():
    cfg = Config()
    assert cfg.train.lr_schedule == "constant"
    assert make_lr_schedule(cfg.train, 1e-4) == 1e-4


# -- Gradient accumulation ------------------------------------------------------

def _dummy_params():
    return {
        "audio_encoder": {"w": jnp.ones((3,))},
        "fusion": {"w": jnp.full((2,), 2.0)},
    }


def test_grad_accum_matches_mean_gradient_update():
    params = _dummy_params()
    g1 = jax.tree.map(lambda p: jnp.ones_like(p) * 0.5, params)
    g2 = jax.tree.map(lambda p: jnp.ones_like(p) * 1.5, params)
    gmean = jax.tree.map(lambda a, b: (a + b) / 2, g1, g2)

    cfg = Config()
    cfg.train.grad_accum_steps = 2
    tx = make_optimizer(cfg, params)
    st = tx.init(params)
    u1, st = tx.update(g1, st, params)
    mid = optax.apply_updates(params, u1)
    # First micro-step must not move the params.
    for a, b in zip(jax.tree.leaves(mid), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    u2, st = tx.update(g2, st, params)
    accum = optax.apply_updates(params, u2)

    cfg1 = Config()
    tx1 = make_optimizer(cfg1, params)
    st1 = tx1.init(params)
    u, _ = tx1.update(gmean, st1, params)
    direct = optax.apply_updates(params, u)

    for a, b in zip(jax.tree.leaves(accum), jax.tree.leaves(direct)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_grad_accum_respects_group_lrs():
    params = _dummy_params()
    grads = jax.tree.map(jnp.ones_like, params)
    cfg = Config()
    cfg.train.grad_accum_steps = 2
    tx = make_optimizer(cfg, params)
    st = tx.init(params)
    _, st = tx.update(grads, st, params)
    u, _ = tx.update(grads, st, params)
    # Adam step size == lr for a constant gradient; the audio group uses
    # the low LR, everything else the base LR.
    assert abs(float(u["audio_encoder"]["w"][0])) == pytest.approx(
        Config().train.audio_learning_rate, rel=1e-3)
    assert abs(float(u["fusion"]["w"][0])) == pytest.approx(
        Config().train.learning_rate, rel=1e-3)


# -- Visual-trunk rematerialization ---------------------------------------------

@pytest.mark.parametrize("mode", ["full", "frontend", "stage1"])
def test_visual_remat_preserves_tree_and_grads(mode):
    from multimodal_av_model_tpu.models import MultiSpeakerAVModel

    def tiny(remat):
        cfg = Config()
        a = cfg.model.audio
        a.num_layers, a.d_model, a.num_heads = 1, 16, 2
        a.ffn_dim, a.output_dim, a.middle_layers = 32, 16, (0,)
        v = cfg.model.visual
        v.frontend_channels, v.resnet_layers = 4, (1, 1, 1, 1)
        v.resnet_channels, v.output_dim = (4, 4, 8, 8), 8
        v.norm = "group"
        v.remat = remat
        f = cfg.model.fusion
        f.fused_dim, f.num_heads = 8, 2
        cfg.model.decoder.vocab_size = 20
        return MultiSpeakerAVModel(cfg.model)

    rng = np.random.default_rng(0)
    B, T, S = 1, 4, 4 * 534
    args = (
        jnp.asarray(rng.uniform(size=(B, T, 1, 96, 96)).astype(np.float32)),
        jnp.asarray(rng.uniform(size=(B, T, 1, 96, 96)).astype(np.float32)),
        jnp.asarray((rng.standard_normal((B, S)) * 0.1).astype(np.float32)),
        jnp.asarray(rng.integers(0, 3, (B, S)).astype(np.int32)),
        jnp.asarray(rng.integers(0, 3, (B, S)).astype(np.int32)),
    )
    m0, m1 = tiny("none"), tiny(mode)
    p0 = m0.init(jax.random.PRNGKey(0), *args)
    p1 = m1.init(jax.random.PRNGKey(0), *args)
    # Checkpoints are interchangeable between the two settings.
    assert (jax.tree_util.tree_structure(p0)
            == jax.tree_util.tree_structure(p1))

    def loss(m, p):
        out = m.apply(p, *args, train=True,
                      rngs={"dropout": jax.random.PRNGKey(1)})
        return out["log_probs1"].sum() + out["contrast2"].sum()

    g0 = jax.jit(jax.grad(lambda p: loss(m0, p)))(p0)
    g1 = jax.jit(jax.grad(lambda p: loss(m1, p)))(p0)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2e-3)


# -- Checkpoint averaging -------------------------------------------------------

def test_average_checkpoints_means_float_leaves(tmp_path):
    from multimodal_av_model_tpu.train import average_checkpoints, save_checkpoint

    def payload(scale):
        return {
            "state": {
                "params": {"layer": {"w": np.full((3,), scale, np.float32),
                                     "b": np.full((2,), scale * 10, np.float32)}},
                "step": np.asarray(int(scale), np.int32),
            },
            "epoch": int(scale),
        }

    p1, p2 = str(tmp_path / "a.ckpt"), str(tmp_path / "b.ckpt")
    save_checkpoint(p1, payload(1.0))
    save_checkpoint(p2, payload(3.0))
    avg = average_checkpoints([p1, p2])
    np.testing.assert_allclose(avg["state"]["params"]["layer"]["w"],
                               np.full((3,), 2.0, np.float32))
    np.testing.assert_allclose(avg["state"]["params"]["layer"]["b"],
                               np.full((2,), 20.0, np.float32))
    # Integer leaves (step counters) keep the first checkpoint's value.
    assert int(avg["state"]["step"]) == 1


def test_transcriber_accepts_checkpoint_list(tmp_path):
    from multimodal_av_model_tpu.infer import Transcriber
    from multimodal_av_model_tpu.text import CharTokenizer
    from multimodal_av_model_tpu.train import save_checkpoint

    import os
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tok = CharTokenizer(os.path.join(root, "assets", "tokenizer800.vocab"))
    cfg = Config()
    a = cfg.model.audio
    a.num_layers, a.d_model, a.num_heads = 1, 16, 2
    a.ffn_dim, a.output_dim, a.middle_layers = 32, 16, (0,)
    v = cfg.model.visual
    v.frontend_channels, v.resnet_layers = 4, (1, 1, 1, 1)
    v.resnet_channels, v.output_dim = (4, 4, 8, 8), 8
    v.norm = "group"
    f = cfg.model.fusion
    f.fused_dim, f.num_heads = 8, 2
    cfg.model.decoder.vocab_size = tok.vocab_size

    rng = np.random.default_rng(0)
    B, T, S = 1, 4, 4 * 534
    batch = {
        "lip1": rng.uniform(size=(B, T, 1, 96, 96)).astype(np.float32),
        "lip2": rng.uniform(size=(B, T, 1, 96, 96)).astype(np.float32),
        "audio": (rng.standard_normal((B, S)) * 0.1).astype(np.float32),
        "mask1": rng.integers(0, 3, (B, S)).astype(np.int32),
        "mask2": rng.integers(0, 3, (B, S)).astype(np.int32),
        "lip1_lengths": np.full((B,), T, np.int32),
        "lip2_lengths": np.full((B,), T, np.int32),
    }
    from multimodal_av_model_tpu.models import MultiSpeakerAVModel

    model = MultiSpeakerAVModel(cfg.model)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), batch["lip1"], batch["lip2"], batch["audio"],
        batch["mask1"], batch["mask2"], batch["lip1_lengths"], batch["lip2_lengths"],
    )
    p1 = str(tmp_path / "e1.ckpt")
    p2 = str(tmp_path / "e2.ckpt")
    save_checkpoint(p1, {"state": {"params": jax.device_get(variables["params"])}})
    save_checkpoint(p2, {"state": {"params": jax.tree.map(
        lambda x: x * 3.0, jax.device_get(variables["params"]))}})
    t = Transcriber.from_checkpoint(cfg, tok, [p1, p2], batch)
    texts = t.transcribe(batch, use_beam=False)
    assert len(texts) == B and isinstance(texts[0], tuple)
    # Averaged params = 2x the originals, not either endpoint.
    got = jax.tree.leaves(t.variables["params"])[0]
    want = jax.tree.leaves(variables["params"])[0] * 2.0
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


# -- TensorBoard logger ---------------------------------------------------------

def test_tensorboard_logger_writes_events(tmp_path):
    from multimodal_av_model_tpu.train import TensorBoardLogger

    tb = TensorBoardLogger(str(tmp_path / "tb"))
    if not tb.active:                       # tensorboardX absent: no-op mode
        tb.scalars(1, loss=1.0)
        tb.close()
        return
    tb.scalars(1, **{"train/loss": 1.5, "eval/cer": 0.5})
    tb.close()
    import glob
    assert glob.glob(str(tmp_path / "tb" / "events.out.tfevents.*"))


def test_tensorboard_logger_empty_dir_is_noop():
    from multimodal_av_model_tpu.train import TensorBoardLogger

    tb = TensorBoardLogger("")
    assert not tb.active
    tb.scalars(0, loss=1.0)                 # must not raise
    tb.close()
