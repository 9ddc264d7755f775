"""Profiling / observability utilities smoke tests."""

import glob
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_av_model_tpu.train.profiling import (
    annotate,
    device_memory_stats,
    nan_guard,
    trace,
)


def test_trace_writes_profile(tmp_path):
    log_dir = str(tmp_path / "prof")
    f = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((64, 64))
    f(x)  # compile outside the trace
    with trace(log_dir):
        jax.block_until_ready(f(x))
    assert glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"), recursive=True) or \
           glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"), recursive=True)


def test_annotate_scopes_compile():
    @jax.jit
    def f(x):
        with annotate("my_block"):
            return x * 2

    np.testing.assert_array_equal(np.asarray(f(jnp.ones(4))), 2 * np.ones(4))


def test_nan_guard_traps_nan():
    with pytest.raises(FloatingPointError):
        with nan_guard():
            jax.block_until_ready(jax.jit(lambda x: jnp.log(x))(jnp.asarray(-1.0)))
    # Guard restored afterwards: NaN flows silently again.
    out = jax.jit(lambda x: jnp.log(x))(jnp.asarray(-1.0))
    assert np.isnan(np.asarray(out))


def test_device_memory_stats_keys():
    stats = device_memory_stats()
    assert len(stats) >= 1


def test_audio_middle_layer_validation():
    from multimodal_av_model_tpu.config import Config
    from multimodal_av_model_tpu.models import AudioOnlyCTC

    cfg = Config()
    cfg.model.audio.num_layers = 2
    cfg.model.audio.middle_layers = (5,)
    model = AudioOnlyCTC(cfg.model)
    with pytest.raises(ValueError, match="middle_layers"):
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1600)))
