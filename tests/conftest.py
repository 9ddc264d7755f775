"""Test harness: force JAX onto a virtual 8-device CPU mesh.

This is the standard fake-mesh trick (SURVEY.md §4): multi-chip sharding
logic is exercised on CPU with ``--xla_force_host_platform_device_count=8``
so "multi-node" paths are tested without a TPU pod.  Must run before the
first ``import jax`` anywhere in the test process.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# Persistent XLA compilation cache: the test models recompile identically on
# every run, and this host has one CPU core — caching cuts suite time from
# ~30 min to ~minutes after the first run.
import jax  # noqa: E402

# Some environments register an accelerator plugin that force-overrides
# JAX_PLATFORMS at import; pin the config explicitly so tests really run on
# the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

# The upstream reference (read-only) is importable as a torch-based oracle for
# behavioural parity tests.  Guarded: absent in environments without the mount.
REFERENCE_ROOT = "/root/reference"

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def reference_path():
    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference repo not mounted")
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    return REFERENCE_ROOT
