"""Test configuration: force CPU backend with 8 virtual devices.

Tests must run without TPU hardware; multi-chip sharding tests use an
8-device virtual CPU mesh (the driver separately dry-run-compiles the
multi-chip path).  Must run before jax initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"   # force: the shell may export a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The axon TPU-tunnel sitecustomize (if present) registers its backend at
# interpreter start and sets jax_platforms="axon,cpu", overriding the env
# var — undo that so tests always run on the virtual 8-device CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


import pytest  # noqa: E402


@pytest.fixture
def interpret_ingest(monkeypatch):
    """Route every fused-ingest entry point through Pallas interpret mode
    (tests run on the virtual CPU mesh; the compiled kernels are
    TPU-only)."""
    import fdreadoutlibs_tpu.ops.ingest as ingest_mod

    for name in ("process_packed_frames", "process_packed_frames_fused",
                 "process_words14_feed", "process_time2_feed",
                 "process_packed_daphne"):
        orig = getattr(ingest_mod, name)

        def patched(words, stack, cfg, C, _orig=orig, **kw):
            kw["interpret"] = True
            return _orig(words, stack, cfg, C, **kw)

        monkeypatch.setattr(ingest_mod, name, patched)
