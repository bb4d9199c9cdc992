"""Test configuration.

Tests run on a virtual 8-device CPU mesh (the driver separately dry-runs the
multi-chip path; the benchmark runs on the real TPU chip).  float64 is enabled
so analytic hand-derivation checks (reference test technique #1, see
SURVEY.md section 4) can use tight tolerances.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the driver env presets axon (TPU)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The sandbox's sitecustomize imports jax before this conftest runs, so the
# env var alone is not enough -- force the platform through the config too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# XLA compilation on this box is slow (single core); a persistent cache makes
# repeated test runs cheap.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
