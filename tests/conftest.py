"""Test config: force CPU backend with 8 virtual devices so sharding tests
run without real TPU hardware (SURVEY.md §4 'Multi-chip')."""

import os

# The session environment pins JAX_PLATFORMS=axon (real TPU tunnel) and a
# sitecustomize imports jax at interpreter startup, so env vars alone are too
# late here — use jax.config.update, which works any time before backend init.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent XLA compile cache: the suite's cost is dominated by CPU XLA
# compiles (each eager init op and every jitted denoise loop). Caching them
# makes warm re-runs of the fast tier ~3x and of the slow tier far faster;
# the cold gate timing is unaffected. Cache entries are keyed by HLO +
# compile options, so code changes invalidate naturally. The CPU AOT loader
# logs a benign feature-mismatch error per hit ("+prefer-no-scatter" is a
# tuning hint the host-feature probe omits); pytest captures the noise.
jax.config.update("jax_compilation_cache_dir", "/tmp/aid_tpu_test_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


# Test tiering: compile-heavy modules are auto-marked slow so the default
# CI gate (-m "not slow") stays fast; the full suite runs as a second job.
import pytest  # noqa: E402

_SLOW_MODULES = {
    "test_flash_attention.py",  # interpret-mode Pallas kernels
    "test_parallel.py",  # 8-device mesh denoise loops
    "test_golden.py",  # full tiny-pipeline generations
    "test_pipeline.py",  # end-to-end pipeline integration
    "test_loaders_extras.py",  # safety-checker pipeline integration
    "test_sdxl_ip.py",  # SDXL + IP-Adapter integration
    "test_params.py",  # converter round-trips (332 LoC of synthetic dicts)
    "test_models.py",  # eager model-forward compiles dominate the fast gate
    "test_single_file.py",  # full tiny-checkpoint roundtrips (UNet+VAE inits)
    "test_schedulers_multistep.py",  # UniPC/EDM multistep traces
    "test_parity.py",  # tiny-pipeline denoise runs (latent/embeds import)
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if os.path.basename(str(item.fspath)) in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


# Build native components (cheap; skipped silently if toolchain missing).
import subprocess
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_so = os.path.join(_repo, "aid_tpu", "native", "libdp_solver.so")
if not os.path.exists(_so):
    try:
        subprocess.run([os.path.join(_repo, "native", "build.sh")], check=True,
                       capture_output=True, timeout=120)
    except Exception:
        pass
