"""Test configuration: force the CPU backend with 8 virtual devices so tests
are fast and multi-chip sharding tests run without TPU hardware (SURVEY.md §4).

Note: this image ships an 'axon' TPU plugin that prepends itself to
jax_platforms even when JAX_PLATFORMS=cpu is set in the environment, so the
override must go through jax.config.update after import.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# NOTE: do not enable jax_compilation_cache_dir here — the XLA:CPU AOT cache
# loader segfaults on this host (compile-time machine features don't match
# the execution machine; observed SIGSEGV in get_executable_and_time).
