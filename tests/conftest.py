"""Test configuration: force CPU backend with 8 virtual devices.

Tests never require TPU hardware; multi-device sharding tests run on a
virtual 8-device CPU mesh (xla_force_host_platform_device_count), per the
test strategy in SURVEY.md §4.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: env may pre-set a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import gc

import jax  # noqa: E402  (import after env vars are set)
import pytest

# The axon TPU plugin's sitecustomize sets jax_platforms="axon,cpu"
# programmatically, overriding the env var — force CPU back for tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# NOTE: enable() is a no-op on the CPU backend — XLA:CPU AOT cache reads
# SIGABRT/SIGILL on this host class (see compile_cache.py); tests compile
# cold.
from qlora_tpu.utils.compile_cache import enable as _cc_enable
_cc_enable(jax)


@pytest.fixture(autouse=True, scope="module")
def _drop_compiled_programs_per_module():
    """Each XLA:CPU JIT executable pins several mmap'd regions; a full-suite
    run accumulates >65k maps and SEGFAULTS at the kernel's
    vm.max_map_count ceiling (measured: maps grow 4.7k→65.1k, crash at the
    65530 limit inside the next compile's cache read).  Dropping compiled
    programs between modules bounds the map count.  NOTE: re-JITs after a
    clear are COLD compiles — the persistent compile cache is deliberately
    disabled on the CPU backend (AOT reloads SIGABRT on this host class,
    see compile_cache.py) — so the suite trades compile time for not dying
    at the map ceiling."""
    yield
    gc.collect()
    jax.clear_caches()


def _n_maps() -> int:
    try:
        with open("/proc/self/maps", "rb") as f:
            return sum(1 for _ in f)
    except OSError:
        return 0


@pytest.fixture(autouse=True)
def _bound_map_count_per_test():
    """Module-boundary clearing no longer suffices: the big shard_map
    modules (sharded/megatron/sp/e2e) individually compile enough XLA:CPU
    executables to cross the vm.max_map_count ceiling MID-module.  Clear
    eagerly whenever the map count nears the kernel limit (65530 default);
    re-JITs after a clear are cold compiles (CPU persistent cache disabled,
    see above) — the time cost is the price of staying under the limit."""
    yield
    if _n_maps() > 45_000:
        gc.collect()
        jax.clear_caches()
