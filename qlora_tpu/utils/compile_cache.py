"""Machine-keyed persistent compile cache.

XLA:CPU AOT artifacts encode the compile machine's CPU feature set; loading
them on a host with different features can SIGILL/segfault (observed: the
round driver migrating boxes mid-build crashed the test suite at ~40%).
Key the cache directory by a hash of the host's CPU flags so a machine
change silently starts a fresh cache instead of crashing.
"""

import hashlib
import os


def cache_dir(base: str = "/tmp/jax_cache") -> str:
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((l for l in f if l.startswith("flags")), "")
    except OSError:
        flags = ""
    h = hashlib.md5(flags.encode()).hexdigest()[:10]
    return f"{base}-{h}"


def enable(jax_module, min_compile_secs: float = 1.0) -> None:
    jax_module.config.update("jax_compilation_cache_dir", cache_dir())
    jax_module.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_secs
    )
