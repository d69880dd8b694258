"""Machine-keyed persistent compile cache.

XLA:CPU AOT artifacts encode the compile machine's CPU feature set; loading
them on a host with different features can SIGILL/segfault (observed: the
round driver migrating boxes mid-build crashed the test suite at ~40%).
A flags-only hash proved insufficient — fleet hosts can share the cpuinfo
``flags`` line yet still produce artifacts that SIGABRT at execute time on
each other (observed round 2: a cached shard_map executable for an
UNCHANGED program aborted inside the first run after a box migration).
Key by the full CPU identity (model name, stepping, microcode, flags)
plus the jaxlib version, so any of those changing silently starts a fresh
cache instead of crashing.

Set ``QLORA_COMPILE_CACHE=0`` to disable the persistent cache entirely
(diagnostic kill-switch: a crash that disappears with the cache off is a
stale/foreign artifact — wipe ``/tmp/jax_cache-*``).
"""

import hashlib
import os


def _cpu_identity() -> str:
    ident = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":", 1)[0].strip()
                if key in ("model name", "stepping", "microcode", "flags"):
                    ident.append(line.strip())
                if len(ident) == 4:
                    break
    except OSError:
        pass
    return "\n".join(ident)


def cache_dir(base: str = "/tmp/jax_cache", backend: str = "cpu") -> str:
    try:
        import jaxlib

        ver = getattr(jaxlib, "__version__", "?")
    except Exception:  # pragma: no cover - jaxlib always present
        ver = "?"
    if backend != "cpu":
        # TPU executables do not encode host-CPU features, so keying by CPU
        # identity would only throw the cache away on every driver host
        # migration (observed round 2: fleet boxes rotate mid-round).  Key
        # by accelerator kind + jaxlib instead — portable across hosts,
        # still invalidated by toolchain or hardware changes.
        try:
            import jax

            kind = jax.devices()[0].device_kind
        except Exception:  # pragma: no cover - device probe race
            kind = backend
        h = hashlib.md5(f"dev={kind}|jaxlib={ver}".encode()).hexdigest()[:10]
        return f"{base}-{h}"
    h = hashlib.md5(f"{_cpu_identity()}|jaxlib={ver}".encode()).hexdigest()[:10]
    return f"{base}-{h}"


def enable(jax_module, min_compile_secs: float = 1.0) -> None:
    if os.environ.get("QLORA_COMPILE_CACHE", "1") == "0":
        return
    try:
        backend = jax_module.default_backend()
    except Exception:  # pragma: no cover - backend init failure
        backend = "cpu"
    if backend == "cpu":
        # XLA:CPU AOT deserialization is UNSAFE on this host class: the
        # loader itself warns "Machine type used for compilation doesn't
        # match the machine type for execution ... could lead to SIGILL"
        # when re-loading artifacts the SAME box wrote (pseudo-features
        # like +prefer-no-scatter never appear in the host feature probe),
        # and full-suite runs reproducibly SIGABRT inside cached shard_map
        # executables.  Tests pay a cold compile instead of dying randomly;
        # the TPU cache (where recompiles cost 20-40 s each) stays on.
        return
    jax_module.config.update(
        "jax_compilation_cache_dir", cache_dir(backend=backend)
    )
    jax_module.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_secs
    )
