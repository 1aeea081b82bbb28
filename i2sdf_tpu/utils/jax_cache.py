"""Persistent-compilation-cache setup, keyed per host CPU.

XLA:CPU AOT executables embed the compile host's machine features
(avx512*, amx-*, prefer-no-scatter, ...). This environment's VM moves
between hosts across sessions, and loading a cache entry compiled on a
richer host crashes natively — observed as a SIGILL-class abort inside
Eigen's thread pool that killed CLI subprocesses whenever a stale
``~/.jax_cache`` entry matched (XLA itself only logs "This could lead
to execution errors such as SIGILL" and loads anyway). Keying the cache
directory by a hash of /proc/cpuinfo flags makes entries host-local;
a new host simply starts a fresh subdir instead of loading poison.
"""

from __future__ import annotations

import hashlib
import os
import platform


def host_signature() -> str:
    """Short stable hash of this host's CPU feature flags + jaxlib.

    The jaxlib version is part of the key because XLA:CPU embeds
    version-dependent codegen PREFERENCES (prefer-no-scatter/gather)
    in the AOT machine-feature list too — two hosts with identical
    cpuinfo but different jaxlib builds cross-load each other's entries
    and log feature-mismatch warnings (seen round 4)."""
    flags = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = line.strip()
                    break
    except OSError:
        pass
    try:
        import jaxlib

        flags += f"|jaxlib-{jaxlib.__version__}"
    except Exception:
        pass
    return hashlib.sha1(flags.encode()).hexdigest()[:10]


def set_compilation_cache(base: str | None = None) -> str:
    """Point jax's persistent compilation cache at a per-host subdir of
    `base` (default: $JAX_COMPILATION_CACHE_DIR or ~/.jax_cache).
    Safe to call any time before the first compilation. Returns the
    directory used."""
    if base is None:
        base = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                              os.path.join("~", ".jax_cache"))
    path = os.path.join(os.path.expanduser(base),
                        f"host-{host_signature()}")
    try:
        os.makedirs(path, exist_ok=True)
    except OSError as e:
        # the cache is an optimization: an unwritable location (read-only
        # $HOME, restricted CI) must not abort the entry point
        print(f"[WARN] compilation cache disabled ({e})")
        return ""
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    return path
