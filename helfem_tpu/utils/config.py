"""Global configuration: float64 discipline + persistent compile cache.

Everything in this suite lives or dies on f64 (the reference needs
stabilization tricks even *within* f64). We therefore enable jax x64 mode at
import time, before any arrays are created. A persistent compilation cache
amortizes the (observed minutes-long) compiles across processes.
"""

import atexit
import os
import shutil

import jax


def _default_cache_dir() -> str:
    base = os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache"))
    return os.path.join(base, "helfem_tpu", "jax_cache")


def _host_fingerprint() -> str:
    """Short hash of the host CPU feature set. XLA:CPU AOT results encode
    the *compile-time* machine features; its loader accepts a mismatched
    host with only a warning and the executed code can then SIGILL (seen
    when this VM image moved to a host without avx512 prefer-no-scatter).
    Keying the cache path on the feature set makes entries from another
    host invisible instead of fatal."""
    import hashlib

    feats = ""
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        import platform

        feats = platform.machine() + platform.processor()
    return hashlib.sha1(feats.encode()).hexdigest()[:10]


def setup_x64() -> None:
    jax.config.update("jax_enable_x64", True)
    # Persistent compile cache. HELFEM_TPU_CACHE=<dir> forces a location,
    # HELFEM_TPU_CACHE=0 disables. Default: ON for every backend (XDG cache
    # dir, per-backend subdirectory) -- including the axon TPU plugin since
    # round 5: the round-3-era hang on deserializing cached axon
    # executables no longer reproduces (measured on chip 2026-08-21: a
    # cold eigh compile through the remote compile service took 588 s; the
    # next process served it from this cache in 26.7 s total including
    # device init, no hang, repeated cleanly). Given the 60-600 s remote
    # compile walls, the cache is the difference between a usable and an
    # unusable cold-start experience on this hardware.
    #
    # The canary file still guards the historical poisoned-entry failure
    # mode: it is written at startup and removed at clean interpreter
    # exit, so a run killed mid-hang leaves it behind and the next startup
    # WIPES the axon cache before enabling it.
    cache = os.environ.get("HELFEM_TPU_CACHE", "")
    if cache == "0":
        return
    axon = bool(os.environ.get("PALLAS_AXON_POOL_IPS"))
    root = os.path.abspath(cache) if cache else _default_cache_dir()
    # per-backend AND per-host-CPU subdirectory (see _host_fingerprint)
    sub = "axon" if axon else "cpu-" + _host_fingerprint()
    path = os.path.join(root, sub)
    try:
        os.makedirs(path, exist_ok=True)
        if axon:
            canary = os.path.join(path, ".unclean_exit")
            if os.path.exists(canary):
                try:
                    pid = int(open(canary).read().strip() or "0")
                except ValueError:
                    pid = 0
                alive = pid > 0 and os.path.exists(f"/proc/{pid}")
                if not alive:
                    # previous run died with the cache enabled: assume a
                    # poisoned entry and start fresh
                    shutil.rmtree(path, ignore_errors=True)
                    os.makedirs(path, exist_ok=True)
            with open(canary, "w") as fh:
                fh.write(str(os.getpid()))
            atexit.register(lambda: os.path.exists(canary) and os.remove(canary))
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
