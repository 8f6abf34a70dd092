"""Global configuration: float64 discipline + persistent compile cache.

Everything in this suite lives or dies on f64 (the reference needs
stabilization tricks even *within* f64). We therefore enable jax x64 mode at
import time, before any arrays are created. A persistent compilation cache
under the repo amortizes the (observed minutes-long, occasionally flaky)
remote TPU compiles across processes.
"""

import os

import jax


def setup_x64() -> None:
    jax.config.update("jax_enable_x64", True)
    # Persistent compile cache, OPT-IN via HELFEM_TPU_CACHE=<dir>. Not enabled
    # by default: serialized executables from the experimental TPU plugin
    # were observed to wedge deserialization (a poisoned entry hangs every
    # subsequent process compiling the same program).
    cache = os.environ.get("HELFEM_TPU_CACHE", "")
    if cache:
        try:
            jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass
