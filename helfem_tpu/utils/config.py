"""Global configuration: float64 discipline.

Everything in this suite lives or dies on f64 (the reference needs
stabilization tricks even *within* f64). We therefore enable jax x64 mode at
import time, before any arrays are created.
"""

import jax


def setup_x64() -> None:
    jax.config.update("jax_enable_x64", True)
