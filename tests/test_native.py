"""Native (C++) kernel vs numpy-path equivalence."""

import numpy as np
import pytest

from helfem_tpu.ops.fem import FEMBasis
from helfem_tpu.ops.grids import get_grid
from helfem_tpu.ops.polynomials import get_basis
from helfem_tpu.ops.radial import RadialBasis
from helfem_tpu.utils import native


def test_tei_native_matches_numpy(monkeypatch):
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable")
    poly = get_basis(4, 8)
    fem = FEMBasis(poly, get_grid(20.0, 4, 4, 2.0))
    rb = RadialBasis(fem, 40)
    monkeypatch.setenv("HELFEM_NATIVE", "1")
    out_native = rb.twoe_integral(4)
    monkeypatch.setenv("HELFEM_NATIVE", "0")
    out_np = rb.twoe_integral(4)
    assert np.abs(out_native - out_np).max() < 1e-13 * max(1.0, np.abs(out_np).max())
