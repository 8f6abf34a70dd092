"""utils/hostmem.py: hugepage-backed numpy allocation."""

import numpy as np

from helfem_tpu.utils.hostmem import _THRESHOLD, huge_empty


def test_small_falls_back_to_plain_empty():
    a = huge_empty((8, 8))
    assert a.shape == (8, 8) and a.dtype == np.float64
    assert a.base is None  # plain np.empty owns its memory


def test_large_is_mmap_backed_and_writable():
    n = _THRESHOLD // 8 + 1024
    a = huge_empty((n,), np.float64)
    assert a.base is not None  # mmap-backed
    a[:: 4096 // 8] = 2.5
    assert a[0] == 2.5
    a2 = a.reshape(-1, 512)
    assert a2[0, 0] == 2.5


def test_dtype_and_multidim():
    shape = (3, _THRESHOLD // (8 * 3) + 7, 1)
    a = huge_empty(shape)
    assert a.shape == shape
    a[1, 5, 0] = -1.0
    assert a[1, 5, 0] == -1.0
