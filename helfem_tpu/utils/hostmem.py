"""Host memory helpers: hugepage-backed numpy allocation.

This image's VM faults anonymous 4 KiB pages at ~15 s/GB on FIRST touch
(measured: writing one word per page of a fresh 2 GB np.empty costs 30 s,
the same touch on a reused arena 0.5 s) -- so building the multi-GB
diatomic TEI tables was dominated not by quadrature or GEMMs but by the
kernel's page-fault path. Advising the mapping with MADV_HUGEPAGE before
the first touch (transparent_hugepage is in `madvise` mode here) cuts the
fault count 512x: the same 2 GB first-touch takes 1.0 s.

`huge_empty` returns an uninitialized numpy array backed by an anonymous
mmap advised for hugepages; small requests and platforms without madvise
fall back to plain np.empty.
"""

import ctypes
import ctypes.util
import mmap

import numpy as np

_MADV_HUGEPAGE = 14  # linux/mman.h
_THRESHOLD = 64 << 20  # advise only allocations >= 64 MB

_libc = None


def _get_libc():
    global _libc
    if _libc is None:
        try:
            _libc = ctypes.CDLL(ctypes.util.find_library("c"), use_errno=True)
        except Exception:
            _libc = False
    return _libc


def huge_empty(shape, dtype=np.float64):
    """np.empty(shape, dtype) backed by a MADV_HUGEPAGE anonymous mmap.

    The mmap object stays alive as the array's .base. Falls back to
    np.empty for small sizes or when madvise is unavailable.
    """
    dtype = np.dtype(dtype)
    nbytes = int(np.prod(shape)) * dtype.itemsize
    if nbytes < _THRESHOLD:
        return np.empty(shape, dtype)
    libc = _get_libc()
    if not libc or not hasattr(mmap, "mmap"):
        return np.empty(shape, dtype)
    try:
        buf = mmap.mmap(-1, nbytes)
        addr = ctypes.addressof(ctypes.c_char.from_buffer(buf))
        libc.madvise(
            ctypes.c_void_p(addr), ctypes.c_size_t(nbytes), _MADV_HUGEPAGE
        )
        return np.frombuffer(buf, dtype=dtype).reshape(shape)
    except Exception:
        return np.empty(shape, dtype)
