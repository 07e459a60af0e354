"""Native (C++) runtime core tests: behavioural equivalence with the Python
allocator, plus direct lane-bookkeeping API checks."""

import ctypes

import pytest

from adaptive_sd_tpu.core.exceptions import ResourceError
from adaptive_sd_tpu.engine.allocator import PageAllocator
from adaptive_sd_tpu.engine.native_bridge import (
    NativePageAllocator,
    load_native,
    make_page_allocator,
    native_available,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library not built (run native/build.sh)"
)


class TestNativeAllocator:
    def test_equivalence_with_python(self):
        """Drive both allocators through an identical op sequence."""
        py, nat = PageAllocator(32), NativePageAllocator(32)
        for alloc in (py, nat):
            assert len(alloc.alloc("a", 4)) == 4
            assert len(alloc.ensure("a", 6)) == 6
            assert len(alloc.ensure("b", 3)) == 3
            assert alloc.free_from("a", 2) == 4
            assert len(alloc.pages_of("a")) == 2
            assert alloc.free_request("b") == 3
        ps, ns = py.stats(), nat.stats()
        assert (ps.n_pages, ps.free_pages, ps.active_requests) == (
            ns.n_pages, ns.free_pages, ns.active_requests,
        )
        assert ps.peak_used == ns.peak_used

    def test_oom_raises_and_counts(self):
        nat = NativePageAllocator(4)
        nat.alloc("r", 3)
        with pytest.raises(ResourceError):
            nat.alloc("r2", 2)
        assert nat.stats().failed_allocs == 1
        # no partial allocation happened
        assert nat.stats().free_pages == 1

    def test_pages_are_unique(self):
        nat = NativePageAllocator(16)
        a = nat.alloc("a", 8)
        b = nat.alloc("b", 8)
        assert len(set(a) | set(b)) == 16

    def test_factory_prefers_native(self):
        alloc = make_page_allocator(8)
        assert isinstance(alloc, NativePageAllocator)
        alloc2 = make_page_allocator(8, prefer_native=False)
        assert isinstance(alloc2, PageAllocator)


class TestNativeLanes:
    def _lanes(self, n=4, page=16):
        lib = load_native()
        lib.asd_lanes_create.restype = ctypes.c_void_p
        lib.asd_lanes_step_prepare.restype = ctypes.c_int64
        return lib, ctypes.c_void_p(lib.asd_lanes_create(n, page))

    def test_admit_step_retire_cycle(self):
        lib, h = self._lanes()
        lane = lib.asd_lanes_admit(h, 10, 3, 42)  # position 10, budget 3, token 42
        assert lane == 0
        assert lib.asd_lanes_admit(h, 5, 2, 7) == 1

        finished = (ctypes.c_int32 * 4)()
        nf = ctypes.c_int64()
        active = (ctypes.c_int32 * 4)()
        toks = (ctypes.c_int32 * 4)()
        pos = (ctypes.c_int32 * 4)()
        needs = (ctypes.c_uint8 * 4)()
        na = lib.asd_lanes_step_prepare(h, -1, finished, ctypes.byref(nf), active, toks, pos, needs)
        assert na == 2 and nf.value == 0
        assert toks[0] == 42 and pos[0] == 10
        # advance lane 0 twice -> hits budget 3 (admission counted one)
        lib.asd_lanes_advance(h, 0, 43)
        lib.asd_lanes_advance(h, 0, 44)
        na = lib.asd_lanes_step_prepare(h, -1, finished, ctypes.byref(nf), active, toks, pos, needs)
        assert nf.value == 1 and finished[0] == 0
        assert na == 1 and active[0] == 1
        lib.asd_lanes_release(h, 0)
        assert lib.asd_lanes_admit(h, 0, 1, 1) == 0  # lane reusable

    def test_eos_detection(self):
        lib, h = self._lanes()
        lib.asd_lanes_admit(h, 4, 100, 99)
        finished = (ctypes.c_int32 * 4)()
        nf = ctypes.c_int64()
        active = (ctypes.c_int32 * 4)()
        toks = (ctypes.c_int32 * 4)()
        pos = (ctypes.c_int32 * 4)()
        needs = (ctypes.c_uint8 * 4)()
        na = lib.asd_lanes_step_prepare(h, 99, finished, ctypes.byref(nf), active, toks, pos, needs)
        assert nf.value == 1 and na == 0

    def test_page_boundary_flag(self):
        lib, h = self._lanes(page=16)
        lib.asd_lanes_admit(h, 15, 10, 5)  # next write at 15 -> crosses at 16
        finished = (ctypes.c_int32 * 4)()
        nf = ctypes.c_int64()
        active = (ctypes.c_int32 * 4)()
        toks = (ctypes.c_int32 * 4)()
        pos = (ctypes.c_int32 * 4)()
        needs = (ctypes.c_uint8 * 4)()
        lib.asd_lanes_step_prepare(h, -1, finished, ctypes.byref(nf), active, toks, pos, needs)
        assert needs[0] == 1
