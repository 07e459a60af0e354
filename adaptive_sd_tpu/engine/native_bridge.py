"""ctypes bridge to the native runtime core (native/libasd_native.so).

Provides ``NativePageAllocator`` — API-compatible with
engine.allocator.PageAllocator — backed by the C++ free-list allocator.
``load_native()`` returns None when the library isn't built; callers fall
back to the Python implementation (identical behaviour, tests/test_native.py
asserts the equivalence).
"""

from __future__ import annotations

import ctypes
import pathlib
from typing import Optional

from ..core.exceptions import ResourceError
from .allocator import AllocatorStats

_LIB_PATH = pathlib.Path(__file__).resolve().parents[2] / "native" / "libasd_native.so"
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def load_native() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not _LIB_PATH.exists():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        _load_failed = True
        return None
    lib.asd_alloc_create.restype = ctypes.c_void_p
    lib.asd_alloc_create.argtypes = [ctypes.c_int64]
    lib.asd_alloc_destroy.argtypes = [ctypes.c_void_p]
    lib.asd_alloc_pages.restype = ctypes.c_int64
    lib.asd_alloc_pages.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
    ]
    lib.asd_alloc_ensure.restype = ctypes.c_int64
    lib.asd_alloc_ensure.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
    ]
    lib.asd_alloc_free_from.restype = ctypes.c_int64
    lib.asd_alloc_free_from.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64]
    lib.asd_alloc_free_request.restype = ctypes.c_int64
    lib.asd_alloc_free_request.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.asd_alloc_stats.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64)]
    lib.asd_lanes_create.restype = ctypes.c_void_p
    lib.asd_lanes_create.argtypes = [ctypes.c_int64, ctypes.c_int64]
    lib.asd_lanes_destroy.argtypes = [ctypes.c_void_p]
    lib.asd_lanes_admit.restype = ctypes.c_int64
    lib.asd_lanes_admit.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
    ]
    lib.asd_lanes_release.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.asd_lanes_step_prepare.restype = ctypes.c_int64
    lib.asd_lanes_step_prepare.argtypes = [
        ctypes.c_void_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.asd_lanes_advance.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32]
    _lib = lib
    return _lib


def native_available() -> bool:
    return load_native() is not None


class NativePageAllocator:
    """Drop-in replacement for engine.allocator.PageAllocator."""

    def __init__(self, n_pages: int) -> None:
        if n_pages <= 0:
            raise ValueError("n_pages must be positive")
        lib = load_native()
        if lib is None:
            raise RuntimeError(
                f"native library not built; run native/build.sh (expected {_LIB_PATH})"
            )
        self._lib = lib
        self.n_pages = n_pages
        self._h = lib.asd_alloc_create(n_pages)
        if not self._h:
            raise RuntimeError("native allocator creation failed")
        self._known: set[str] = set()

    def __del__(self) -> None:  # pragma: no cover - gc timing
        h = getattr(self, "_h", None)
        if h:
            self._lib.asd_alloc_destroy(h)
            self._h = None

    def alloc(self, request_id: str, n: int) -> list[int]:
        buf = (ctypes.c_int32 * max(n, 1))()
        got = self._lib.asd_alloc_pages(self._h, request_id.encode(), n, buf)
        if got < 0:
            raise ResourceError(
                f"out of KV pages: need {n} (native)", details={"request_id": request_id}
            )
        self._known.add(request_id)
        return list(buf[:got])

    def ensure(self, request_id: str, n_total: int) -> list[int]:
        cap = max(n_total, 1) * 2 + 8
        buf = (ctypes.c_int32 * cap)()
        got = self._lib.asd_alloc_ensure(self._h, request_id.encode(), n_total, buf, cap)
        if got == -1:
            raise ResourceError(
                f"out of KV pages: ensure {n_total} (native)",
                details={"request_id": request_id},
            )
        if got == -2:  # capacity raced upward; retry with a bigger buffer
            cap = self.n_pages
            buf = (ctypes.c_int32 * cap)()
            got = self._lib.asd_alloc_ensure(self._h, request_id.encode(), n_total, buf, cap)
            if got < 0:
                raise ResourceError("native ensure failed", details={"code": int(got)})
        self._known.add(request_id)
        return list(buf[:got])

    def pages_of(self, request_id: str) -> list[int]:
        if request_id not in self._known:
            return []  # avoid creating phantom entries in the C++ map
        return self.ensure(request_id, 0)

    def free_from(self, request_id: str, keep: int) -> int:
        return int(self._lib.asd_alloc_free_from(self._h, request_id.encode(), keep))

    def free_request(self, request_id: str) -> int:
        self._known.discard(request_id)
        return int(self._lib.asd_alloc_free_request(self._h, request_id.encode()))

    def stats(self) -> AllocatorStats:
        out = (ctypes.c_int64 * 5)()
        self._lib.asd_alloc_stats(self._h, out)
        return AllocatorStats(
            n_pages=int(out[0]),
            free_pages=int(out[1]),
            active_requests=int(out[2]),
            peak_used=int(out[3]),
            failed_allocs=int(out[4]),
        )


class NativeLanes:
    """C++ lane bookkeeping for the continuous-batching scheduler: dense
    per-lane (busy, position, generated, budget, next_token) state with a
    single-pass step_prepare scan (native/allocator.cc asd_lanes_*)."""

    def __init__(self, n_lanes: int, page_size: int) -> None:
        lib = load_native()
        if lib is None:
            raise RuntimeError("native library not built; run native/build.sh")
        self._lib = lib
        self.n = n_lanes
        self._h = lib.asd_lanes_create(n_lanes, page_size)
        if not self._h:
            raise RuntimeError("native lanes creation failed")

    def __del__(self) -> None:  # pragma: no cover - gc timing
        h = getattr(self, "_h", None)
        if h:
            self._lib.asd_lanes_destroy(h)
            self._h = None

    def admit(self, position: int, budget: int, next_token: int) -> int:
        """Claim the lowest free lane (same order as the Python scheduler's
        free-list scan); returns lane id or -1."""
        return int(self._lib.asd_lanes_admit(self._h, position, budget, next_token))

    def release(self, lane: int) -> None:
        self._lib.asd_lanes_release(self._h, lane)

    def step_prepare(self, eos: Optional[int]):
        """One scan: returns (finished_lanes, active_lanes, tokens, positions,
        needs_pages) — the per-step bookkeeping the Python path does in a
        loop."""
        n = self.n
        finished = (ctypes.c_int32 * n)()
        nf = ctypes.c_int64(0)
        active = (ctypes.c_int32 * n)()
        tokens = (ctypes.c_int32 * n)()
        positions = (ctypes.c_int32 * n)()
        needs = (ctypes.c_uint8 * n)()
        na = int(
            self._lib.asd_lanes_step_prepare(
                self._h, -1 if eos is None else eos, finished,
                ctypes.byref(nf), active, tokens, positions, needs,
            )
        )
        f = list(finished[: nf.value])
        return (
            f,
            list(active[:na]),
            list(tokens[:na]),
            list(positions[:na]),
            list(needs[:na]),
        )

    def advance(self, lane: int, token: int) -> None:
        self._lib.asd_lanes_advance(self._h, lane, token)


def make_lanes(n_lanes: int, page_size: int, prefer_native: bool = True):
    """Factory: native lane bookkeeping when built, None otherwise (the
    scheduler then uses its Python scan)."""
    if prefer_native and native_available():
        return NativeLanes(n_lanes, page_size)
    return None


def make_page_allocator(n_pages: int, prefer_native: bool = True):
    """Factory: native allocator when built, Python otherwise."""
    if prefer_native and native_available():
        return NativePageAllocator(n_pages)
    from .allocator import PageAllocator

    return PageAllocator(n_pages)
