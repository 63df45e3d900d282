"""_Fetch grace auto-calibration (parallel/engine.py).

The GIL-free grace sleep before np.asarray is sized from an
effective-D2H-bandwidth estimate that must CONVERGE from the conservative
20 MB/s default toward the real link speed — no hardcoded constant may
set a latency floor on fast local links (round-3 review item). These
tests drive the estimator with fake arrays simulating a fast link
(instant asarray) and a slow one (blocking asarray).
"""

import time

import numpy as np

from genefuserust_tpu.parallel.engine import _Fetch


class _FakeArr:
    """Mimics the jax.Array surface _Fetch touches."""

    def __init__(self, nbytes, asarray_block_s=0.0):
        self.nbytes = nbytes
        self._block = asarray_block_s
        self._np = np.zeros(max(1, nbytes // 8), np.int64)

    def is_ready(self):
        return True

    def copy_to_host_async(self):
        pass

    def __array__(self, dtype=None, copy=None):
        if self._block:
            time.sleep(self._block)
        return self._np if dtype is None else self._np.astype(dtype)


def test_fast_link_raises_estimate(monkeypatch):
    monkeypatch.setattr(_Fetch, "_BPS_PINNED", False)
    monkeypatch.setattr(_Fetch, "_bps", 20e6)
    for _ in range(3):
        _Fetch(_FakeArr(1 << 20)).get()  # instant asarray: link outran grace
    assert _Fetch._bps > 20e6 * 1.5  # 1.25^3 ~= 1.95


def test_slow_link_lowers_estimate(monkeypatch):
    monkeypatch.setattr(_Fetch, "_BPS_PINNED", False)
    monkeypatch.setattr(_Fetch, "_bps", 1e9)
    _Fetch(_FakeArr(1 << 20, asarray_block_s=0.1)).get()
    # the blocked asarray bounds achieved bandwidth: ~1MB / ~0.1s
    assert _Fetch._bps < 50e6


def test_tiny_fetches_do_not_calibrate(monkeypatch):
    monkeypatch.setattr(_Fetch, "_BPS_PINNED", False)
    monkeypatch.setattr(_Fetch, "_bps", 20e6)
    for _ in range(3):
        _Fetch(_FakeArr(1024)).get()
    assert _Fetch._bps == 20e6


def test_pinned_estimate_stays(monkeypatch):
    monkeypatch.setattr(_Fetch, "_BPS_PINNED", True)
    monkeypatch.setattr(_Fetch, "_bps", 20e6)
    _Fetch(_FakeArr(1 << 20)).get()
    assert _Fetch._bps == 20e6
