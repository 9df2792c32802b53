"""Host utility tests (reference: testUtils.cpp style)."""

import numpy as np

from dpgo_tpu.utils import SimpleTimer, write_matrix_to_file


def test_simple_timer():
    t = SimpleTimer()
    t.tic()
    ms = t.toc()
    assert ms >= 0.0
    t0 = SimpleTimer.Tic()
    assert SimpleTimer.Toc(t0) >= 0.0


def test_write_matrix(tmp_path):
    M = np.random.default_rng(0).standard_normal((3, 4))
    path = str(tmp_path / "m.csv")
    write_matrix_to_file(M, path)
    M2 = np.loadtxt(path, delimiter=",")
    np.testing.assert_allclose(M, M2, atol=1e-15)


def test_log_check_and_enable():
    """glog-style logging shim (reference: glog LOG/CHECK usage, SURVEY §5.5):
    CHECK raises with the message; enable() is idempotent."""
    import logging

    import pytest as _pytest

    from dpgo_tpu import log

    log.check(True, "fine")
    with _pytest.raises(AssertionError, match="CHECK failed: bad thing 7"):
        log.check(False, "bad thing %d", 7)
    log.enable(logging.DEBUG)
    log.enable(logging.INFO)  # idempotent: still exactly one stderr handler
    handlers = [h for h in log.logger.handlers
                if getattr(h, "_dpgo_stderr", False)]
    assert len(handlers) == 1
