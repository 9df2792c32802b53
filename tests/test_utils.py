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
