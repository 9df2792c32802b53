"""Pallas CSR segment-sum kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpgo_tpu.ops import pallas_segsum as ps


@pytest.mark.parametrize(
    "n,m,w,tr,ch",
    [
        (1000, 2600, 20, 128, 256),
        (517, 1399, 9, 64, 128),
        (100, 5, 12, 32, 64),
        (4096, 4096, 20, 256, 512),
        (37, 200, 4, 8, 128),
    ],
)
def test_segsum_matches_scatter(n, m, w, tr, ch):
    rng = np.random.default_rng(n + m)
    dest = np.sort(rng.integers(0, n, m)).astype(np.int32)
    C = rng.standard_normal((m, w)).astype(np.float32)
    plan = ps.make_segsum_plan(dest, n, tile_rows=tr, chunk=ch)
    ref = np.asarray(ps.segment_sum_xla(jnp.asarray(C), plan))
    out = np.asarray(ps.segment_sum_csr(jnp.asarray(C), plan, interpret=True))
    np.testing.assert_allclose(out, ref, atol=5e-5)


def test_segsum_hotspot_and_empty_segments():
    rng = np.random.default_rng(7)
    n, m, w = 500, 1000, 8
    # all contributions to one row; most rows empty
    dest = np.full(m, 123, np.int32)
    C = rng.standard_normal((m, w)).astype(np.float32)
    plan = ps.make_segsum_plan(dest, n, tile_rows=64, chunk=128)
    ref = np.asarray(ps.segment_sum_xla(jnp.asarray(C), plan))
    out = np.asarray(ps.segment_sum_csr(jnp.asarray(C), plan, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_segsum_rejects_unsorted():
    with pytest.raises(AssertionError):
        ps.make_segsum_plan(np.array([3, 1, 2], np.int32), 10)
