"""Pallas tri-plane gather kernel == XLA sampling path (interpret mode).

The kernel itself targets TPU; on the CPU test mesh it runs through the
pallas interpreter, which checks the index/weight math and the kernel's
memory discipline against the production XLA path bit-for-bit-ish.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myslam_tpu.models.planes import make_layout
from myslam_tpu.ops.plane_sample import pack_quad, sample_quad_reduced

pallas_sample = pytest.importorskip("myslam_tpu.ops.pallas_sample")


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pallas_sample.pl, "pallas_call", interp)


def test_pallas_vmem_matches_xla_path():
    layout = make_layout(
        jnp.asarray([[-1.9, 7.94], [-2.2, 4.52], [-2.5, 2.54]]),
        [0.48, 0.24], 8)
    rng = np.random.default_rng(0)
    atlas = jnp.asarray(
        rng.normal(size=(layout.total_rows, 8)).astype(np.float32))
    p_nor = jnp.asarray(
        rng.uniform(-1.05, 1.05, size=(700, 3)).astype(np.float32))
    quad = pack_quad(atlas, layout)
    ref = np.asarray(sample_quad_reduced(quad, layout, p_nor))

    idx, wx, wy = pallas_sample.plane_indices_and_fracs(layout, p_nor)
    fn = pallas_sample.make_sample_quad_pallas_vmem(
        layout, 700, tile=256, atlas_dtype=jnp.float32)
    out = np.asarray(fn(quad, idx, wx, wy))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_pallas_dma_matches_xla_path():
    """The manual-DMA gather kernel (the variant that still lowers on
    the current Mosaic toolchain; measured on the real chip with exact
    parity at 160 k points) — interpret-mode math check here."""
    layout = make_layout(
        jnp.asarray([[-1.9, 7.94], [-2.2, 4.52], [-2.5, 2.54]]),
        [0.48, 0.24], 8)
    rng = np.random.default_rng(1)
    atlas = jnp.asarray(
        rng.normal(size=(layout.total_rows, 8)).astype(np.float32))
    p_nor = jnp.asarray(
        rng.uniform(-1.05, 1.05, size=(700, 3)).astype(np.float32))
    quad = pack_quad(atlas, layout)
    ref = np.asarray(sample_quad_reduced(quad, layout, p_nor))

    idx, wx, wy = pallas_sample.plane_indices_and_fracs(layout, p_nor)
    fn = pallas_sample.make_sample_quad_pallas_dma(layout, 700, tile=64)
    out = np.asarray(fn(quad, idx, wx, wy))
    np.testing.assert_allclose(out, ref, atol=1e-4)
