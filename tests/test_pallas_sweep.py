"""Single-sweep DMA kernel (interpret mode) vs the stateless fused kernel."""

import numpy as np
import jax.numpy as jnp

from radiodsp_sdr_rx_tpu.ops import fir_design, nco, pallas_kernels
from radiodsp_sdr_rx_tpu.ops.pallas_sweep import sweep_mix_filter_demod

FS = 44117.64706


def test_sweep_matches_stateless(rng):
    c, n = 8, 4 * 4096
    mask = fir_design.design_filter_mask(300.0, 3000.0, FS)
    w = jnp.asarray(pallas_kernels.ssb_demod_operator(mask))
    iq = ((rng.standard_normal((c, n)) + 1j * rng.standard_normal((c, n)))
          .astype(np.complex64) * 0.2)
    incs = np.asarray([nco.freq_to_phase_inc(1000.0 * k, FS) for k in range(c)])
    ph0 = np.zeros(c, np.uint32)

    want = pallas_kernels.fused_mix_filter_demod(
        jnp.asarray(iq.real), jnp.asarray(iq.imag), jnp.asarray(incs), ph0, w,
        block_t=2048, interpret=True)
    got = sweep_mix_filter_demod(
        jnp.asarray(iq.real), jnp.asarray(iq.imag), jnp.asarray(incs), ph0, w,
        chunk_t=4096, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_sweep_chunk_invariance(rng):
    c, n = 8, 4 * 4096
    mask = fir_design.design_filter_mask(300.0, 3000.0, FS)
    w = jnp.asarray(pallas_kernels.ssb_demod_operator(mask))
    iq = ((rng.standard_normal((c, n)) + 1j * rng.standard_normal((c, n)))
          .astype(np.complex64) * 0.2)
    incs = np.full(c, nco.freq_to_phase_inc(5000.0, FS), np.uint32)
    a = sweep_mix_filter_demod(jnp.asarray(iq.real), jnp.asarray(iq.imag),
                               incs, np.zeros(c, np.uint32), w,
                               chunk_t=2048, interpret=True)
    b = sweep_mix_filter_demod(jnp.asarray(iq.real), jnp.asarray(iq.imag),
                               incs, np.zeros(c, np.uint32), w,
                               chunk_t=8192, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
