"""Pallas fused-kernel tests (interpret mode on CPU) vs the XLA chain."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radiodsp_sdr_rx_tpu.models.config import DemodMode, ReceiverConfig
from radiodsp_sdr_rx_tpu.models.receiver import build_params
from radiodsp_sdr_rx_tpu.ops import demod, fastconv, fir_design, nco, pallas_kernels
from radiodsp_sdr_rx_tpu.utils import siggen

FS = 44117.64706


def _iq(rng, c, n):
    return ((rng.standard_normal((c, n)) + 1j * rng.standard_normal((c, n)))
            .astype(np.complex64) * 0.2)


def test_fused_mix_filter_demod_matches_xla(rng):
    c, n = 8, 8192
    cfg = ReceiverConfig(mode=DemodMode.USB, vfo_freq=7_060_000.0,
                         capture_center_freq=7_050_000.0)
    mask = fir_design.design_filter_mask(*cfg.iq_band, FS)
    w = jnp.asarray(pallas_kernels.ssb_demod_operator(mask))
    w_full = jnp.asarray(fir_design.overlap_save_matrix_real(mask))

    iq = _iq(rng, c, n)
    incs = np.full(c, nco.freq_to_phase_inc(10_000.0, FS), np.uint32)
    phase0 = np.zeros(c, np.uint32)

    audio_pl = pallas_kernels.fused_mix_filter_demod(
        jnp.asarray(iq.real), jnp.asarray(iq.imag),
        jnp.asarray(incs), jnp.asarray(phase0), w, interpret=True,
    )

    # XLA reference: per-channel mix -> overlap-save -> ssb demod
    outs = []
    for k in range(c):
        z, _ = nco.nco_mix(jnp.asarray(iq[k]), np.uint32(0), incs[k])
        z, _ = fastconv.overlap_save_filter(z, w_full, jnp.zeros(128, jnp.complex64))
        outs.append(np.asarray(demod.demod_ssb(z)))
    audio_x = np.stack(outs)
    np.testing.assert_allclose(np.asarray(audio_pl), audio_x, atol=3e-5)


def test_fused_kernel_multi_time_blocks(rng):
    """Tail scratch carries across sequential time-grid steps."""
    c, n = 8, 4 * 2048
    mask = fir_design.design_filter_mask(300.0, 3000.0, FS)
    w = jnp.asarray(pallas_kernels.ssb_demod_operator(mask))
    w_full = jnp.asarray(fir_design.overlap_save_matrix_real(mask))
    iq = _iq(rng, c, n)
    incs = np.full(c, nco.freq_to_phase_inc(5_000.0, FS), np.uint32)

    audio_pl = pallas_kernels.fused_mix_filter_demod(
        jnp.asarray(iq.real), jnp.asarray(iq.imag),
        jnp.asarray(incs), np.zeros(c, np.uint32), w,
        block_t=2048, interpret=True,
    )
    z, _ = nco.nco_mix(jnp.asarray(iq[3]), np.uint32(0), incs[3])
    z, _ = fastconv.overlap_save_filter(z, w_full, jnp.zeros(128, jnp.complex64))
    np.testing.assert_allclose(np.asarray(audio_pl[3]),
                               np.asarray(demod.demod_ssb(z)), atol=3e-5)


def test_multi_channel_blocks(rng):
    """Channel grid dim: tails reset per channel block (ti==0 reinit)."""
    c, n = 16, 2048
    mask = fir_design.design_filter_mask(300.0, 3000.0, FS)
    w = jnp.asarray(pallas_kernels.ssb_demod_operator(mask))
    iq = _iq(rng, c, n)
    incs = np.asarray([nco.freq_to_phase_inc(1000.0 * k, FS) for k in range(c)])
    audio = pallas_kernels.fused_mix_filter_demod(
        jnp.asarray(iq.real), jnp.asarray(iq.imag),
        jnp.asarray(incs), np.zeros(c, np.uint32), w,
        block_c=8, interpret=True,
    )
    # channel 12 independently
    one = pallas_kernels.fused_mix_filter_demod(
        jnp.asarray(iq.real[12:13].repeat(8, 0)), jnp.asarray(iq.imag[12:13].repeat(8, 0)),
        jnp.asarray(incs[12:13].repeat(8, 0)), np.zeros(8, np.uint32), w,
        block_c=8, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(audio[12]), np.asarray(one[0]), atol=1e-5)


def test_pbt_filter_matches_xla(rng):
    c, n = 8, 2 * 2048
    mask = fir_design.design_filter_mask(300.0, 4000.0, FS)
    w = jnp.asarray(pallas_kernels.pbt_operator(mask))
    w_full = jnp.asarray(fir_design.overlap_save_matrix_real(mask))
    audio = rng.standard_normal((c, n)).astype(np.float32) * 0.3

    l_pl, r_pl = pallas_kernels.pbt_filter(jnp.asarray(audio), w, interpret=True)

    za = jax.lax.complex(jnp.asarray(audio), jnp.asarray(audio))
    za, _ = fastconv.overlap_save_filter(za, w_full, jnp.zeros((c, 128), jnp.complex64))
    np.testing.assert_allclose(np.asarray(l_pl), np.asarray(za.real), atol=3e-5)
    np.testing.assert_allclose(np.asarray(r_pl), np.asarray(za.imag), atol=3e-5)


def test_operators_shapes():
    mask = fir_design.design_filter_mask(300.0, 3000.0, FS)
    assert pallas_kernels.ssb_demod_operator(mask).shape == (512, 128)
    assert pallas_kernels.pbt_operator(mask).shape == (256, 256)
