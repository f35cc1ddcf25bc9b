"""Planar f32 ops == complex-typed oracles (the device layout vs the CPU
reference implementations)."""

import numpy as np
import jax
import jax.numpy as jnp

from radiodsp_sdr_rx_tpu.ops import (
    demod, fastconv, fir_design, nco, pallas_kernels, planar, spectral_sub,
)
from radiodsp_sdr_rx_tpu.ops.noise_blanker import noise_blanker as nb_complex
from radiodsp_sdr_rx_tpu.utils import siggen

FS = 44117.64706


def _sig(rng, n):
    return ((rng.standard_normal(n) + 1j * rng.standard_normal(n))
            .astype(np.complex64) * 0.3)


def test_nco_planar_matches_complex(rng):
    x = _sig(rng, 4096)
    inc = nco.freq_to_phase_inc(1234.5, FS)
    zc, ph_c = nco.nco_mix(jnp.asarray(x), np.uint32(7), inc)
    yr, yi, ph_p = planar.nco_mix_planar(jnp.asarray(x.real), jnp.asarray(x.imag),
                                         np.uint32(7), inc)
    np.testing.assert_allclose(np.asarray(yr), np.asarray(zc.real), atol=1e-6)
    np.testing.assert_allclose(np.asarray(yi), np.asarray(zc.imag), atol=1e-6)
    assert int(ph_p) == int(ph_c)


def test_overlap_save_planar_matches_complex(rng):
    mask = fir_design.design_filter_mask(300.0, 3000.0, FS)
    w = jnp.asarray(fir_design.overlap_save_matrix_real(mask))
    x = _sig(rng, 2048)
    tail = _sig(rng, 128)
    yc, _ = fastconv.overlap_save_filter(jnp.asarray(x), w, jnp.asarray(tail))
    yr, yi, tr, ti = planar.overlap_save_filter_planar(
        jnp.asarray(x.real), jnp.asarray(x.imag), w,
        jnp.asarray(tail.real), jnp.asarray(tail.imag))
    np.testing.assert_allclose(np.asarray(yr), np.asarray(yc.real), atol=1e-5)
    np.testing.assert_allclose(np.asarray(yi), np.asarray(yc.imag), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tr), x.real[-128:], atol=0)


def test_ssb_fused_operator_matches_two_step(rng):
    mask = fir_design.design_filter_mask(300.0, 3000.0, FS)
    w_full = jnp.asarray(fir_design.overlap_save_matrix_real(mask))
    w_ssb = jnp.asarray(pallas_kernels.ssb_demod_operator(mask))
    x = _sig(rng, 2048)
    zc, _ = fastconv.overlap_save_filter(jnp.asarray(x), w_full,
                                         jnp.zeros(128, jnp.complex64))
    want = np.asarray(demod.demod_ssb(zc))
    got, _, _ = planar.ssb_filter_demod_planar(
        jnp.asarray(x.real), jnp.asarray(x.imag), w_ssb,
        jnp.zeros(128, jnp.float32), jnp.zeros(128, jnp.float32))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_pbt_planar_matches_complex(rng):
    mask = fir_design.design_filter_mask(300.0, 4000.0, FS)
    w_full = jnp.asarray(fir_design.overlap_save_matrix_real(mask))
    w_pbt = jnp.asarray(pallas_kernels.pbt_operator(mask))
    a = rng.standard_normal(2048).astype(np.float32) * 0.3
    za = jax.lax.complex(jnp.asarray(a), jnp.asarray(a))
    zc, _ = fastconv.overlap_save_filter(za, w_full, jnp.zeros(128, jnp.complex64))
    l, r, _ = planar.pbt_filter_planar(jnp.asarray(a), w_pbt,
                                       jnp.zeros(128, jnp.float32))
    np.testing.assert_allclose(np.asarray(l), np.asarray(zc.real), atol=2e-5)
    np.testing.assert_allclose(np.asarray(r), np.asarray(zc.imag), atol=2e-5)


def test_am_planar_matches_complex(rng):
    z = siggen.am_signal(8192, 0.0, mod_hz=700.0, fs=FS)
    ac, _ = demod.demod_am(jnp.asarray(z), jnp.zeros(2, jnp.float32))
    ap, _ = planar.demod_am_planar(jnp.asarray(z.real), jnp.asarray(z.imag),
                                   jnp.zeros(2, jnp.float32))
    np.testing.assert_allclose(np.asarray(ap), np.asarray(ac), atol=1e-5)


def test_sam_planar_matches_complex():
    z = siggen.am_signal(16384, 30.0, mod_hz=700.0, fs=FS)
    ac, stc = demod.demod_sam(jnp.asarray(z), demod.sam_init(), sample_rate=FS)
    ap, stp = planar.demod_sam_planar(jnp.asarray(z.real), jnp.asarray(z.imag),
                                      planar.sam_init_planar(), sample_rate=FS)
    np.testing.assert_allclose(np.asarray(ap), np.asarray(ac), atol=1e-4)
    np.testing.assert_allclose(float(stp.freq), float(stc.freq), atol=1e-6)


def test_noise_blanker_planar_matches_complex(rng):
    x = siggen.carrier(4096, 1000.0, FS, amp=0.1)
    x[500] += 4.0
    yc, avgc = nb_complex(jnp.asarray(x), jnp.float32(0.1))
    yr, yi, avgp = planar.noise_blanker_planar(
        jnp.asarray(x.real), jnp.asarray(x.imag), jnp.float32(0.1))
    np.testing.assert_allclose(np.asarray(yr), np.asarray(yc.real), atol=1e-6)
    np.testing.assert_allclose(np.asarray(yi), np.asarray(yc.imag), atol=1e-6)
    np.testing.assert_allclose(float(avgp), float(avgc), rtol=1e-5)


def test_spectral_sub_planar_matches_complex(rng):
    n = 8192
    la = (rng.standard_normal(n) * 0.2).astype(np.float32)
    ra = (rng.standard_normal(n) * 0.2).astype(np.float32)
    z = (la + 1j * ra).astype(np.complex64)

    frames = fastconv.frame_overlap_save(jnp.asarray(z),
                                         jnp.zeros(128, jnp.complex64))
    out_c, nf_c = spectral_sub.spectral_subtract_frames(frames, 20.0,
                                                        jnp.float32(0.0))
    want = np.asarray(out_c).reshape(-1)

    c, s = planar.dft_matrices(256)
    l2, r2, nf_p, _, _ = planar.spectral_subtract_planar(
        jnp.asarray(la), jnp.asarray(ra), 20.0, jnp.float32(0.0),
        jnp.asarray(c), jnp.asarray(s),
        jnp.zeros(128, jnp.float32), jnp.zeros(128, jnp.float32))
    np.testing.assert_allclose(np.asarray(l2), want.real, atol=2e-4)
    np.testing.assert_allclose(np.asarray(r2), want.imag, atol=2e-4)
    np.testing.assert_allclose(float(nf_p), float(nf_c), rtol=1e-3)


def test_planar_dft_split_matches_direct(rng):
    """Radix-2 DIT split DFT == direct n^2 DFT matmuls (half the MXU flops)."""
    from radiodsp_sdr_rx_tpu.ops.planar import dft_matrices, planar_dft_split

    n = 256
    c, s = dft_matrices(n)
    xr = rng.standard_normal((3, 5, n)).astype(np.float32)
    xi = rng.standard_normal((3, 5, n)).astype(np.float32)
    want_r = xr @ c + xi @ s
    want_i = xi @ c - xr @ s
    got_r, got_i = planar_dft_split(jnp.asarray(xr), jnp.asarray(xi), n)
    np.testing.assert_allclose(np.asarray(got_r), want_r, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_i), want_i, atol=2e-4)

    # numpy FFT oracle
    z = (xr + 1j * xi).astype(np.complex64)
    ref = np.fft.fft(z, axis=-1)
    np.testing.assert_allclose(np.asarray(got_r), ref.real, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_i), ref.imag, atol=2e-3)


def test_spectral_subtract_split_equals_direct(rng):
    from radiodsp_sdr_rx_tpu.ops.planar import (
        dft_matrices, spectral_subtract_planar)

    n = 4096
    c, s = dft_matrices(256)
    l = rng.standard_normal((2, n)).astype(np.float32) * 0.3
    r = rng.standard_normal((2, n)).astype(np.float32) * 0.3
    tails = np.zeros((2, 128), np.float32)
    nf0 = np.zeros(2, np.float32)
    args = (jnp.asarray(l), jnp.asarray(r), 30.0, jnp.asarray(nf0),
            jnp.asarray(c), jnp.asarray(s), jnp.asarray(tails),
            jnp.asarray(tails))
    a = spectral_subtract_planar(*args, split_dft=True)
    b = spectral_subtract_planar(*args, split_dft=False)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=2e-4)
