"""Decimating DDC + polyphase channelizer tests vs scipy oracles."""

import numpy as np
import jax.numpy as jnp
import scipy.signal

from radiodsp_sdr_rx_tpu.ops import decimate, nco
from radiodsp_sdr_rx_tpu.ops.channelizer import OversampledPFB, PFBChannelizer
from radiodsp_sdr_rx_tpu.ops.fir_design import (
    calc_cplx_fir_coeffs, design_filter_mask, filter_mask_from_coeffs,
)
from radiodsp_sdr_rx_tpu.utils import siggen

FS = 44117.64706


def test_decimating_operator_matches_full_filter(rng):
    """Row-sliced operator == filter-then-downsample (polyphase identity)."""
    mask = design_filter_mask(-4000.0, 4000.0, FS)
    m = 4
    w_dec = jnp.asarray(decimate.decimating_operator(mask, m))
    x = (rng.standard_normal(4096) + 1j * rng.standard_normal(4096)).astype(np.complex64)

    # oracle: full filter (scipy) then ::M
    h = np.fft.ifft(mask)[:129]
    h[128] = h[128].real
    full = scipy.signal.lfilter(h, [1.0], x.astype(np.complex128))
    want = full[::m]

    yr, yi, _, _ = decimate.decimating_filter_planar(
        jnp.asarray(x.real), jnp.asarray(x.imag), w_dec,
        jnp.zeros(128, jnp.float32), jnp.zeros(128, jnp.float32))
    got = np.asarray(yr) + 1j * np.asarray(yi)
    assert got.shape == (1024,)
    np.testing.assert_allclose(got, want, atol=3e-4)


def test_ddc_extracts_channel(rng):
    """DDC: mix a +8 kHz carrier to DC and decimate by 4; output is a clean
    DC-centered tone at fs/4 rate."""
    n = 1 << 15
    m = 4
    sig = siggen.am_signal(n, 8_000.0, mod_hz=500.0, fs=FS, amp=0.5)
    sig = (sig + siggen.noise(n, 0.01)).astype(np.complex64)
    w_dec = jnp.asarray(decimate.design_decimator(m, FS))
    inc = nco.freq_to_phase_inc(8_000.0, FS)
    yr, yi, ph, _, _ = decimate.ddc_planar(
        jnp.asarray(sig.real), jnp.asarray(sig.imag), np.uint32(0), inc,
        w_dec, jnp.zeros(128, jnp.float32), jnp.zeros(128, jnp.float32))
    z = np.asarray(yr) + 1j * np.asarray(yi)
    assert len(z) == n // m
    # envelope carries the 500 Hz modulation at the decimated rate
    env = np.abs(z)[200:]
    spec = np.abs(np.fft.rfft((env - env.mean()) * np.hanning(len(env))))
    freqs = np.fft.rfftfreq(len(env), m / FS)
    assert abs(freqs[spec.argmax()] - 500.0) < 20.0


def test_ddc_streaming_continuity(rng):
    n = 8192
    m = 4
    x = (rng.standard_normal(2 * n) + 1j * rng.standard_normal(2 * n)).astype(np.complex64)
    w_dec = jnp.asarray(decimate.design_decimator(m, FS))
    inc = nco.freq_to_phase_inc(3_000.0, FS)

    yr_f, yi_f, *_ = decimate.ddc_planar(
        jnp.asarray(x.real), jnp.asarray(x.imag), np.uint32(0), inc, w_dec,
        jnp.zeros(128, jnp.float32), jnp.zeros(128, jnp.float32))

    yr1, yi1, ph, tr, ti = decimate.ddc_planar(
        jnp.asarray(x.real[:n]), jnp.asarray(x.imag[:n]), np.uint32(0), inc,
        w_dec, jnp.zeros(128, jnp.float32), jnp.zeros(128, jnp.float32))
    yr2, yi2, *_ = decimate.ddc_planar(
        jnp.asarray(x.real[n:]), jnp.asarray(x.imag[n:]), ph, inc, w_dec, tr, ti)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(yr1), np.asarray(yr2)]), np.asarray(yr_f),
        atol=1e-5)


def test_pfb_channelizer_tone_routing():
    """Carriers at k*fs/M + delta land in channel k as delta-offset tones."""
    m = 16
    n = m * 2048
    ch = PFBChannelizer(n_channels=m, taps_per_phase=8, sample_rate=FS)
    cases = [(2, 100.0), (5, -80.0), (11, 50.0)]  # (channel, delta Hz)
    x = sum(siggen.carrier(n, k * FS / m + d, FS, amp=0.3) for k, d in cases)
    x = (x + siggen.noise(n, 0.005)).astype(np.complex64)

    yr, yi, _ = ch(jnp.asarray(x.real), jnp.asarray(x.imag),
                   jnp.asarray(ch.init_state()))
    z = np.asarray(yr) + 1j * np.asarray(yi)      # (M, n/M)
    powers = (np.abs(z[:, 64:]) ** 2).mean(axis=1)
    hot = {k for k, _ in cases}
    for k in range(m):
        if k in hot:
            assert powers[k] > 50 * np.median(powers), (k, powers)
    # channel 5's tone sits at -80 Hz at the decimated rate
    k, d = 5, -80.0
    seg = z[k, 256:]
    spec = np.abs(np.fft.fft(seg * np.hanning(len(seg))))
    freqs = np.fft.fftfreq(len(seg), m / FS)
    assert abs(freqs[spec.argmax()] - d) < 15.0


def test_oversampled_pfb_odd_frames_match_critical(rng):
    """Odd output frames of the 2x PFB cover the same windows as the critical
    PFB's frames (the twiddle restores the phase): y_o[:, 1::2] == y_c."""
    m = 16
    n = m * 512
    crit = PFBChannelizer(n_channels=m, taps_per_phase=8, sample_rate=FS)
    ovs = OversampledPFB(n_channels=m, taps_per_phase=8, sample_rate=FS)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)

    yr_c, yi_c, _ = crit(jnp.asarray(x.real), jnp.asarray(x.imag),
                         jnp.asarray(crit.init_state()))
    yr_o, yi_o, _ = ovs(jnp.asarray(x.real), jnp.asarray(x.imag),
                        jnp.asarray(ovs.init_state()))
    assert yr_o.shape == (m, 2 * n // m)
    np.testing.assert_allclose(np.asarray(yr_o)[:, 1::2], np.asarray(yr_c),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(yi_o)[:, 1::2], np.asarray(yi_c),
                               atol=1e-5)


def test_oversampled_pfb_matches_ddc_oracle(rng):
    """Channel k of the 2x PFB == mix-by-k*fs/M -> prototype FIR -> ::H
    (scipy oracle), including odd frames (the twiddle path)."""
    m = 8
    h = m // 2
    n = m * 512
    ovs = OversampledPFB(n_channels=m, taps_per_phase=6, sample_rate=FS)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    yr, yi, _ = ovs(jnp.asarray(x.real), jnp.asarray(x.imag),
                    jnp.asarray(ovs.init_state()))
    z = np.asarray(yr) + 1j * np.asarray(yi)

    proto = ovs.h_poly.reshape(-1).astype(np.float64)  # (P*M,) prototype
    for k in (0, 1, 3, 6):
        mixed = x.astype(np.complex128) * np.exp(
            -2j * np.pi * k * np.arange(n) / m)
        # the PFB frame at hop t covers x[tH - hist .. tH + M - 1] with the
        # polyphase convention acc[t,r] = sum_j h[j*M+r] x[tH+r+(j-(P-1))*M];
        # equivalently a correlation of the mixed stream with the prototype:
        # y[t] = sum_i proto[i] * mixed[tH + i - hist]
        hist = ovs.hist
        padded = np.concatenate([np.zeros(hist, np.complex128), mixed])
        want = np.array([
            (proto * padded[t * h : t * h + len(proto)]).sum()
            for t in range(2 * n // m)
        ])
        np.testing.assert_allclose(z[k], want, atol=1e-5,
                                   err_msg=f"channel {k}")


def test_oversampled_pfb_streaming_continuity(rng):
    m = 8
    n = m * 256
    ch = OversampledPFB(n_channels=m, taps_per_phase=6, sample_rate=FS)
    x = (rng.standard_normal(2 * n) + 1j * rng.standard_normal(2 * n)).astype(np.complex64)

    yr_f, yi_f, _ = ch(jnp.asarray(x.real), jnp.asarray(x.imag),
                       jnp.asarray(ch.init_state()))
    st = jnp.asarray(ch.init_state())
    yr1, yi1, st = ch(jnp.asarray(x.real[:n]), jnp.asarray(x.imag[:n]), st)
    yr2, yi2, _ = ch(jnp.asarray(x.real[n:]), jnp.asarray(x.imag[n:]), st)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(yr1), np.asarray(yr2)], axis=-1),
        np.asarray(yr_f), atol=1e-5)


def test_oversampled_pfb_offset_ssb_survives():
    """A tone at an arbitrary in-channel offset (not channel-centered) comes
    through channel k cleanly at the 2x rate — the case the critical PFB
    cannot serve."""
    m = 16
    n = m * 2048
    ch = OversampledPFB(n_channels=m, taps_per_phase=8, sample_rate=FS)
    k, delta = 3, 600.0   # well off channel center, inside +-fs/2M=1379 Hz
    x = siggen.carrier(n, k * FS / m + delta, FS, amp=0.5)
    x = (x + siggen.noise(n, 0.005)).astype(np.complex64)
    yr, yi, _ = ch(jnp.asarray(x.real), jnp.asarray(x.imag),
                   jnp.asarray(ch.init_state()))
    z = np.asarray(yr[k]) + 1j * np.asarray(yi[k])
    seg = z[256:]
    spec = np.abs(np.fft.fft(seg * np.hanning(len(seg))))
    freqs = np.fft.fftfreq(len(seg), m / (2 * FS))   # 2x rate
    idx = int(spec.argmax())
    peak = freqs[idx]
    assert abs(peak - delta) < 10.0, peak
    # tone-to-everything-else ratio (+-3 bins absorb the Hann leakage)
    p_tone = (spec[idx - 3 : idx + 4] ** 2).sum()
    p_rest = (spec ** 2).sum() - p_tone
    assert p_tone > 100 * p_rest


def test_pfb_streaming_continuity(rng):
    m = 8
    n = m * 512
    ch = PFBChannelizer(n_channels=m, taps_per_phase=6, sample_rate=FS)
    x = (rng.standard_normal(2 * n) + 1j * rng.standard_normal(2 * n)).astype(np.complex64)

    yr_f, yi_f, _ = ch(jnp.asarray(x.real), jnp.asarray(x.imag),
                       jnp.asarray(ch.init_state()))
    st = jnp.asarray(ch.init_state())
    yr1, yi1, st = ch(jnp.asarray(x.real[:n]), jnp.asarray(x.imag[:n]), st)
    yr2, yi2, _ = ch(jnp.asarray(x.real[n:]), jnp.asarray(x.imag[n:]), st)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(yr1), np.asarray(yr2)], axis=-1),
        np.asarray(yr_f), atol=1e-5)
