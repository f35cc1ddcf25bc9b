"""ChannelizedBank: PFB monitoring bank tests."""

import numpy as np
import jax.numpy as jnp

from radiodsp_sdr_rx_tpu.models.channelized import ChannelizedBank
from radiodsp_sdr_rx_tpu.utils import siggen

FS = 44117.64706


def test_am_stations_per_channel():
    """AM stations centered on channels 3 and 60 (negative side) demodulate in
    their channels; power map lights only those."""
    m = 64
    n = m * 4096
    bank = ChannelizedBank(n_channels=m, demod="am")
    f3 = 3 * FS / m
    f60 = 60 * FS / m - FS  # negative offset
    iq = (siggen.am_signal(n, f3, mod_hz=150.0, fs=FS, amp=0.4)
          + siggen.am_signal(n, f60, mod_hz=90.0, fs=FS, amp=0.3)
          + siggen.noise(n, 0.005)).astype(np.complex64)

    out, state = bank.process(iq, bank.init_state())
    audio = np.asarray(out["audio"])
    power = np.asarray(out["power"])
    assert audio.shape == (m, n // m)

    hot = {3, 60}
    med = np.median(power)
    for k in range(m):
        if k in hot:
            assert power[k] > 30 * med, (k, power[k], med)
    # demodulated tones at the channel rate
    ch_rate = FS / m
    for k, tone in [(3, 150.0), (60, 90.0)]:
        a = audio[k, 512:]
        spec = np.abs(np.fft.rfft((a - a.mean()) * np.hanning(len(a))))
        freqs = np.fft.rfftfreq(len(a), 1 / ch_rate)
        assert abs(freqs[spec.argmax()] - tone) < 8.0, (k, freqs[spec.argmax()])
    # channel_freq mapping
    assert abs(bank.channel_freq(3) - f3) < 1e-6
    assert abs(bank.channel_freq(60) - f60) < 1e-6


def test_streaming_continuity(rng):
    m = 32
    n = m * 1024
    bank = ChannelizedBank(n_channels=m, demod="am")
    iq = ((rng.standard_normal(2 * n) + 1j * rng.standard_normal(2 * n))
          .astype(np.complex64) * 0.2)

    out_f, _ = bank.process(iq, bank.init_state())
    st = bank.init_state()
    o1, st = bank.process(iq[:n], st)
    o2, _ = bank.process(iq[n:], st)
    got = np.concatenate([np.asarray(o1["audio"]), np.asarray(o2["audio"])],
                         axis=-1)
    np.testing.assert_allclose(got, np.asarray(out_f["audio"]), atol=1e-5)


def test_ssb_mode_offset_voice_tone():
    """demod='ssb': a USB tone 800 Hz above an arbitrary in-channel offset
    demodulates to 800 Hz audio at the 2x channel rate."""
    m = 16
    n = m * 64 * 32          # multiple of 64*M for overlap-save framing
    k, delta = 5, 400.0      # "dial" frequency 400 Hz off channel center
    offsets = np.zeros(m)
    offsets[k] = delta
    bank = ChannelizedBank(n_channels=m, demod="ssb", offsets_hz=offsets,
                           agc="medium")
    # USB signal: tone 800 Hz above the dial frequency
    f_rf = k * FS / m + delta + 800.0
    iq = (siggen.carrier(n, f_rf, FS, amp=0.4)
          + siggen.noise(n, 0.003)).astype(np.complex64)

    out, _ = bank.process(iq, bank.init_state())
    audio = np.asarray(out["audio"])
    ch_rate = 2 * FS / m
    assert audio.shape == (m, int(n // m * 2))
    a = audio[k, 1024:]
    spec = np.abs(np.fft.rfft((a - a.mean()) * np.hanning(len(a))))
    freqs = np.fft.rfftfreq(len(a), 1 / ch_rate)
    assert abs(freqs[spec.argmax()] - 800.0) < 10.0, freqs[spec.argmax()]
    # AGC pulled the tone toward the target level
    assert 0.2 < np.abs(a).max() < 1.5


def test_ssb_mode_streaming_continuity(rng):
    m = 8
    n = m * 64 * 4
    offsets = rng.uniform(-500, 500, m)
    bank = ChannelizedBank(n_channels=m, demod="ssb", offsets_hz=offsets)
    iq = ((rng.standard_normal(2 * n) + 1j * rng.standard_normal(2 * n))
          .astype(np.complex64) * 0.2)

    out_f, _ = bank.process(iq, bank.init_state())
    st = bank.init_state()
    o1, st = bank.process(iq[:n], st)
    o2, _ = bank.process(iq[n:], st)
    got = np.concatenate([np.asarray(o1["audio"]), np.asarray(o2["audio"])],
                         axis=-1)
    np.testing.assert_allclose(got, np.asarray(out_f["audio"]), atol=2e-5)


def test_segment_multiple_validation():
    import pytest as _pytest

    from radiodsp_sdr_rx_tpu.models.channelized import ChannelizedBank

    bank = ChannelizedBank(n_channels=16, demod="am")
    assert bank.segment_multiple == 16
    with _pytest.raises(ValueError, match="multiple of 16"):
        bank.process(np.zeros(100, np.complex64), bank.init_state())

    bank_ssb = ChannelizedBank(n_channels=16, demod="ssb")
    assert bank_ssb.segment_multiple == 64 * 16
    with _pytest.raises(ValueError, match="multiple of 1024"):
        bank_ssb.process(np.zeros(512, np.complex64), bank_ssb.init_state())


def test_ssb_buffer_remainder_matches_aligned(rng):
    """buffer_remainder=True (VERDICT r2 #9): arbitrary segment lengths are
    accepted; outputs concatenated over unaligned feeds == one aligned
    one-shot run (the unaligned tail carries host-side between calls)."""
    m = 8
    n = m * 64 * 4                          # segment_multiple = 512, n = 2048
    offsets = rng.uniform(-500, 500, m)
    iq = ((rng.standard_normal(n) + 1j * rng.standard_normal(n))
          .astype(np.complex64) * 0.2)

    aligned = ChannelizedBank(n_channels=m, demod="ssb", offsets_hz=offsets)
    out_f, _ = aligned.process(iq, aligned.init_state())

    bank = ChannelizedBank(n_channels=m, demod="ssb", offsets_hz=offsets,
                           buffer_remainder=True)
    st = bank.init_state()
    pieces = []
    cuts = [0, 100, 612, 700, 1553, 2000]   # ragged, sub-multiple feeds
    for a, b in zip(cuts[:-1], cuts[1:]):
        o, st = bank.process(iq[a:b], st)
        pieces.append(np.asarray(o["audio"]))
    assert bank.pending_samples == 2000 - 1536   # unaligned tail carried
    got = np.concatenate(pieces, axis=-1)
    want = np.asarray(out_f["audio"])
    np.testing.assert_allclose(got, want[:, : got.shape[-1]], atol=2e-5)
    # feeding the rest completes the aligned stream exactly
    o, st = bank.process(iq[2000:], st)
    assert bank.pending_samples == 0
    full = np.concatenate([got, np.asarray(o["audio"])], axis=-1)
    np.testing.assert_allclose(full, want, atol=2e-5)
