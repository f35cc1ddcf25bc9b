"""Observability: the reference's visual outputs as a tensor metrics API.

The reference's only observability is its TFT display (SURVEY.md §5): S-meter,
panadapter spectrum + waterfall, audio-FFT scope, status fields. Here those
quantities are computed as tensors by a jitted side-pipeline, decoupled from
the audio hot path (the reference likewise throttles display updates to
0-200 ms, RadioDSP_SDR_RX.ino:209-229):

  - panadapter: 500 Hz HPF biquads on I/Q (ino:155-156) -> 256-pt IQ spectrum
    with Hanning window and 30-frame averaging (ino:144-145) -> display-order
    rows (analyze_fft256iq.cpp)
  - smoothed scope view + scrolling waterfall + color classes (RDSP_display.h)
  - S-meter from bins 75-85 with the reference's uv/dBuV/S-unit law
  - audio scope: 1024-pt FFT, 30-frame averaging (ino:147-148)
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from radiodsp_sdr_rx_tpu.ops import analyzers
from radiodsp_sdr_rx_tpu.ops.iir import biquad_apply, biquad_highpass
from radiodsp_sdr_rx_tpu.utils import display as disp
from radiodsp_sdr_rx_tpu.utils import smeter as smeter_mod


class ScopeState(NamedTuple):
    """Carried display state (checkpointable like all receiver state)."""

    biquad_i: jax.Array   # (2,) panadapter pre-filter state, I channel
    biquad_q: jax.Array   # (2,) Q channel
    view_old: jax.Array   # (256,) smoothed spectrum carry
    waterfall: jax.Array  # (MAX_WATERFALL, 128) scrolling history
    uv_old: jax.Array     # () S-meter smoothing carry
    iq_tail: jax.Array    # (128,) analyzer prevblock carry (IQ spectrum)
    audio_tail: jax.Array # (512,) analyzer prevblock carry (audio scope)


def scope_init() -> ScopeState:
    return ScopeState(
        biquad_i=np.zeros(2, np.float32),
        biquad_q=np.zeros(2, np.float32),
        view_old=np.zeros(256, np.float32),
        waterfall=np.zeros((disp.MAX_WATERFALL, 128), np.float32),
        uv_old=np.float32(0.0),
        iq_tail=np.zeros(128, np.complex64),
        audio_tail=np.zeros(512, np.float32),
    )


def analyze(
    iq: jax.Array,
    audio: jax.Array,
    state: ScopeState,
    naverage: int = 30,
    sample_rate: float = 44117.64706,
    audio_naverage: int | None = None,
) -> tuple[dict, ScopeState]:
    """Compute all display metrics for one segment.

    iq:    (n,) complex64 raw capture segment (pre-NCO, like the reference's
           panadapter tap directly off the I2S input, ino:75-78)
    audio: (n,) f32 demodulated audio (for the audio scope)
    Returns (metrics dict, new state). Metrics:
      spectrum      (u, 256) raw analyzer rows, display bin order
      view          (256,)   smoothed scope bars after the last update
      waterfall     (50,128) scrolled history
      waterfall_cls (50,128) color class indices into WATERFALL_COLORS
      smeter_uv     (u,)     smoothed uv track
      s_units/s9_plus_db     final S-meter reading
      audio_spectrum (ua,512) audio scope rows
    """
    coeffs = biquad_highpass(500.0, sample_rate, 0.5)
    i_f, bq_i = biquad_apply(iq.real, coeffs, state.biquad_i)
    q_f, bq_q = biquad_apply(iq.imag, coeffs, state.biquad_q)
    iq_f = jax.lax.complex(i_f, q_f)

    spectrum = analyzers.iq_spectrum_frames(iq_f, naverage=naverage,
                                            tail=state.iq_tail)

    # fold the spectrum rows through view smoothing + waterfall scroll
    def step(carry, row):
        view_old, wf = carry
        view, _ = disp.spectrum_smooth(row, view_old)
        wf = disp.waterfall_update(wf, view)
        return (view, wf), view

    (view, waterfall), _ = jax.lax.scan(
        step, (state.view_old, state.waterfall), spectrum
    )

    uv, uv_old = smeter_mod.smeter_from_spectrum(spectrum, state.uv_old)
    s, plus_db = smeter_mod.s_units(uv[..., -1])

    # The audio scope needs naverage*512 samples per update row; callers
    # feeding smaller blocks (the live appliance at 4096) pass a reduced
    # audio_naverage so every block still yields a row (cadence-only
    # deviation from the reference's 30-frame averaging).
    audio_spectrum = analyzers.audio_spectrum_frames(
        audio, naverage=naverage if audio_naverage is None else audio_naverage,
        tail=state.audio_tail)

    metrics = {
        "spectrum": spectrum,
        "view": view,
        "waterfall": waterfall,
        "waterfall_cls": disp.classify_waterfall_colors(waterfall),
        "smeter_uv": uv,
        "s_units": s,
        "s9_plus_db": plus_db,
        "audio_spectrum": audio_spectrum,
    }
    new_state = ScopeState(
        biquad_i=bq_i, biquad_q=bq_q, view_old=view, waterfall=waterfall,
        uv_old=uv_old, iq_tail=iq_f[..., -128:], audio_tail=audio[..., -512:],
    )
    return metrics, new_state


analyze_jit = jax.jit(analyze, static_argnames=("naverage", "sample_rate", "audio_naverage"))
