"""Impulse noise blanker.

Behavioral replacement for AudioSDR's noise blanker
(``SDR.enableNoiseBlanker`` / ``setNoiseBlankerThresholdDb``, call sites:
RadioDSP_SDR_RX.ino:129-131; the backup sketch runs it at 10 dB,
src/backup/RadioDSP_SDR_RX_Conv.ino:1259-1260). Samples whose magnitude
exceeds the running average by the threshold are zeroed — removing ignition /
static crashes before demodulation. The running average is a one-pole IIR run
as a parallel associative scan (ops/iir.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from radiodsp_sdr_rx_tpu.ops.iir import first_order_iir


def noise_blanker(
    iq: jax.Array,
    avg0: jax.Array,
    threshold_db: float = 10.0,
    tau_samples: float = 512.0,
) -> tuple[jax.Array, jax.Array]:
    """Blank impulse spikes in a complex IQ stream.

    iq:   (..., n) complex64
    avg0: (...,) running-average-magnitude carry
    Returns (blanked_iq, new_avg).
    """
    import math

    mag = jnp.abs(iq)
    a = math.exp(-1.0 / tau_samples)
    avg, avg_last = first_order_iir(mag, a, 1.0 - a, avg0)
    thresh = 10.0 ** (threshold_db / 20.0)
    keep = mag <= (avg * thresh + 1e-12)
    return jnp.where(keep, iq, jnp.zeros_like(iq)), avg_last
