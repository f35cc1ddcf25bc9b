"""S-meter: signal-strength estimation from panadapter bins.

Reproduces the reference's meter law exactly (ref:
src/RadioDSP_SDR_RX/RDSP_display.h:329-374):

  Update_smeter: specVal = sum(FFT.output[75..85]); peak = |specVal / 5|
  displayPeak:   uv    = peak / 10
                 uv    = 0.1*uv + 0.9*uv_old         (1-pole smoothing)
                 dbuv  = 20*log10(uv)
                 s     = 1 + (10 + dbuv*1.2)/6, clamped >= 0
                 s > 9 -> S9+, overflow db = dbuv - 34

Implemented as tensor ops over batches of spectrum rows so a whole capture's
(or channel bank's) meter track is one vectorized call.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SMETER_BIN_LO = 75
SMETER_BIN_HI = 85  # inclusive (RDSP_display.h:371)


def smeter_from_spectrum(
    spectrum: jax.Array, uv_old: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Raw smoothed micro-volt estimate per spectrum row.

    spectrum: (..., n_updates, 256) display-order panadapter output
    uv_old:   (...,) smoothing carry
    Returns (uv (..., n_updates), new carry). The 1-pole smoothing is a serial
    recurrence over updates, run as a parallel associative scan.
    """
    spec_val = jnp.sum(spectrum[..., SMETER_BIN_LO : SMETER_BIN_HI + 1], axis=-1)
    peak = jnp.abs(spec_val / 5.0)
    uv_in = peak / 10.0

    # uv[k] = 0.1*uv_in[k] + 0.9*uv[k-1] — affine scan over the update axis
    def combine(p, q):
        a1, b1 = p
        a2, b2 = q
        return a1 * a2, b1 * a2 + b2

    av = jnp.full_like(uv_in, 0.9)
    bv = 0.1 * uv_in
    bv = bv.at[..., 0].add(0.9 * uv_old)
    _, uv = jax.lax.associative_scan(combine, (av, bv), axis=-1)
    return uv, uv[..., -1]


def s_units(uv: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Map smoothed uV to (S-units [0..9], S9-plus dB) per displayPeak."""
    dbuv = 20.0 * jnp.log10(jnp.maximum(uv, 1e-12))
    s = jnp.maximum(1.0 + (10.0 + dbuv * 1.2) / 6.0, 0.0)
    over = s > 9.0
    plus_db = jnp.where(over, dbuv - 34.0, 0.0)
    return jnp.where(over, 9.0, s), plus_db
