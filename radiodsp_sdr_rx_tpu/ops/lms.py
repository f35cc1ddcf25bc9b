"""Normalized-LMS adaptive filter: noise reduction and auto-notch.

Reproduces the reference LMS noise reducer (ref:
src/RadioDSP_SDR_RX/RDSP_noise_reduction.h): 96 taps, a 128-sample
decorrelation delay, and the de-linearized dB mu law
(RDSP_noise_reduction.h:48-56):

    mu = 1 / 10^((strength/2 + 2) / 10)

Per-sample semantics follow CMSIS ``arm_lms_norm_f32``: for input x[n] and
desired d[n] = x[n-128],
    y[n] = w . window(x, n)                      (96-tap FIR)
    e[n] = d[n] - y[n]
    w   += (mu * e[n] / (energy + eps)) * window(x, n)
with energy = ||window||^2 and eps = FLT_EPSILON (1.1920929e-7). The reference
uses the *prediction* y as the denoised output (RDSP_noise_reduction.h:73 writes
pOut back into nrbuffer): only components correlated across the 128-sample
delay (speech/tones) are predictable, so uncorrelated noise is suppressed. The
auto-notch dual (AudioSDR's ALS notch, RDSP_controls.h:257-262) returns the
*error* e instead: predictable steady carriers are removed, speech kept.

The recurrence is inherently sequential (weights adapt per sample); it runs as
a ``lax.scan`` over samples with all 96-tap dot products vectorized on the VPU
and channels batched via ``vmap`` — the TPU-native shape for adaptive filters.
The reference quirk that the *first* block's desired signal is the block itself
(its delay line starts in-phase, RDSP_noise_reduction.h:66-79 with
lms1_inbuf == lms1_outbuf == 0 on the first call) is replicated via the
``first`` flag in the state.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

LMS_TAPS = 96          # MAX_LMS_TAPS (RDSP_noise_reduction.h:23)
LMS_DELAY = 128        # decorrelation delay (RDSP_noise_reduction.h:24)
_EPS = 1.1920929e-7    # CMSIS DELTA for arm_lms_norm_f32


def lms_mu_from_strength(strength) -> np.float32:
    """The reference's de-linearized dB mapping (RDSP_noise_reduction.h:48-56).
    Host-side configuration math (NumPy)."""
    s = np.asarray(strength, np.float64)
    return np.float32(1.0 / np.power(10.0, (s / 2.0 + 2.0) / 10.0))


class LMSState(NamedTuple):
    weights: jax.Array   # (taps,) f32 adaptive coefficients
    window: jax.Array    # (taps,) f32 most-recent input samples (index -1 = newest)
    delay: jax.Array     # (LMS_DELAY,) f32 delayed-signal carry between segments
    first: jax.Array     # bool: True until the first block has been processed


def lms_nr_init(taps: int = LMS_TAPS, delay: int = LMS_DELAY) -> LMSState:
    """Fresh zeroed LMS state (reference Init_LMS_NR, RDSP_noise_reduction.h:35-64).

    Leaves are host NumPy arrays (pure data, no device compute at init time);
    they move to device on first use as jit inputs.
    """
    return LMSState(
        weights=np.zeros(taps, np.float32),
        window=np.zeros(taps, np.float32),
        delay=np.zeros(delay, np.float32),
        first=np.bool_(True),
    )


def lms_nr_run(
    x: jax.Array,
    state: LMSState,
    mu,
    mode: str = "denoise",
) -> tuple[jax.Array, LMSState]:
    """Run the normalized-LMS over a 1-D stream segment.

    x: (n,) f32. For channel banks, vmap this function.
    mode: "denoise" returns the prediction y (reference DNR path);
          "notch" returns the error e (ALS auto-notch dual).
    Returns (y_or_e, new_state).
    """
    n = x.shape[-1]
    taps = state.weights.shape[-1]
    dlen = state.delay.shape[-1]

    # desired = 128-delayed stream; first block predicts itself (reference quirk)
    shifted = jnp.concatenate([state.delay, x])[:n]
    idx = jnp.arange(n)
    d = jnp.where(jnp.logical_and(state.first, idx < dlen), x, shifted)

    mu = jnp.asarray(mu, jnp.float32)

    def step(carry, inputs):
        w, win = carry
        xn, dn = inputs
        win = jnp.concatenate([win[1:], xn[None]])
        y = jnp.vdot(w, win)
        e = dn - y
        energy = jnp.vdot(win, win)
        w = w + (mu * e / (energy + _EPS)) * win
        return (w, win), (y, e)

    (w, win), (ys, es) = jax.lax.scan(step, (state.weights, state.window), (x, d))

    new_delay = jnp.concatenate([state.delay, x])[-dlen:]
    new_state = LMSState(weights=w, window=win, delay=new_delay,
                         first=jnp.asarray(False))
    out = ys if mode == "denoise" else es
    return out, new_state
