"""Automatic gain control: off / fast / medium / slow.

Behavioral replacement for AudioSDR's AGC (the reference drives it via
``SDR.setAGCmode({AGCoff, AGCfast, AGCmedium, AGCslow})``,
ref: src/RadioDSP_SDR_RX/RDSP_controls.h:196-232; enabled at
RadioDSP_SDR_RX.ino:120-121). The AudioSDR library is not vendored in the
reference repo, so this is a spec-level reimplementation: instant-attack /
exponential-release envelope tracking with gain = target/envelope capped at
max_gain — the classic receiver AGC law.

TPU-first formulation: the per-sample envelope recurrence
    env[n] = max(|x[n]|, env[n-1] * release)
is a max-plus recurrence, associative in the log domain:
    log_env[n] = max_k ( log|x[k]| - (n-k)*d ),   d = -log(release)
               = cummax( log|x[k]| + k*d ) - n*d
so the whole envelope is one ``jax.lax.associative_scan`` (O(log n) depth)
instead of a sequential per-sample loop — the entire AGC runs parallel on the
VPU. A float64-free, chunked variant keeps ``k*d`` small for long streams.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class AGCParams(NamedTuple):
    """AGC configuration. release is per-sample envelope decay (1.0 => hold)."""

    release: float  # per-sample decay of the envelope
    target: float   # output target level
    max_gain: float
    enabled: bool = True


def preset_from_release_time(release_time_s: float, sample_rate: float,
                             target=0.5, max_gain=316.0) -> AGCParams:
    """release such that envelope decays by 1/e over release_time_s
    (host math — configuration must never touch the device)."""
    import math

    return AGCParams(
        release=math.exp(-1.0 / (release_time_s * sample_rate)),
        target=target,
        max_gain=max_gain,
    )


_preset = preset_from_release_time  # backward-compat alias


def agc_presets(sample_rate: float, target: float = 0.5,
                max_gain: float = 316.0) -> dict[str, AGCParams]:
    """off/fast/medium/slow presets (menu cycle at RDSP_controls.h:196-232).

    The release time constants (fast 0.25 s, medium 0.6 s, slow 2 s), target
    and max_gain are UNPINNED: the reference delegates AGC to the closed-source
    AudioSDR library, so these follow common SDR practice. They are exposed on
    ``ReceiverConfig`` (agc_release_s / agc_target / agc_max_gain) so a
    deployment can pin measured values; attack is instantaneous by
    construction.
    """
    return {
        "off": AGCParams(release=1.0, target=1.0, max_gain=1.0, enabled=False),
        "fast": preset_from_release_time(0.25, sample_rate, target, max_gain),
        "medium": preset_from_release_time(0.6, sample_rate, target, max_gain),
        "slow": preset_from_release_time(2.0, sample_rate, target, max_gain),
    }


AGC_PRESETS = agc_presets(44117.64706)

_LOG_FLOOR = -30.0  # log of minimum trackable envelope (~1e-13 amplitude)
_CHUNK = 16384      # keep k*d bounded for f32 accuracy on long streams


def _envelope_chunk(log_a: jax.Array, log_env0: jax.Array, d) -> tuple[jax.Array, jax.Array]:
    """Parallel max-release envelope over one chunk via associative cummax."""
    n = log_a.shape[-1]
    k = jnp.arange(n, dtype=jnp.float32)
    shifted = jnp.maximum(log_a, log_env0[..., None] - (k + 1.0) * d) + k * d
    run = jax.lax.associative_scan(jnp.maximum, shifted, axis=-1)
    log_env = run - k * d
    return log_env, log_env[..., -1]


def agc_envelope(mag: jax.Array, env0: jax.Array, release) -> tuple[jax.Array, jax.Array]:
    """env[n] = max(mag[n], env[n-1]*release), computed scan-free.

    mag:  (..., n) nonnegative f32
    env0: (...,) carry from previous segment
    Returns (env, env_last).
    """
    d = -jnp.log(jnp.asarray(release, jnp.float32))
    log_a = jnp.log(jnp.maximum(mag, jnp.exp(_LOG_FLOOR)))
    log_env0 = jnp.log(jnp.maximum(env0, jnp.exp(_LOG_FLOOR)))

    n = mag.shape[-1]
    if n <= _CHUNK:
        log_env, last = _envelope_chunk(log_a, log_env0, d)
    else:
        # chunk the stream; carry the boundary envelope between chunks serially
        # (few iterations, each internally parallel)
        pad = (-n) % _CHUNK
        padded = jnp.pad(log_a, [(0, 0)] * (log_a.ndim - 1) + [(0, pad)],
                         constant_values=_LOG_FLOOR)
        chunks = padded.reshape(*log_a.shape[:-1], -1, _CHUNK)
        chunks = jnp.moveaxis(chunks, -2, 0)  # (n_chunks, ..., _CHUNK)

        def step(carry, chunk):
            le, last = _envelope_chunk(chunk, carry, d)
            return last, le

        _, les = jax.lax.scan(step, log_env0, chunks)
        log_env = jnp.moveaxis(les, 0, -2).reshape(*log_a.shape[:-1], -1)[..., :n]
        last = log_env[..., -1]
    return jnp.exp(log_env), jnp.exp(last)


def agc_run(
    x: jax.Array,
    params: AGCParams,
    env0: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Apply AGC to a real audio (or complex IQ) stream.

    Returns (y, env_last). With ``enabled=False`` the signal passes through and
    the envelope still tracks (so mode switches stay glitch-free).
    """
    mag = jnp.abs(x)
    env, env_last = agc_envelope(mag, env0, params.release)
    gain = jnp.minimum(params.target / jnp.maximum(env, 1e-12), params.max_gain)
    y = jnp.where(jnp.asarray(params.enabled), x * gain, x)
    return y, env_last
