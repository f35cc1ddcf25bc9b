"""Fused fast-path receiver bank: the Pallas production pipeline for SSB modes.

Two Pallas backends, selected by ``backend=``:

  - "sweep" (default): the WHOLE chain — NCO mix + sideband filter + SSB
    demod + AGC + PBT — in ONE single-sweep kernel
    (ops/pallas_sweep.sweep_full_chain). Time streams through a 2-slot VMEM
    DMA ring; all carries (framing tails, AGC envelope) live in VMEM. HBM
    traffic is 8 B read + 8 B write per sample — ~2x the staged path.
  - "staged": mix+filter+demod kernel, AGC in XLA (scan-free associative
    form), PBT kernel (ops/pallas_kernels.py).

Streaming state (DDS phase, framing tails, AGC envelope) threads
call-to-call exactly like models/receiver.ReceiverBank, and the output
matches it to f32 tolerance (tests/test_fused_bank.py).

Use when: many-channel SSB monitoring at maximum throughput with AGC, no
NR/noise-blanker stages. Fall back to ReceiverBank for AM/SAM/NR configs.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from radiodsp_sdr_rx_tpu.models.config import DemodMode, ReceiverConfig
from radiodsp_sdr_rx_tpu.models.receiver import build_params
from radiodsp_sdr_rx_tpu.ops import agc as agc_ops
from radiodsp_sdr_rx_tpu.ops import nco, pallas_kernels


class FusedBankState(NamedTuple):
    nco_phase: jax.Array   # (C,) uint32 DDS phase words
    sb_tail: jax.Array     # (C, 256) f32 [re|im] mixed-stream framing tail
    audio_tail: jax.Array  # (C, 128) f32 PBT framing tail
    agc_env: jax.Array     # (C,) f32


class FusedSSBBank:
    """Many-channel fused SSB receiver (USB/LSB/CW/RTTY + AGC)."""

    def __init__(self, config: ReceiverConfig, freqs_hz,
                 block_c: int = 8, block_t: int = 4096,
                 backend: str = "sweep",
                 interpret: bool = False):
        if config.mode in (DemodMode.AM, DemodMode.SAM):
            raise ValueError("FusedSSBBank covers SSB modes; use ReceiverBank")
        if config.nr.kind != "off" or config.noise_blanker:
            raise ValueError("NR/noise-blanker configs use ReceiverBank")
        if backend not in ("staged", "sweep"):
            raise ValueError(backend)
        self.backend = backend
        self.config = config
        self.n_channels = len(freqs_hz)
        p = build_params(config)
        self.params = p
        self.incs = np.stack([
            nco.freq_to_phase_inc(
                f - config.tuning_offset - config.capture_center_freq,
                config.sample_rate)
            for f in np.asarray(freqs_hz, np.float64)
        ])

        agc_params = agc_ops.AGCParams(
            release=p.agc_release, target=p.agc_target,
            max_gain=p.agc_max_gain, enabled=p.agc_enabled)
        gains = (np.float32(config.input_gain), np.float32(config.output_gain))

        def fn_sweep(state: FusedBankState, xr, xi, incs, w_ssb, w_pbt):
            in_gain, out_gain = gains
            n = xr.shape[-1]
            xr = xr * in_gain
            xi = xi * (in_gain * np.float32(config.iq_gain_balance))
            from radiodsp_sdr_rx_tpu.ops.pallas_sweep import sweep_full_chain
            l, r, atail, env = sweep_full_chain(
                xr, xi, incs, state.nco_phase,
                w_ssb, w_pbt,
                state.sb_tail[:, :128], state.sb_tail[:, 128:],
                state.audio_tail, state.agc_env,
                agc_release=agc_params.release, agc_target=agc_params.target,
                agc_max_gain=agc_params.max_gain,
                agc_enabled=bool(agc_params.enabled),
                out_gain=float(out_gain),
                block_c=block_c, chunk_t=block_t, interpret=interpret,
            )
            new_state = FusedBankState(
                nco_phase=state.nco_phase
                + jnp.asarray(n, jnp.uint32) * incs.astype(jnp.uint32),
                sb_tail=jnp.concatenate([xr[:, -128:], xi[:, -128:]], axis=-1),
                audio_tail=atail,
                agc_env=env,
            )
            return {"audio_l": l, "audio_r": r}, new_state

        def fn(state: FusedBankState, xr, xi, incs, w_ssb, w_pbt):
            in_gain, out_gain = gains
            n = xr.shape[-1]  # samples this segment (phase advance below)
            # the fused kernel mixes the *scaled, balanced* input; scaling is
            # folded into the operator at build time for Q (gain balance) and
            # applied here for the input gain
            xr = xr * in_gain
            xi = xi * (in_gain * np.float32(config.iq_gain_balance))
            audio = pallas_kernels.fused_mix_filter_demod(
                xr, xi, incs, state.nco_phase, w_ssb, tail=state.sb_tail,
                block_c=block_c, block_t=block_t, interpret=interpret,
            )
            # next segment's framing tail: the kernel mixes its shifted view
            # internally (phase - 128*inc), so the carry is the RAW scaled
            # input's last block
            tr, ti = xr[:, -128:], xi[:, -128:]
            audio_g, env = agc_ops.agc_run(audio, agc_params, state.agc_env)
            l, r = pallas_kernels.pbt_filter(
                audio_g, w_pbt, tail=state.audio_tail,
                block_c=block_c, block_t=block_t, interpret=interpret,
            )
            new_state = FusedBankState(
                nco_phase=state.nco_phase
                + jnp.asarray(n, jnp.uint32) * incs.astype(jnp.uint32),
                sb_tail=jnp.concatenate([tr, ti], axis=-1),
                audio_tail=audio_g[:, -128:],
                agc_env=env,
            )
            return {"audio_l": l * out_gain, "audio_r": r * out_gain}, new_state

        self._fn = jax.jit(fn_sweep if backend == "sweep" else fn)

    def init_state(self) -> FusedBankState:
        c = self.n_channels
        return FusedBankState(
            nco_phase=np.zeros(c, np.uint32),
            sb_tail=np.zeros((c, 256), np.float32),
            audio_tail=np.zeros((c, 128), np.float32),
            agc_env=np.full(c, 1e-6, np.float32),
        )

    def process_planar(self, xr, xi, state: FusedBankState):
        return self._fn(state, xr, xi, self.incs, self.params.w_ssb,
                        self.params.w_pbt)

    def process(self, iq, state: FusedBankState):
        iq = np.asarray(iq)
        if iq.ndim == 1:
            iq = np.broadcast_to(iq, (self.n_channels,) + iq.shape)
        return self.process_planar(
            np.ascontiguousarray(iq.real, np.float32),
            np.ascontiguousarray(iq.imag, np.float32), state)


