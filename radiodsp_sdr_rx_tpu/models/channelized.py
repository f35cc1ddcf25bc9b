"""Channelized monitoring bank: PFB front end + per-channel processing.

Where ``ReceiverBank`` runs M independent full-rate DDC chains (cost O(M) per
input sample), this bank channelizes once with the polyphase filter bank
(ops/channelizer.py, cost O(taps/M + log M)) and then processes every channel
at the decimated rate fs/M — the architecture that makes BASELINE config 5's
1024-channel bank cheap. Per-channel processing offered at this stage:

  - 'baseband': raw complex channel streams (feed downstream demods)
  - 'am': envelope demod + DC blocker per channel (broadcast monitoring)
  - 'power': smoothed per-channel power (band scanner / activity map)

All stages are batched planar ops; state is a pytree like everything else.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from radiodsp_sdr_rx_tpu.ops.channelizer import PFBChannelizer
from radiodsp_sdr_rx_tpu.ops.iir import dc_blocker, first_order_iir


class ChannelizedState(NamedTuple):
    pfb: jax.Array       # PFB history carry
    dc: jax.Array        # (M, 2) per-channel DC-blocker carry
    power: jax.Array     # (M,) smoothed power carry


class ChannelizedBank:
    """M-channel PFB receiver bank.

    >>> bank = ChannelizedBank(n_channels=64, demod="am")
    >>> out, state = bank.process(iq, state)   # iq (n,) complex, n % M == 0
    >>> out["audio"].shape                      # (64, n // 64)
    """

    def __init__(self, n_channels: int, sample_rate: float = 44117.64706,
                 demod: str = "am", taps_per_phase: int = 8,
                 power_tau_blocks: float = 64.0):
        if demod not in ("baseband", "am", "power"):
            raise ValueError(demod)
        self.m = n_channels
        self.demod = demod
        self.sample_rate = sample_rate
        self.channel_rate = sample_rate / n_channels
        self.pfb = PFBChannelizer(n_channels, taps_per_phase, sample_rate)
        self._pow_a = float(np.exp(-1.0 / power_tau_blocks))

        def fn(state: ChannelizedState, xr, xi):
            yr, yi, pfb_state = self.pfb(xr, xi, state.pfb)
            out = {"baseband_r": yr, "baseband_i": yi}
            dc, power = state.dc, state.power
            p_inst = yr * yr + yi * yi                     # (M, n_out)
            p_track, power = first_order_iir(
                p_inst, self._pow_a, 1.0 - self._pow_a, power)
            out["power"] = power
            out["power_track"] = p_track
            if demod == "am":
                env = jnp.sqrt(p_inst)
                audio, dc = dc_blocker(env, dc)
                out["audio"] = audio
            return out, ChannelizedState(pfb=pfb_state, dc=dc, power=power)

        self._fn = jax.jit(fn)

    def init_state(self) -> ChannelizedState:
        return ChannelizedState(
            pfb=self.pfb.init_state(),
            dc=np.zeros((self.m, 2), np.float32),
            power=np.zeros(self.m, np.float32),
        )

    def channel_freq(self, k: int, center_freq: float = 0.0) -> float:
        """RF center of channel k (k >= M/2 wraps to negative offsets)."""
        off = k * self.channel_rate
        if k >= self.m // 2:
            off -= self.sample_rate
        return center_freq + off

    def process(self, iq, state: ChannelizedState):
        iq = np.asarray(iq) if isinstance(iq, np.ndarray) else iq
        if isinstance(iq, np.ndarray) and np.iscomplexobj(iq):
            xr = np.ascontiguousarray(iq.real, np.float32)
            xi = np.ascontiguousarray(iq.imag, np.float32)
        elif jnp.iscomplexobj(iq):
            xr, xi = iq.real.astype(jnp.float32), iq.imag.astype(jnp.float32)
        else:
            xr, xi = iq, jnp.zeros_like(iq)
        return self._fn(state, xr, xi)

    def process_planar(self, xr, xi, state: ChannelizedState):
        return self._fn(state, xr, xi)
