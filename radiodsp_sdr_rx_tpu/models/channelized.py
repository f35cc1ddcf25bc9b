"""Channelized monitoring bank: PFB front end + per-channel processing.

Where ``ReceiverBank`` runs M independent full-rate DDC chains (cost O(M) per
input sample), this bank channelizes once with the polyphase filter bank
(ops/channelizer.py, cost O(taps/M + log M)) and then processes every channel
at the decimated rate — the architecture that makes BASELINE config 5's
1024-channel bank cheap. Per-channel processing offered at this stage:

  - 'baseband': raw complex channel streams (feed downstream demods)
  - 'am': envelope demod + DC blocker per channel (broadcast monitoring)
  - 'power': smoothed per-channel power (band scanner / activity map)
  - 'ssb': 2x-oversampled PFB + per-channel residual NCO + sideband
    filter/SSB demod at the channel rate (+ optional AGC) — arbitrary
    in-channel offsets, the case the critical PFB cannot serve

All stages are batched planar ops; state is a pytree like everything else.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from radiodsp_sdr_rx_tpu.ops import agc as agc_ops
from radiodsp_sdr_rx_tpu.ops import nco as nco_ops
from radiodsp_sdr_rx_tpu.ops.channelizer import OversampledPFB, PFBChannelizer
from radiodsp_sdr_rx_tpu.ops.fir_design import design_filter_mask
from radiodsp_sdr_rx_tpu.ops.iir import dc_blocker, first_order_iir
from radiodsp_sdr_rx_tpu.ops.pallas_kernels import ssb_demod_operator
from radiodsp_sdr_rx_tpu.ops.planar import ssb_filter_demod_planar


class ChannelizedState(NamedTuple):
    pfb: jax.Array       # PFB history carry
    dc: jax.Array        # (M, 2) per-channel DC-blocker carry
    power: jax.Array     # (M,) smoothed power carry
    nco: jax.Array       # (M,) residual-offset DDS phase (ssb mode)
    tail_r: jax.Array    # (M, 128) SSB overlap-save tails (ssb mode)
    tail_i: jax.Array
    env: jax.Array       # (M,) AGC envelope (ssb mode)


class ChannelizedBank:
    """M-channel PFB receiver bank.

    >>> bank = ChannelizedBank(n_channels=64, demod="am")
    >>> out, state = bank.process(iq, state)   # iq (n,) complex, n % M == 0
    >>> out["audio"].shape                      # (64, n // 64)

    SSB monitoring at arbitrary in-channel offsets (2x-oversampled front
    end; segment length must be a multiple of 64*M so the channel streams
    frame into 128-sample overlap-save blocks):

    >>> bank = ChannelizedBank(n_channels=64, demod="ssb",
    ...                        offsets_hz=offsets, agc="medium")
    >>> out["audio"].shape                      # (64, n // 64 * 2)
    """

    def __init__(self, n_channels: int, sample_rate: float = 44117.64706,
                 demod: str = "am", taps_per_phase: int = 8,
                 power_tau_blocks: float = 64.0,
                 offsets_hz=None, sideband: str = "usb",
                 filter_lo_hz: float = 300.0, filter_hi_hz: float = 3000.0,
                 agc: str = "off", buffer_remainder: bool = False):
        if demod not in ("baseband", "am", "power", "ssb"):
            raise ValueError(demod)
        self.m = n_channels
        self.demod = demod
        # buffer_remainder=True: accept arbitrary segment lengths by carrying
        # the unaligned tail host-side (see process_planar)
        self.buffer_remainder = buffer_remainder
        self._pending = None
        self.sample_rate = sample_rate
        if demod == "ssb":
            self.pfb = OversampledPFB(n_channels, taps_per_phase, sample_rate)
            self.channel_rate = 2.0 * sample_rate / n_channels
        else:
            self.pfb = PFBChannelizer(n_channels, taps_per_phase, sample_rate)
            self.channel_rate = sample_rate / n_channels
        self._pow_a = float(np.exp(-1.0 / power_tau_blocks))

        if demod == "ssb":
            hi = min(filter_hi_hz, 0.45 * self.channel_rate)
            lo, hi = (filter_lo_hz, hi) if sideband == "usb" else (-hi, -filter_lo_hz)
            mask = design_filter_mask(lo, hi, self.channel_rate)
            self._w_ssb = ssb_demod_operator(mask)
            offs = np.zeros(n_channels) if offsets_hz is None else np.asarray(
                offsets_hz, np.float64)
            if offs.shape != (n_channels,):
                raise ValueError("offsets_hz must have shape (n_channels,)")
            self._incs = np.stack([
                nco_ops.freq_to_phase_inc(f, self.channel_rate) for f in offs])
            presets = agc_ops.agc_presets(self.channel_rate)
            if agc not in presets:
                raise ValueError(f"agc must be one of {sorted(presets)}")
            self._agc = presets[agc]

        def fn(state: ChannelizedState, xr, xi):
            yr, yi, pfb_state = self.pfb(xr, xi, state.pfb)
            out = {"baseband_r": yr, "baseband_i": yi}
            dc, power = state.dc, state.power
            p_inst = yr * yr + yi * yi                     # (M, n_out)
            p_track, power = first_order_iir(
                p_inst, self._pow_a, 1.0 - self._pow_a, power)
            out["power"] = power
            out["power_track"] = p_track
            nco, tail_r, tail_i, env = (state.nco, state.tail_r,
                                        state.tail_i, state.env)
            if demod == "am":
                env_am = jnp.sqrt(p_inst)
                audio, dc = dc_blocker(env_am, dc)
                out["audio"] = audio
            elif demod == "ssb":
                n_out = yr.shape[-1]
                incs = jnp.asarray(self._incs, jnp.uint32)
                ph = jax.lax.bitcast_convert_type(state.nco, jnp.int32)
                inc_i = jax.lax.bitcast_convert_type(incs, jnp.int32)
                j = jnp.arange(n_out, dtype=jnp.int32)
                ang = ((ph[:, None] + j[None, :] * inc_i[:, None])
                       .astype(jnp.float32) * np.float32(2 * np.pi / 2**32))
                c, s = jnp.cos(ang), jnp.sin(ang)
                mr = yr * c + yi * s
                mi = yi * c - yr * s
                audio, tail_r, tail_i = ssb_filter_demod_planar(
                    mr, mi, jnp.asarray(self._w_ssb), tail_r, tail_i)
                audio, env = agc_ops.agc_run(audio, self._agc, env)
                nco = state.nco + jnp.asarray(n_out, jnp.uint32) * incs
                out["audio"] = audio
            return out, ChannelizedState(pfb=pfb_state, dc=dc, power=power,
                                         nco=nco, tail_r=tail_r,
                                         tail_i=tail_i, env=env)

        self._fn = jax.jit(fn)

    def init_state(self) -> ChannelizedState:
        return ChannelizedState(
            pfb=self.pfb.init_state(),
            dc=np.zeros((self.m, 2), np.float32),
            power=np.zeros(self.m, np.float32),
            nco=np.zeros(self.m, np.uint32),
            tail_r=np.zeros((self.m, 128), np.float32),
            tail_i=np.zeros((self.m, 128), np.float32),
            env=np.full(self.m, 1e-6, np.float32),
        )

    @property
    def segment_multiple(self) -> int:
        """Smallest legal segment length (inputs must be a multiple of this).

        baseband/am/power modes need n % M == 0 (one PFB frame per output
        sample); ssb mode additionally needs the 2x-rate channel streams to
        frame into 128-sample overlap-save blocks -> n % (64*M) == 0. Host
        feeders (StreamingReceiver / utils.native_io ring) deliver aligned
        segments by construction; arbitrary captures should be truncated or
        zero-padded by the caller to this multiple.
        """
        return 64 * self.m if self.demod == "ssb" else self.m

    def channel_freq(self, k: int, center_freq: float = 0.0) -> float:
        """RF center of channel k (k >= M/2 wraps to negative offsets)."""
        off = k * self.sample_rate / self.m
        if k >= self.m // 2:
            off -= self.sample_rate
        return center_freq + off

    def _check_len(self, n: int) -> None:
        m = self.segment_multiple
        if n % m:
            # plain variable, not a nested-quote f-string expression: that is
            # PEP 701 syntax and would fail to parse on Python 3.10/3.11
            if self.demod == "ssb":
                reason = ("64*M: 2x-rate channel streams must frame into "
                          "128-sample overlap-save blocks")
            else:
                reason = "M: one PFB frame per channel-rate sample"
            raise ValueError(
                f"segment length {n} must be a multiple of {m} ({reason}); "
                f"truncate or pad to n={n - n % m or m}, or construct the "
                f"bank with buffer_remainder=True")

    def process(self, iq, state: ChannelizedState):
        iq = np.asarray(iq) if isinstance(iq, np.ndarray) else iq
        if isinstance(iq, np.ndarray) and np.iscomplexobj(iq):
            xr = np.ascontiguousarray(iq.real, np.float32)
            xi = np.ascontiguousarray(iq.imag, np.float32)
        elif jnp.iscomplexobj(iq):
            xr, xi = iq.real.astype(jnp.float32), iq.imag.astype(jnp.float32)
        else:
            xr, xi = iq, jnp.zeros_like(iq)
        return self.process_planar(xr, xi, state)

    def process_planar(self, xr, xi, state: ChannelizedState):
        if not self.buffer_remainder:
            self._check_len(xr.shape[-1])
            return self._fn(state, xr, xi)
        # unaligned-feed convenience (VERDICT r2 #9): carry the unaligned
        # tail in a host-side buffer and process the largest aligned prefix.
        # Outputs cover only that prefix (possibly 0 samples); sample counts
        # across calls are conserved. Note each distinct aligned length
        # compiles once — steady feeders settle on one or two shapes.
        xr = np.asarray(xr, np.float32)
        xi = np.asarray(xi, np.float32)
        if self._pending is not None:
            xr = np.concatenate([self._pending[0], xr], axis=-1)
            xi = np.concatenate([self._pending[1], xi], axis=-1)
            self._pending = None
        m = self.segment_multiple
        n_ok = xr.shape[-1] - xr.shape[-1] % m
        if n_ok < xr.shape[-1]:
            self._pending = (xr[..., n_ok:], xi[..., n_ok:])
            xr, xi = xr[..., :n_ok], xi[..., :n_ok]
        if n_ok == 0:
            empty = {"baseband_r": np.zeros((self.m, 0), np.float32),
                     "baseband_i": np.zeros((self.m, 0), np.float32),
                     "power_track": np.zeros((self.m, 0), np.float32),
                     "power": state.power}
            if self.demod in ("am", "ssb"):
                empty["audio"] = np.zeros((self.m, 0), np.float32)
            return empty, state
        return self._fn(state, xr, xi)

    @property
    def pending_samples(self) -> int:
        """Input samples buffered awaiting alignment (buffer_remainder)."""
        return 0 if self._pending is None else self._pending[0].shape[-1]
