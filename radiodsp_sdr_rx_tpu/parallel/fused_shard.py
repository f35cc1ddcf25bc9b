"""Channel-shard the fused Pallas banks over a device mesh (VERDICT r2 #9).

The fused single-sweep banks (models/fused.py) are embarrassingly parallel
across channels — no cross-channel communication anywhere in the kernels —
so multi-chip scaling is one `shard_map` over the mesh channel axis: every
device runs the SAME compiled fused kernel on its C/n_dev channel slice,
weights replicated, per-channel state and IQ sharded on axis 0. This helper
composes that in one call, closing the documented "shard the bank yourself"
ergonomics gap for >single-kernel-capacity banks:

>>> mesh = make_mesh(channel=8)
>>> bank = ShardedFusedBank(cfg, freqs_1024, mesh)   # class auto-picked
>>> out, state = bank.process_planar(xr, xi, bank.init_state())

The reference analog is simply "more receivers": the reference runs ONE
appliance per Teensy (RadioDSP_SDR_RX.ino); a bank of N is N boards. Here a
bank of 1024 is one call on a mesh.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from radiodsp_sdr_rx_tpu.models.config import DemodMode, ReceiverConfig


def _pick_cls(config: ReceiverConfig):
    from radiodsp_sdr_rx_tpu.models import fused

    if config.nr.kind != "off":
        # every reference-legal mode x NR combo has a folded fast path
        # (round 4: AM/SAM + lms/notch/spectral on the lanes kernel)
        return fused.FusedNRBank
    if config.mode == DemodMode.SAM:
        return fused.FusedSAMBank
    if config.mode == DemodMode.AM:
        return fused.FusedAMBank
    return fused.FusedSSBBank


def _weights(bank) -> tuple:
    """The replicated operand tuple each bank's process_planar feeds _fn."""
    name = type(bank).__name__
    p = bank.params
    if name == "FusedNRBank":
        w_main = p.w_ssb if bank._demod == "ssb" else p.w_sideband
        return (w_main, p.w_pbt, p.dft_cos, p.dft_sin)
    if name == "FusedSSBBank":
        return (p.w_ssb, p.w_pbt)
    if name in ("FusedSAMBank", "FusedAMBank"):
        return (p.w_sideband, p.w_pbt)
    raise TypeError(name)


class ShardedFusedBank:
    """A fused bank channel-sharded over ``mesh`` axis ``axis_name``.

    Same surface as the underlying bank (init_state / process /
    process_planar); requires len(freqs_hz) % mesh.shape[axis_name] == 0.
    Extra kwargs go to the underlying bank constructor (fold, block_t, ...).
    """

    def __init__(self, config: ReceiverConfig, freqs_hz, mesh: Mesh,
                 axis_name: str = "channel", cls=None, **bank_kw):
        n_dev = mesh.shape[axis_name]
        freqs = np.asarray(freqs_hz, np.float64)
        if len(freqs) % n_dev:
            raise ValueError(f"{len(freqs)} channels not divisible by "
                             f"{n_dev} '{axis_name}' devices")
        per = len(freqs) // n_dev
        cls = cls or _pick_cls(config)
        # one template bank per shard position ONLY for its incs; shard 0's
        # compiled fn serves every device (identical statics, incs are args)
        self.template = cls(config, freqs[:per], **bank_kw)
        self.n_channels = len(freqs)
        self.config = config
        self.mesh = mesh
        self.axis_name = axis_name
        self.incs = _incs_like(self.template, config, freqs)

        weights = _weights(self.template)
        chan = P(axis_name)
        fn = self.template._fn

        def local(state, xr, xi, incs, *w):
            return fn(state, xr, xi, incs, *w)

        from jax import shard_map

        # scalar state leaves (e.g. the LMS first-block flag) replicate;
        # per-channel leaves shard on axis 0
        def leaf_spec(leaf):
            return chan if np.ndim(leaf) > 0 else P()

        state_specs = jax.tree.map(leaf_spec, self._state_struct())
        self._sharded = jax.jit(shard_map(
            local, mesh=mesh,
            in_specs=(state_specs, chan, chan, chan)
            + tuple(P() for _ in weights),
            out_specs=(jax.tree.map(lambda _: chan,
                                    {"audio_l": 0, "audio_r": 0}),
                       state_specs),
            check_vma=False,
        ))
        self._weights = weights
        self._chan_sharding = NamedSharding(mesh, chan)

    def _state_struct(self):
        return self.template.init_state()

    def init_state(self):
        per_state = self.template.init_state()
        n_dev = self.mesh.shape[self.axis_name]

        def widen(leaf):
            leaf = np.asarray(leaf)
            if leaf.ndim == 0:       # shared scalar flag — replicate
                return leaf
            return jax.device_put(
                np.concatenate([leaf] * n_dev, axis=0), self._chan_sharding)

        return jax.tree.map(widen, per_state)

    def process_planar(self, xr, xi, state):
        xr = jax.device_put(xr, self._chan_sharding)
        xi = jax.device_put(xi, self._chan_sharding)
        incs = jax.device_put(self.incs, self._chan_sharding)
        return self._sharded(state, xr, xi, incs, *self._weights)

    def process(self, iq, state):
        iq = np.asarray(iq)
        if iq.ndim == 1:
            iq = np.broadcast_to(iq, (self.n_channels,) + iq.shape)
        return self.process_planar(
            np.ascontiguousarray(iq.real, np.float32),
            np.ascontiguousarray(iq.imag, np.float32), state)


def _incs_like(template, config: ReceiverConfig, freqs: np.ndarray):
    """Per-channel DDS increments with the template's exact formula."""
    from radiodsp_sdr_rx_tpu.ops import nco

    return np.stack([
        nco.freq_to_phase_inc(
            f - config.tuning_offset - config.capture_center_freq,
            config.sample_rate)
        for f in freqs
    ])
