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

``FusedAMBank`` is the same single-sweep design for AM (envelope + DC blocker
demod between the band-pass and the AGC — ops/pallas_sweep.sweep_am_chain);
the reference runs AM through the same conv engine as SSB
(RDSP_convolutional.h:228-353), and so does this fast path.

Use when: many-channel monitoring at maximum throughput. Since round 4
EVERY reference-legal mode x NR combination has a folded fast path
(FusedNRBank covers AM/SAM + lms/notch/spectral on the lanes kernel;
FusedSAMBank adds the sublane-wide PLL for multi-group banks), and since
round 5 the noise blanker folds into every sweep kernel as a pre-mix
stage (VERDICT r4 #4) — no reference-legal config falls back.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from radiodsp_sdr_rx_tpu.models.config import DemodMode, ReceiverConfig
from radiodsp_sdr_rx_tpu.models.receiver import _PRECISIONS, build_params
from radiodsp_sdr_rx_tpu.ops import agc as agc_ops
from radiodsp_sdr_rx_tpu.ops import nco, pallas_kernels


class FusedBankState(NamedTuple):
    """Carry for the fused banks.

    ``sb_tail`` semantics differ by backend and the two state blobs are NOT
    interchangeable: the "sweep" backend stores the RAW input's last block
    [re|im] (gain/balance are folded into the kernel, which re-scales and
    re-mixes the tail in-kernel), while the "staged" backend stores the
    already scaled+mixed stream's last block.
    """
    nco_phase: jax.Array   # (C,) uint32 DDS phase words
    sb_tail: jax.Array     # (C, 256) f32 [re|im] framing tail (see above)
    audio_tail: jax.Array  # (C, 128) f32 PBT framing tail
    agc_env: jax.Array     # (C,) f32
    nb_avg: jax.Array      # (C,) f32 noise-blanker running-average carry
    nb_mask: jax.Array     # (C, 128) f32 NB keep mask of the tail block


class FusedSSBBank:
    """Many-channel fused SSB receiver (USB/LSB/CW/RTTY + AGC)."""

    def __init__(self, config: ReceiverConfig, freqs_hz,
                 block_c: int = 8, block_t: int = 4096,
                 backend: str = "sweep",
                 kernel_precision: str | None = None,
                 interpret: bool = False):
        """``kernel_precision``: None (default) keeps the sweep kernel's
        1-pass-bf16 MXU matmuls — the speed-of-light path, parity vs the f32
        bank ~1e-3 (docs/CHIP_PARITY.md); "highest"/"high"/"bf16" forces a
        precision (config.matmul_precision stays the STAGED backend's and XLA
        bank's knob). The linear SSB/AM chains tolerate bf16; the adaptive
        folded chains (FusedNRBank/FusedSAMBank) always follow the config."""
        if config.mode in (DemodMode.AM, DemodMode.SAM):
            raise ValueError("FusedSSBBank covers SSB modes; use ReceiverBank")
        if config.nr.kind != "off":
            raise ValueError("NR configs use FusedNRBank/ReceiverBank")
        if backend not in ("staged", "sweep"):
            raise ValueError(backend)
        if config.noise_blanker and backend != "sweep":
            raise ValueError("the noise blanker folds into the sweep "
                             "backend only (round 5); use backend='sweep'")
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
            # input gain / IQ balance fold INTO the kernel: scaling outside
            # costs two full HBM read+write passes on a bandwidth-bound chain
            # (sb_tail therefore carries the RAW input's last block)
            from radiodsp_sdr_rx_tpu.ops.pallas_sweep import sweep_full_chain
            out = sweep_full_chain(
                xr, xi, incs, state.nco_phase,
                w_ssb, w_pbt,
                state.sb_tail[:, :128], state.sb_tail[:, 128:],
                state.audio_tail, state.agc_env,
                agc_release=agc_params.release, agc_target=agc_params.target,
                agc_max_gain=agc_params.max_gain,
                agc_enabled=bool(agc_params.enabled),
                out_gain=float(out_gain),
                block_c=block_c, chunk_t=block_t, interpret=interpret,
                in_gain=float(in_gain),
                iq_balance=float(config.iq_gain_balance),
                nb=bool(config.noise_blanker),
                nb_thresh_db=float(config.nb_threshold_db),
                nb_tau=float(config.nb_tau_samples),
                nb_avg0=state.nb_avg, nb_mask0=state.nb_mask,
                precision=None if kernel_precision is None
                else _PRECISIONS[kernel_precision],
            )
            if config.noise_blanker:
                l, r, atail, env, nb_avg, nb_mask = out
            else:
                l, r, atail, env = out
                nb_avg, nb_mask = state.nb_avg, state.nb_mask
            new_state = FusedBankState(
                nco_phase=state.nco_phase
                + jnp.asarray(n, jnp.uint32) * incs.astype(jnp.uint32),
                sb_tail=jnp.concatenate([xr[:, -128:], xi[:, -128:]], axis=-1),
                audio_tail=atail,
                agc_env=env,
                nb_avg=nb_avg, nb_mask=nb_mask,
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
                nb_avg=state.nb_avg, nb_mask=state.nb_mask,
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
            nb_avg=np.zeros(c, np.float32),
            nb_mask=np.ones((c, 128), np.float32),
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


class FusedNRBankState(NamedTuple):
    nco_phase: jax.Array    # (C,) uint32 DDS phase words
    sb_tail: jax.Array      # (C, 256) f32 [re|im] raw-scaled-input framing tail
    audio_tail: jax.Array   # (C, 128) f32 PBT framing tail
    agc_env: jax.Array      # (C,) f32
    lms_weights: jax.Array  # (128, taps) f32 (bank padded to the LMS lane width)
    lms_window: jax.Array   # (128, taps) f32
    lms_delay: jax.Array    # (128, LMS_DELAY) f32
    lms_first: jax.Array    # bool (reference first-block quirk)
    nfloor: jax.Array       # (C,) f32 spectral-subtraction noise-floor carry
    spec_tail_l: jax.Array  # (C, 128) f32 spectral-subtraction frame carries
    spec_tail_r: jax.Array  # (C, 128) f32
    dc: jax.Array           # (C, 2) f32 AM/SAM DC-blocker carry
    pll: jax.Array          # (2, lanes) f32 SAM PLL [phase | freq]
    nb_avg: jax.Array       # (C,) f32 noise-blanker running-average carry
    nb_mask: jax.Array      # (C, 128) f32 NB keep mask of the tail block


class FusedNRBank:
    """Many-channel receiver with a noise-reduction stage, on the Pallas
    fast paths — EVERY reference mode (SSB/CW, AM, SAM) x NR engine combo
    (the reference applies NR to every mode's audio,
    RadioDSP_SDR_RX.ino:198). Covers the three reference NR engines
    (VERDICT r1 #3; AM/SAM folding is round 4 / VERDICT r3 #3):

      - nr.kind == "lms" (DNR1-4): whole linear chain in the single-sweep
        kernel (mono), then the cross-channel Pallas LMS denoiser + x1.1
        makeup gain + R<-L (RDSP_convolutional.h:326-337 order).
      - nr.kind == "spectral" (SPEC1-4): single-sweep kernel (stereo), then
        the backup engine's spectral subtraction as planar DFT matmuls
        (src/backup/RDSP_convolutional_spec.h:112-252 semantics).
      - nr.kind == "notch": the ALS auto-notch sits BETWEEN demod and AGC
        (RDSP_controls.h:257-262), so this path stages: Pallas
        mix+filter+demod kernel -> Pallas LMS notch -> XLA AGC -> Pallas PBT.

    Output gain is applied after the NR stage (rx_chain order) — the sweep
    kernel runs with out_gain=1 here because normalized LMS is not exactly
    scale-invariant (the CMSIS eps term). Channel count may be <= 128; the
    LMS lanes are padded internally (the zero channels adapt to zero).
    Matches ReceiverBank to f32 tolerance (tests/test_fused_bank.py).
    """

    def __init__(self, config: ReceiverConfig, freqs_hz,
                 block_c: int = 8, block_t: int = 8192,
                 lms_chunk: int = 4096,
                 fold: bool = True,
                 fold_chunk: int = 2048,
                 fold_group: int = 16,
                 kernel_precision: str | None = "high",
                 interpret: bool = False):
        """``fold=True`` (default) runs NR stages folded INTO the single-sweep
        kernel where a folded kernel exists (spectral:
        ops/pallas_sweep_spec.sweep_spec_chain — one kernel, no extra HBM
        round-trips); ``fold=False`` keeps the staged sweep+XLA pipeline
        (also the parity oracle in tests/test_fused_bank.py).

        ``fold_chunk`` defaults to the measured optimum under the 64 MB
        scoped-VMEM limit (round 5, tools/bench_fold_r4.py on-chip: notch
        1886/1965/1911 and lms 1924/1994 Ms/s at 1024/2048/4096 — 2048
        wins, and its fully-unrolled macro stream compiles ~3x faster
        than 4096's).

        ``kernel_precision`` sets the FOLDED kernels' MXU matmul passes and
        defaults to "high" (bf16x3, ~107 dB SNR vs the f32 oracle — above the
        reference's ~90 dB q15 boundary, docs/PERFORMANCE.md) — the measured
        production sweet spot (round 4: config 4 1.5->2.0 Gs/s). None follows
        config.matmul_precision (the XLA/staged paths' knob) for bit-level
        oracle comparisons."""
        from radiodsp_sdr_rx_tpu.ops import lms as lms_ops
        from radiodsp_sdr_rx_tpu.ops.pallas_lms import LANES

        if config.nr.kind not in ("lms", "spectral", "notch"):
            raise ValueError("FusedNRBank needs an NR config; use "
                             "FusedSSBBank for nr=off")
        if config.noise_blanker and not fold:
            raise ValueError("the noise blanker folds into the lanes kernel "
                             "(fold=True); the staged oracle is ReceiverBank")
        demod = {DemodMode.AM: "am", DemodMode.SAM: "sam"}.get(
            config.mode, "ssb")
        if demod != "ssb" and not fold:
            raise ValueError("AM/SAM + NR run on the folded lanes kernel "
                             "(fold=True); the staged oracle is ReceiverBank")
        self._demod = demod
        # the lanes kernel serves: lms/notch for every mode, spectral for
        # AM/SAM, and ANY noise-blanker combo (the NB stage folds into the
        # lanes kernel only — round 5); ssb+spectral without NB keeps the
        # faster ch-major spec kernel, which grids over 8-channel blocks
        # and has NO channel ceiling
        fold_lanes = fold and (config.nr.kind in ("lms", "notch")
                               or demod != "ssb" or config.noise_blanker)
        if len(freqs_hz) > LANES and not fold:
            raise ValueError(f"FusedNRBank supports <= {LANES} channels on "
                             "the staged path (fold=True lifts the ceiling)")
        self.config = config
        self.n_channels = len(freqs_hz)
        # folded lanes kernel grids over 128-channel groups: round up
        self._lanes = max(LANES, -(-len(freqs_hz) // LANES) * LANES) \
            if fold_lanes else LANES
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
        in_gain = np.float32(config.input_gain)
        out_gain = np.float32(config.output_gain)
        balance = np.float32(config.iq_gain_balance)
        kind = config.nr.kind
        c = self.n_channels
        from radiodsp_sdr_rx_tpu.models.receiver import _PRECISIONS
        prec = _PRECISIONS[config.matmul_precision]
        fold_prec = _PRECISIONS[kernel_precision or config.matmul_precision]
        if demod == "sam" and kind != "off":
            # sam combos hold the PLL planes (t_buf, t_buf2) PLUS the NR
            # stage's extras (lms d_buf, or the 1.5 MB spectral operators)
            # in VMEM; keep their chunk at 1024 under the raised 64 MB
            # scoped-vmem limit (they OOM'd the old 16 MB default at 1024,
            # and the serial PLL dominates sam throughput anyway — chunk
            # size measured ~flat on the sam rows, tools/bench_fold_r4.py)
            fold_chunk = min(fold_chunk, 1024)

        def run_lms(audio, state: FusedNRBankState, lms_mode: str):
            from radiodsp_sdr_rx_tpu.ops.pallas_lms import lms_nr_run_pallas

            pad = self._lanes - c
            a = jnp.pad(audio, ((0, pad), (0, 0))) if pad else audio
            out, w2, win2, d2 = lms_nr_run_pallas(
                a, state.lms_weights, state.lms_window, state.lms_delay,
                state.lms_first, p.lms_mu, mode=lms_mode, chunk=lms_chunk,
                interpret=interpret or jax.default_backend() == "cpu")
            return out[:c], dict(lms_weights=w2, lms_window=win2,
                                 lms_delay=d2,
                                 lms_first=jnp.asarray(False))

        def fn_lanes(state: FusedNRBankState, xr, xi, incs, w_ssb, w_pbt,
                     dft_cos, dft_sin):
            """LMS denoise/notch folded INTO the sweep kernel
            (ops/pallas_chain_lanes.sweep_lanes_chain): MXU tile transposes
            move the stream to channels-on-lanes for the adaptive stage and
            back, all in VMEM — no staged HBM round-trips."""
            from radiodsp_sdr_rx_tpu.ops.pallas_chain_lanes import (
                sweep_lanes_chain,
            )

            n = xr.shape[-1]
            lanes = self._lanes
            pad = lanes - c

            def padc(a):
                if not pad:
                    return a
                return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))

            nr_name = {"lms": "denoise", "notch": "notch",
                       "spectral": "spectral"}[kind]
            spec_kw = {}
            if kind == "spectral":
                spec_kw = dict(
                    w_spec_fwd=self._w_spec[0], w_spec_inv=self._w_spec[1],
                    nfloor0=padc(state.nfloor),
                    spec_tail_l=padc(state.spec_tail_l),
                    spec_tail_r=padc(state.spec_tail_r),
                    nr_level=float(config.nr.level))
            nb_on = bool(config.noise_blanker)
            if nb_on:
                spec_kw.update(nb=True,
                               nb_thresh_db=float(config.nb_threshold_db),
                               nb_tau=float(config.nb_tau_samples),
                               nb_avg0=padc(state.nb_avg),
                               nb_mask0=padc(state.nb_mask))
            outs = sweep_lanes_chain(
                padc(xr), padc(xi), padc(incs), padc(state.nco_phase),
                w_ssb, w_pbt,
                padc(state.sb_tail[:, :128]), padc(state.sb_tail[:, 128:]),
                padc(state.audio_tail), padc(state.agc_env),
                demod=demod, nr=nr_name,
                agc_release=agc_params.release,
                agc_target=agc_params.target,
                agc_max_gain=agc_params.max_gain,
                agc_enabled=bool(agc_params.enabled),
                out_gain=float(out_gain), interpret=interpret
                or jax.default_backend() == "cpu",
                in_gain=float(in_gain), iq_balance=float(balance),
                lms_weights=jnp.swapaxes(state.lms_weights, 0, 1),
                lms_window=jnp.swapaxes(state.lms_window, 0, 1),
                lms_delay_block=jnp.swapaxes(state.lms_delay, 0, 1),
                lms_first=state.lms_first,
                mu=float(lms_ops.lms_mu_from_strength(
                    config.nr.level if config.nr.level > 0 else 20)),
                chunk_t=fold_chunk, group=fold_group,
                dc0=padc(state.dc), pll0=state.pll,
                sample_rate=config.sample_rate,
                precision=fold_prec, **spec_kw)
            (l, r, atail, env, w2, win2, dly2, dc2, pll2,
             nfl2, stl2, str2) = outs[:12]
            nb_avg2 = outs[12][:c] if nb_on else state.nb_avg
            nb_mask2 = outs[13][:c] if nb_on else state.nb_mask
            l = l[:c]
            r = l if kind == "lms" else r[:c]   # mono copy R<-L for DNR
            new_state = FusedNRBankState(
                nco_phase=state.nco_phase
                + jnp.asarray(n, jnp.uint32) * incs.astype(jnp.uint32),
                # RAW input tail — the kernel re-scales and re-mixes it
                # (sweep-backend semantics, FusedBankState docstring)
                sb_tail=jnp.concatenate([xr[:, -128:], xi[:, -128:]], axis=-1),
                audio_tail=atail[:c],
                agc_env=env[:c],
                lms_weights=jnp.swapaxes(w2, 0, 1),
                lms_window=jnp.swapaxes(win2, 0, 1),
                lms_delay=jnp.swapaxes(dly2, 0, 1),
                lms_first=jnp.asarray(False),
                nfloor=nfl2[:c] if kind == "spectral" else state.nfloor,
                spec_tail_l=stl2[:c] if kind == "spectral"
                else state.spec_tail_l,
                spec_tail_r=str2[:c] if kind == "spectral"
                else state.spec_tail_r,
                dc=dc2[:c], pll=pll2,
                nb_avg=nb_avg2, nb_mask=nb_mask2,
            )
            return {"audio_l": l, "audio_r": r}, new_state

        fold_spectral = (fold and kind == "spectral" and demod == "ssb"
                         and not config.noise_blanker)
        if fold and kind == "spectral":
            from radiodsp_sdr_rx_tpu.ops.spectral_sub import spectral_matmul_ops
            w_sf, w_si = spectral_matmul_ops(config.fft_length)
            self._w_spec = (jnp.asarray(w_sf), jnp.asarray(w_si))
            nr_level_static = float(config.nr.level)

        def fn_spec_fold(state: FusedNRBankState, xr, xi, incs, w_ssb, w_pbt,
                         dft_cos, dft_sin):
            """Whole chain INCLUDING spectral subtraction in one kernel.
            Gains fold in-kernel; sb_tail carries the RAW input's last block
            (sweep-backend semantics, see FusedBankState)."""
            from radiodsp_sdr_rx_tpu.ops.pallas_sweep_spec import (
                sweep_spec_chain,
            )

            n = xr.shape[-1]
            l, r, atail, env, nfloor, spec_l, spec_r = sweep_spec_chain(
                xr, xi, incs, state.nco_phase, w_ssb, w_pbt,
                self._w_spec[0], self._w_spec[1],
                state.sb_tail[:, :128], state.sb_tail[:, 128:],
                state.audio_tail, state.agc_env, state.nfloor,
                state.spec_tail_l, state.spec_tail_r,
                nr_level=nr_level_static,
                agc_release=agc_params.release,
                agc_target=agc_params.target,
                agc_max_gain=agc_params.max_gain,
                agc_enabled=bool(agc_params.enabled),
                out_gain=float(out_gain),
                block_c=block_c, chunk_t=block_t, interpret=interpret,
                in_gain=float(in_gain), iq_balance=float(balance),
                precision=fold_prec)
            new_state = FusedNRBankState(
                nco_phase=state.nco_phase
                + jnp.asarray(n, jnp.uint32) * incs.astype(jnp.uint32),
                sb_tail=jnp.concatenate([xr[:, -128:], xi[:, -128:]], axis=-1),
                audio_tail=atail,
                agc_env=env,
                lms_weights=state.lms_weights,
                lms_window=state.lms_window,
                lms_delay=state.lms_delay,
                lms_first=state.lms_first,
                nfloor=nfloor, spec_tail_l=spec_l, spec_tail_r=spec_r,
                dc=state.dc, pll=state.pll,
                nb_avg=state.nb_avg, nb_mask=state.nb_mask,
            )
            return {"audio_l": l, "audio_r": r}, new_state

        def fn(state: FusedNRBankState, xr, xi, incs, w_ssb, w_pbt,
               dft_cos, dft_sin):
            from radiodsp_sdr_rx_tpu.ops.pallas_sweep import sweep_full_chain
            from radiodsp_sdr_rx_tpu.ops.planar import spectral_subtract_planar

            n = xr.shape[-1]
            xr = xr * in_gain
            xi = xi * (in_gain * balance)
            upd: dict = {}

            if kind == "notch":
                # notch precedes AGC: staged kernels around the LMS
                audio = pallas_kernels.fused_mix_filter_demod(
                    xr, xi, incs, state.nco_phase, w_ssb,
                    tail=state.sb_tail, block_c=block_c, block_t=block_t,
                    interpret=interpret)
                audio, upd = run_lms(audio, state, "notch")
                audio, env = agc_ops.agc_run(audio, agc_params, state.agc_env)
                l, r = pallas_kernels.pbt_filter(
                    audio, w_pbt, tail=state.audio_tail,
                    block_c=block_c, block_t=block_t, interpret=interpret)
                atail = audio[:, -128:]
            else:
                l, r, atail, env = sweep_full_chain(
                    xr, xi, incs, state.nco_phase, w_ssb, w_pbt,
                    state.sb_tail[:, :128], state.sb_tail[:, 128:],
                    state.audio_tail, state.agc_env,
                    agc_release=agc_params.release,
                    agc_target=agc_params.target,
                    agc_max_gain=agc_params.max_gain,
                    agc_enabled=bool(agc_params.enabled),
                    out_gain=1.0, block_c=block_c, chunk_t=block_t,
                    emit_r=(kind == "spectral"), interpret=interpret)

            nfloor = state.nfloor
            spec_l, spec_r = state.spec_tail_l, state.spec_tail_r
            if kind == "lms":
                l, upd = run_lms(l, state, "denoise")
                l = l * np.float32(1.1)   # makeup (RDSP_convolutional.h:334)
                r = l                     # mono copy R<-L (:335)
            elif kind == "spectral":
                l, r, nfloor, spec_l, spec_r = spectral_subtract_planar(
                    l, r, p.nr_level, nfloor, dft_cos, dft_sin,
                    spec_l, spec_r, precision=prec)

            new_state = FusedNRBankState(
                nco_phase=state.nco_phase
                + jnp.asarray(n, jnp.uint32) * incs.astype(jnp.uint32),
                sb_tail=jnp.concatenate([xr[:, -128:], xi[:, -128:]], axis=-1),
                audio_tail=atail,
                agc_env=env,
                lms_weights=upd.get("lms_weights", state.lms_weights),
                lms_window=upd.get("lms_window", state.lms_window),
                lms_delay=upd.get("lms_delay", state.lms_delay),
                lms_first=upd.get("lms_first", state.lms_first),
                nfloor=nfloor, spec_tail_l=spec_l, spec_tail_r=spec_r,
                dc=state.dc, pll=state.pll,
                nb_avg=state.nb_avg, nb_mask=state.nb_mask,
            )
            return {"audio_l": l * out_gain, "audio_r": r * out_gain}, new_state

        if fold_spectral:
            self._fn = jax.jit(fn_spec_fold)
        elif fold_lanes:
            self._fn = jax.jit(fn_lanes)
        else:
            self._fn = jax.jit(fn)

    def init_state(self) -> FusedNRBankState:
        from radiodsp_sdr_rx_tpu.ops.lms import LMS_DELAY, LMS_TAPS

        c, lanes = self.n_channels, self._lanes
        return FusedNRBankState(
            nco_phase=np.zeros(c, np.uint32),
            sb_tail=np.zeros((c, 256), np.float32),
            audio_tail=np.zeros((c, 128), np.float32),
            agc_env=np.full(c, 1e-6, np.float32),
            lms_weights=np.zeros((lanes, LMS_TAPS), np.float32),
            lms_window=np.zeros((lanes, LMS_TAPS), np.float32),
            lms_delay=np.zeros((lanes, LMS_DELAY), np.float32),
            lms_first=np.bool_(True),
            nfloor=np.zeros(c, np.float32),
            spec_tail_l=np.zeros((c, 128), np.float32),
            spec_tail_r=np.zeros((c, 128), np.float32),
            dc=np.zeros((c, 2), np.float32),
            pll=np.zeros((2, lanes), np.float32),
            nb_avg=np.zeros(c, np.float32),
            nb_mask=np.ones((c, 128), np.float32),
        )

    def process_planar(self, xr, xi, state: FusedNRBankState):
        w_main = (self.params.w_ssb if self._demod == "ssb"
                  else self.params.w_sideband)
        return self._fn(state, xr, xi, self.incs, w_main,
                        self.params.w_pbt, self.params.dft_cos,
                        self.params.dft_sin)

    def process(self, iq, state: FusedNRBankState):
        iq = np.asarray(iq)
        if iq.ndim == 1:
            iq = np.broadcast_to(iq, (self.n_channels,) + iq.shape)
        return self.process_planar(
            np.ascontiguousarray(iq.real, np.float32),
            np.ascontiguousarray(iq.imag, np.float32), state)


class FusedSAMBankState(NamedTuple):
    """``sb_tail`` semantics differ by backend (NOT interchangeable):
    fold=True stores the RAW input's last block (re-scaled and re-mixed
    in-kernel); the staged backend stores the MIXED stream's last block."""
    nco_phase: jax.Array   # (C,) uint32 DDS phase words
    sb_tail: jax.Array     # (C, 256) f32 [re|im] framing tail (see above)
    audio_tail: jax.Array  # (C, 128) f32 PBT framing tail
    agc_env: jax.Array     # (C,) f32
    nb_avg: jax.Array      # (C,) f32 noise-blanker running-average carry
    nb_mask: jax.Array     # (C, 128) f32 NB keep mask of the tail block
    sam_phase: jax.Array   # (lanes,) f32 PLL phase (padded to lane width)
    sam_freq: jax.Array    # (lanes,) f32 PLL frequency
    sam_dc: jax.Array      # (C, 2) f32 DC-blocker carry


class FusedSAMBank:
    """Many-channel synchronous-AM receiver on the Pallas SAM PLL kernel.

    Pipeline: XLA planar NCO mix + collapsed-MXU band-pass ->
    ops/pallas_sam.sam_pll_run_pallas (channels across lanes — the PLL is the
    sequential bottleneck, so it gets the kernel) -> XLA DC blocker + AGC ->
    Pallas PBT kernel. Matches ReceiverBank(mode=SAM) to f32 tolerance
    (tests/test_fused_bank.py). Channels <= 128 (PLL lanes padded internally).
    """

    def __init__(self, config: ReceiverConfig, freqs_hz,
                 block_c: int = 8, block_t: int = 4096,
                 sam_chunk: int | None = None,
                 max_kernel_seg: int = 1 << 16,
                 fold: bool = True,
                 kernel_precision: str | None = "high",
                 wide_groups: int | None = None,
                 interpret: bool = False):
        """``fold=True`` (default) runs the WHOLE SAM chain in one kernel
        (ops/pallas_chain_lanes.sweep_lanes_chain stage="sam": band-pass
        matmul, PLL on lanes via MXU tile transposes, DC blocker, AGC, PBT —
        no staged HBM round-trips); ``fold=False`` keeps the staged
        XLA-sandwich path (the parity oracle).

        ``sam_chunk`` is the kernel time chunk: default 1024 folded (the
        measured optimum for the round-5 fast-PLL pipelined stream: 1307
        vs 1299 Ms/s at 2048 on the chip, and half the compile time; the
        wide multi-group kernel caps its own chunk at 256 — G=8 crashes
        the remote compiler at 512) and 4096 staged."""
        from radiodsp_sdr_rx_tpu.ops.pallas_sam import LANES

        if sam_chunk is None:
            sam_chunk = 1024 if fold else 4096

        if config.mode != DemodMode.SAM:
            raise ValueError("FusedSAMBank covers SAM; use FusedAMBank or "
                             "ReceiverBank")
        if config.nr.kind != "off":
            raise ValueError("SAM + NR runs on FusedNRBank")
        if config.noise_blanker and not fold:
            raise ValueError("the noise blanker folds into the Pallas "
                             "kernels (fold=True); the staged oracle is "
                             "ReceiverBank")
        if len(freqs_hz) > LANES and not fold:
            raise ValueError(f"FusedSAMBank supports <= {LANES} channels on "
                             "the staged path (fold=True lifts the ceiling)")
        self.config = config
        self.n_channels = len(freqs_hz)
        self._lanes = max(LANES, -(-len(freqs_hz) // LANES) * LANES) \
            if fold else LANES
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
        in_gain = np.float32(config.input_gain)
        out_gain = np.float32(config.output_gain)
        balance = np.float32(config.iq_gain_balance)
        fs = config.sample_rate
        c = self.n_channels
        fold_prec = _PRECISIONS[kernel_precision or config.matmul_precision]

        def fn(state: FusedSAMBankState, xr, xi, incs, w_sb, w_pbt):
            from radiodsp_sdr_rx_tpu.ops import planar
            from radiodsp_sdr_rx_tpu.ops.iir import dc_blocker
            from radiodsp_sdr_rx_tpu.ops.pallas_sam import sam_pll_run_pallas

            n = xr.shape[-1]
            xr = xr * in_gain
            xi = xi * (in_gain * balance)
            xr, xi, phase_next = jax.vmap(planar.nco_mix_planar)(
                xr, xi, state.nco_phase, incs.astype(jnp.uint32))
            zr, zi, tr, ti = planar.overlap_save_filter_planar(
                xr, xi, w_sb, state.sb_tail[:, :128], state.sb_tail[:, 128:])

            pad = self._lanes - c
            zr_p = jnp.pad(zr, ((0, pad), (0, 0))) if pad else zr
            zi_p = jnp.pad(zi, ((0, pad), (0, 0))) if pad else zi
            vr, pll_p, pll_f = sam_pll_run_pallas(
                zr_p, zi_p, state.sam_phase, state.sam_freq,
                sample_rate=fs, chunk=sam_chunk,
                interpret=interpret or jax.default_backend() == "cpu")
            audio, dc = dc_blocker(vr[:c], state.sam_dc)

            audio, env = agc_ops.agc_run(audio, agc_params, state.agc_env)
            l, r = pallas_kernels.pbt_filter(
                audio, w_pbt, tail=state.audio_tail,
                block_c=block_c, block_t=block_t, interpret=interpret)
            new_state = FusedSAMBankState(
                nco_phase=phase_next,
                sb_tail=jnp.concatenate([tr, ti], axis=-1),
                audio_tail=audio[:, -128:],
                agc_env=env,
                sam_phase=pll_p, sam_freq=pll_f, sam_dc=dc,
                nb_avg=state.nb_avg, nb_mask=state.nb_mask,
            )
            return {"audio_l": l * out_gain, "audio_r": r * out_gain}, new_state

        # Longest segment handed to ONE sweep_lanes_chain pallas_call: the
        # deployment backend's remote compiler crashes on the stage="sam"
        # kernel above 2^16 samples (bisected on-chip, round 3; notch/lms
        # compile fine at 2^19). Longer segments lax.scan the kernel over
        # max_kernel_seg-sample sub-segments inside the SAME jit — exact
        # state threading, one dispatch, bounded compile.
        _KSEG = int(max_kernel_seg)

        # Sublane-parallel wide kernel for multi-group banks: G lane groups
        # advance through ONE serial PLL stream — a (G, 128) tile is a single
        # vreg on the 8x128 VPU, so the bank pays the PLL's per-step latency
        # once instead of G times (ops/pallas_sam_wide.py; VERDICT r3 #2).
        # The G>=4 'opaque' compile crashes were the backend's 16 MB
        # scoped-VMEM default; with the kernel's raised vmem_limit_bytes
        # G=8 compiles and runs (round 4).
        g_wide = max(g for g in (8, 4, 2, 1)
                     if (self._lanes // 128) % g == 0) if fold else 1
        if wide_groups is not None:
            # explicit override (parity/tuning harnesses: e.g. compare G=8
            # against the chip-verified G=2 on the same 1024-ch bank)
            if (self._lanes // 128) % wide_groups:
                raise ValueError(f"wide_groups {wide_groups} does not divide "
                                 f"{self._lanes // 128} lane groups")
            g_wide = wide_groups

        def fn_fold(state: FusedSAMBankState, xr, xi, incs, w_sb, w_pbt):
            from radiodsp_sdr_rx_tpu.ops.pallas_chain_lanes import (
                sweep_lanes_chain,
            )
            from radiodsp_sdr_rx_tpu.ops.pallas_sam_wide import sweep_sam_wide

            n = xr.shape[-1]
            lanes = self._lanes
            pad = lanes - c

            def padc(a):
                if not pad:
                    return a
                return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))

            interp = interpret or jax.default_backend() == "cpu"

            nb_on = bool(config.noise_blanker)
            nb_kw = dict(nb=True,
                         nb_thresh_db=float(config.nb_threshold_db),
                         nb_tau=float(config.nb_tau_samples)) if nb_on else {}

            def run_seg(carry, seg):
                sxr, sxi, tr, ti = seg
                phase, atail, env, dc, pll, nbavg, nbmask = carry
                if nb_on:
                    nb_kw.update(nb_avg0=padc(nbavg), nb_mask0=padc(nbmask))
                if g_wide > 1:
                    outs = sweep_sam_wide(
                        padc(sxr), padc(sxi), padc(incs), padc(phase),
                        w_sb, w_pbt,
                        padc(tr), padc(ti), padc(atail), padc(env),
                        padc(dc), pll,
                        groups=g_wide, chunk_t=min(sam_chunk, 256),
                        agc_release=agc_params.release,
                        agc_target=agc_params.target,
                        agc_max_gain=agc_params.max_gain,
                        agc_enabled=bool(agc_params.enabled),
                        out_gain=float(out_gain), interpret=interp,
                        in_gain=float(in_gain), iq_balance=float(balance),
                        sample_rate=fs, precision=fold_prec, **nb_kw)
                    l, r, atail2, env2, dc2, pll2 = outs[:6]
                    nbavg2 = outs[6][:c] if nb_on else nbavg
                    nbmask2 = outs[7][:c] if nb_on else nbmask
                else:
                    outs = sweep_lanes_chain(
                        padc(sxr), padc(sxi), padc(incs), padc(phase),
                        w_sb, w_pbt,
                        padc(tr), padc(ti), padc(atail), padc(env),
                        stage="sam", chunk_t=sam_chunk,
                        agc_release=agc_params.release,
                        agc_target=agc_params.target,
                        agc_max_gain=agc_params.max_gain,
                        agc_enabled=bool(agc_params.enabled),
                        out_gain=float(out_gain), interpret=interp,
                        in_gain=float(in_gain), iq_balance=float(balance),
                        dc0=padc(dc), pll0=pll,
                        sample_rate=fs,
                        precision=fold_prec, **nb_kw)
                    (l, r, atail2, env2, _, _, _, dc2, pll2,
                     _, _, _) = outs[:12]
                    nbavg2 = outs[12][:c] if nb_on else nbavg
                    nbmask2 = outs[13][:c] if nb_on else nbmask
                kseg = sxr.shape[-1]
                carry2 = (phase + jnp.asarray(kseg, jnp.uint32)
                          * incs.astype(jnp.uint32),
                          atail2[:c], env2[:c], dc2[:c], pll2,
                          nbavg2, nbmask2)
                return carry2, (l[:c], r[:c])

            carry0 = (state.nco_phase, state.audio_tail, state.agc_env,
                      state.sam_dc,
                      jnp.stack([state.sam_phase, state.sam_freq], axis=0),
                      state.nb_avg, state.nb_mask)
            tail_r0, tail_i0 = state.sb_tail[:, :128], state.sb_tail[:, 128:]
            m = (n // _KSEG) * _KSEG if n > _KSEG else n
            if n > _KSEG:
                # scanned prefix of whole sub-segments (the deployment
                # backend cannot compile the SAM kernels above _KSEG
                # samples), then one remainder kernel call threading the
                # carry (ADVICE r3: a non-multiple n must NOT fall through
                # to an oversized single call)
                n_seg = m // _KSEG
                sxr = xr[:, :m].reshape(c, n_seg, _KSEG).transpose(1, 0, 2)
                sxi = xi[:, :m].reshape(c, n_seg, _KSEG).transpose(1, 0, 2)
                # raw-input framing tail per sub-segment: the previous
                # sub-segment's last block (sweep-backend semantics)
                tr = jnp.concatenate(
                    [tail_r0[None], sxr[:-1, :, -128:]], axis=0)
                ti = jnp.concatenate(
                    [tail_i0[None], sxi[:-1, :, -128:]], axis=0)
                carry, (ls, rs) = jax.lax.scan(
                    run_seg, carry0, (sxr, sxi, tr, ti))
                l = ls.transpose(1, 0, 2).reshape(c, m)
                r = rs.transpose(1, 0, 2).reshape(c, m)
                if m < n:
                    carry, (lt, rt) = run_seg(
                        carry, (xr[:, m:], xi[:, m:],
                                xr[:, m - 128:m], xi[:, m - 128:m]))
                    l = jnp.concatenate([l, lt], axis=1)
                    r = jnp.concatenate([r, rt], axis=1)
            else:
                carry, (l, r) = run_seg(carry0, (xr, xi, tail_r0, tail_i0))
            phase, atail, env, dc, pll, nbavg, nbmask = carry
            new_state = FusedSAMBankState(
                nco_phase=phase,
                # RAW input tail — re-scaled and re-mixed in-kernel
                sb_tail=jnp.concatenate([xr[:, -128:], xi[:, -128:]], axis=-1),
                audio_tail=atail,
                agc_env=env,
                sam_phase=pll[0], sam_freq=pll[1], sam_dc=dc,
                nb_avg=nbavg, nb_mask=nbmask,
            )
            return {"audio_l": l, "audio_r": r}, new_state

        self._fn = jax.jit(fn_fold if fold else fn)
        self._fold = fold

    def init_state(self) -> FusedSAMBankState:
        c, lanes = self.n_channels, self._lanes
        return FusedSAMBankState(
            nco_phase=np.zeros(c, np.uint32),
            sb_tail=np.zeros((c, 256), np.float32),
            audio_tail=np.zeros((c, 128), np.float32),
            agc_env=np.full(c, 1e-6, np.float32),
            sam_phase=np.zeros(lanes, np.float32),
            sam_freq=np.zeros(lanes, np.float32),
            sam_dc=np.zeros((c, 2), np.float32),
            nb_avg=np.zeros(c, np.float32),
            nb_mask=np.ones((c, 128), np.float32),
        )

    def process_planar(self, xr, xi, state: FusedSAMBankState):
        return self._fn(state, xr, xi, self.incs, self.params.w_sideband,
                        self.params.w_pbt)

    def process(self, iq, state: FusedSAMBankState):
        iq = np.asarray(iq)
        if iq.ndim == 1:
            iq = np.broadcast_to(iq, (self.n_channels,) + iq.shape)
        return self.process_planar(
            np.ascontiguousarray(iq.real, np.float32),
            np.ascontiguousarray(iq.imag, np.float32), state)


class FusedAMBankState(NamedTuple):
    nco_phase: jax.Array   # (C,) uint32 DDS phase words
    sb_tail: jax.Array     # (C, 256) f32 [re|im] raw-scaled-input framing tail
    audio_tail: jax.Array  # (C, 128) f32 PBT framing tail
    agc_env: jax.Array     # (C,) f32
    am_dc: jax.Array       # (C, 2) f32 DC-blocker carry [last env in, last out]
    nb_avg: jax.Array      # (C,) f32 noise-blanker running-average carry
    nb_mask: jax.Array     # (C, 128) f32 NB keep mask of the tail block


class FusedAMBank:
    """Many-channel fused AM receiver: the whole chain (NCO mix + band-pass +
    envelope demod + DC blocker + AGC + PBT) in ONE single-sweep Pallas kernel
    (ops/pallas_sweep.sweep_am_chain). Matches ReceiverBank(mode=AM) to f32
    tolerance with state threaded call-to-call (tests/test_fused_bank.py)."""

    def __init__(self, config: ReceiverConfig, freqs_hz,
                 block_c: int = 8, block_t: int = 4096,
                 kernel_precision: str | None = None,
                 interpret: bool = False):
        if config.mode != DemodMode.AM:
            raise ValueError("FusedAMBank covers AM; use FusedSSBBank or "
                             "ReceiverBank")
        if config.nr.kind != "off":
            raise ValueError("NR configs use FusedNRBank/ReceiverBank")
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

        def fn(state: FusedAMBankState, xr, xi, incs, w_sb, w_pbt):
            in_gain, out_gain = gains
            n = xr.shape[-1]
            # gain/balance fold into the kernel (see FusedSSBBank.fn_sweep);
            # sb_tail carries the RAW input's last block
            from radiodsp_sdr_rx_tpu.ops.pallas_sweep import sweep_am_chain
            out = sweep_am_chain(
                xr, xi, incs, state.nco_phase,
                w_sb, w_pbt,
                state.sb_tail[:, :128], state.sb_tail[:, 128:],
                state.audio_tail, state.agc_env, state.am_dc,
                agc_release=agc_params.release, agc_target=agc_params.target,
                agc_max_gain=agc_params.max_gain,
                agc_enabled=bool(agc_params.enabled),
                out_gain=float(out_gain),
                block_c=block_c, chunk_t=block_t, interpret=interpret,
                in_gain=float(in_gain),
                iq_balance=float(config.iq_gain_balance),
                nb=bool(config.noise_blanker),
                nb_thresh_db=float(config.nb_threshold_db),
                nb_tau=float(config.nb_tau_samples),
                nb_avg0=state.nb_avg, nb_mask0=state.nb_mask,
                precision=None if kernel_precision is None
                else _PRECISIONS[kernel_precision],
            )
            if config.noise_blanker:
                l, r, atail, env, dc, nb_avg, nb_mask = out
            else:
                l, r, atail, env, dc = out
                nb_avg, nb_mask = state.nb_avg, state.nb_mask
            new_state = FusedAMBankState(
                nco_phase=state.nco_phase
                + jnp.asarray(n, jnp.uint32) * incs.astype(jnp.uint32),
                sb_tail=jnp.concatenate([xr[:, -128:], xi[:, -128:]], axis=-1),
                audio_tail=atail,
                agc_env=env,
                am_dc=dc,
                nb_avg=nb_avg, nb_mask=nb_mask,
            )
            return {"audio_l": l, "audio_r": r}, new_state

        self._fn = jax.jit(fn)

    def init_state(self) -> FusedAMBankState:
        c = self.n_channels
        return FusedAMBankState(
            nco_phase=np.zeros(c, np.uint32),
            sb_tail=np.zeros((c, 256), np.float32),
            audio_tail=np.zeros((c, 128), np.float32),
            agc_env=np.full(c, 1e-6, np.float32),
            am_dc=np.zeros((c, 2), np.float32),
            nb_avg=np.zeros(c, np.float32),
            nb_mask=np.ones((c, 128), np.float32),
        )

    def process_planar(self, xr, xi, state: FusedAMBankState):
        return self._fn(state, xr, xi, self.incs, self.params.w_sideband,
                        self.params.w_pbt)

    def process(self, iq, state: FusedAMBankState):
        iq = np.asarray(iq)
        if iq.ndim == 1:
            iq = np.broadcast_to(iq, (self.n_channels,) + iq.shape)
        return self.process_planar(
            np.ascontiguousarray(iq.real, np.float32),
            np.ascontiguousarray(iq.imag, np.float32), state)


