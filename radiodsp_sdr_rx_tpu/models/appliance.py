"""Live appliance loop: the reference's ``loop()`` as a host-side runtime.

The reference interleaves demodulation, panadapter/waterfall repaint
(~5.7 Hz), S-meter updates and encoder/button handling continuously
(RadioDSP_SDR_RX.ino:195-233; paint paths RDSP_display.h:74-190,235-401).
This module is that appliance with the hardware swapped for framework
surfaces:

  rotary encoder + buttons  ->  abstract events fed to ControlPlane
  audio ISR + conv loop     ->  Receiver.process over IQ blocks
  FFT nodes + TFT           ->  models/metrics.analyze + ASCII renderers

``Appliance`` is headless and synchronous (testable without a terminal);
``cli.py tui`` wraps it with raw-terminal key polling and ANSI repaints.

Events (tuples):
  ("encoder", n)  — n detents, sign = direction (tune / menu move / PBT)
  ("menu",)       — BUTTON_D2: toggle MENU <-> RUNNING
  ("a",) ("b",)   — BUTTON_D3 / BUTTON_D6 per menu level
  ("pbt", "lo"|"hi") — select which PBT edge the encoder adjusts at level 4
"""

from __future__ import annotations

import numpy as np

from radiodsp_sdr_rx_tpu.models.config import ReceiverConfig
from radiodsp_sdr_rx_tpu.models.controls import L4_PBT_LH, ControlPlane
from radiodsp_sdr_rx_tpu.models.metrics import analyze, scope_init
from radiodsp_sdr_rx_tpu.models.receiver import Receiver
from radiodsp_sdr_rx_tpu.utils import display as disp


def _analyze_cpu():
    """Scope metrics jitted on the HOST CPU device: the display pipeline is a
    host visualization sink (SURVEY.md L5) and uses complex FFTs, which the
    deployment TPU runtime does not execute (ops/planar.py). The demod hot
    path stays on the accelerator; only the scope tap runs here."""
    import jax

    return jax.jit(analyze,
                   static_argnames=("naverage", "sample_rate",
                                    "audio_naverage"),
                   backend="cpu")


class Appliance:
    """Config + VFO + receiver + scopes, advanced block-by-block.

    >>> app = Appliance(ReceiverConfig(mode=DemodMode.USB, ...))
    >>> out = app.step(iq_block, events=[("encoder", +2)])
    >>> print(app.render_frame())
    """

    def __init__(self, config: ReceiverConfig, block: int = 4096,
                 metrics: bool = True):
        if block % 512:
            raise ValueError("block must be a multiple of 512 (scope frames)")
        self.plane = ControlPlane(config=config)
        self.receiver = Receiver(self.plane.config)
        self.state = self.receiver.init_state()
        self.block = block
        self.metrics_enabled = metrics
        self.scope_state = scope_init() if metrics else None
        self._analyze = _analyze_cpu() if metrics else None
        self.metrics: dict | None = None
        self.pbt_sel = "lo"
        self.blocks_processed = 0

    # -- control plane ---------------------------------------------------

    def apply_events(self, events) -> bool:
        """Dispatch UI events; swap the receiver when the config changed.
        Returns True when a reconfiguration happened."""
        plane = self.plane
        before = plane.config
        for ev in events:
            kind = ev[0]
            if kind == "encoder":
                if (not plane.menu_mode) and plane.menu_level == L4_PBT_LH:
                    # PBT takes priority over tuning at level 4
                    # (checkCmd, RDSP_controls.h:571-612)
                    steps = int(ev[1])
                    for _ in range(abs(steps)):
                        plane.pbt_adjust(self.pbt_sel,
                                         1 if steps > 0 else -1)
                else:
                    plane.encoder(int(ev[1]))
            elif kind == "menu":
                plane.button_menu()
            elif kind == "a":
                plane.button_a()
            elif kind == "b":
                plane.button_b()
            elif kind == "pbt":
                self.pbt_sel = ev[1]
            else:
                raise ValueError(f"unknown event {ev!r}")
        if plane.config is before:
            return False
        self._swap_receiver(plane.config)
        return True

    def _swap_receiver(self, cfg: ReceiverConfig) -> None:
        """Functional reconfiguration: same statics -> new parameter tensors
        into the already-compiled step fn (retune); static change (mode/NR)
        -> rebuild the jitted pipeline. DSP state carries over either way —
        the reference likewise keeps its filter/AGC state across menu edits
        (reInitializeFilter swaps only coefficients,
        RDSP_convolutional.h:209-224)."""
        old = self.receiver.config
        statics_same = (
            cfg.mode == old.mode and cfg.nr == old.nr
            and cfg.noise_blanker == old.noise_blanker
            and cfg.quantize_output == old.quantize_output
            and cfg.fft_length == old.fft_length
            and cfg.sample_rate == old.sample_rate
            and cfg.conv_first == old.conv_first
            and cfg.conv_inline_denoise == old.conv_inline_denoise
            and cfg.matmul_precision == old.matmul_precision
        )
        if statics_same:
            new_rx = object.__new__(Receiver)
            new_rx.config = cfg
            from radiodsp_sdr_rx_tpu.models.receiver import build_params
            new_rx.params = build_params(cfg)
            new_rx._fn = self.receiver._fn
            new_rx._repair_idx = self.receiver._repair_idx
            new_rx._repair_carry = self.receiver._repair_carry
            self.receiver = new_rx
        else:
            repair_idx = self.receiver._repair_idx
            repair_carry = self.receiver._repair_carry
            self.receiver = Receiver(cfg)
            self.receiver._repair_idx = repair_idx
            self.receiver._repair_carry = repair_carry

    # -- signal path -------------------------------------------------------

    def step(self, iq_block: np.ndarray, events=()) -> dict:
        """One appliance iteration: events -> demod -> scopes.
        iq_block: (block,) complex64. Returns {audio_l, audio_r, reconfigured}.
        """
        if len(iq_block) != self.block:
            raise ValueError(f"need a full block of {self.block}")
        reconfigured = self.apply_events(events)
        out, self.state = self.receiver.process(iq_block, self.state)
        if self.metrics_enabled:
            audio = np.asarray(out["audio_l"], np.float32)
            self.metrics, self.scope_state = self._analyze(
                np.asarray(iq_block, np.complex64), audio, self.scope_state,
                sample_rate=self.plane.config.sample_rate,
                audio_naverage=max(1, min(30, self.block // 512)))
        self.blocks_processed += 1
        return {"audio_l": out["audio_l"], "audio_r": out["audio_r"],
                "reconfigured": reconfigured}

    # -- presentation --------------------------------------------------------

    def render_frame(self, height: int = 12, wf_rows: int = 14) -> str:
        """Status header + tuning cursor + active scope + S-meter line —
        the full reference screen as ASCII (status fields RDSP_display.h:
        74-190; panadapter+waterfall :235-324; dual scope :380-401)."""
        plane = self.plane
        m = self.metrics
        s_val = None
        if m is not None:
            s_val = float(m["s_units"]) + (float(m["s9_plus_db"])
                                           if float(m["s9_plus_db"]) > 0
                                           else 0.0)
        head = disp.render_status_ascii(
            plane.config, plane.vfo, s_units=s_val,
            menu_level=plane.menu_level if plane.menu_mode else None)
        lines = [head]
        if m is None:
            return "\n".join(lines)
        view = np.asarray(m["view"])
        if plane.scope == 0:
            lines.append(disp.render_spectrum_ascii(view, height=height))
            lines.append(disp.render_spectrum_cursor())
            lines.append(disp.render_waterfall_ascii(
                np.asarray(m["waterfall"])[:wf_rows]))
        else:
            lines.append(disp.render_double_spectrum_ascii(
                view, np.asarray(m["audio_spectrum"])[-1], height=height))
        s = float(m["s_units"])
        plus = float(m["s9_plus_db"])
        lines.append(f"S-meter: S{s:.0f}" + (f"+{plus:.0f}dB" if plus > 0
                                             else ""))
        return "\n".join(lines)
