"""Demo: work a crowded 40 m band end-to-end.

Synthesizes a realistic evening band scene, renders the panadapter +
waterfall, reads the S-meter, then tunes each station and writes its
demodulated audio to WAV — everything the reference appliance shows on its TFT
and plays through its codec, produced offline from one capture.

Run: python examples/demo_crowded_band.py [outdir]
"""

import os
import sys

import numpy as np
import jax.numpy as jnp

from radiodsp_sdr_rx_tpu import AGCMode, DemodMode, Receiver, ReceiverConfig
from radiodsp_sdr_rx_tpu.models.metrics import analyze, scope_init
from radiodsp_sdr_rx_tpu.utils import io as io_utils
from radiodsp_sdr_rx_tpu.utils import scenes
from radiodsp_sdr_rx_tpu.utils.display import (
    WATERFALL_COLORS, classify_waterfall_colors,
    render_spectrum_ascii, render_waterfall_ascii,
)

FS = 44117.64706

_RGB = {
    "red": (255, 40, 40), "magenta": (255, 0, 255), "orange": (255, 160, 0),
    "yellow": (255, 255, 0), "blue": (60, 60, 255), "navy": (0, 0, 128),
    "black": (0, 0, 0),
}


def waterfall_ppm(path: str, waterfall: np.ndarray) -> None:
    """Write the waterfall with the reference's 7-color classification as a
    PPM image (no image libraries needed)."""
    cls = np.asarray(classify_waterfall_colors(jnp.asarray(waterfall)))
    h, w = cls.shape
    img = np.zeros((h, w, 3), np.uint8)
    for idx, name in enumerate(WATERFALL_COLORS):
        img[cls == idx] = _RGB[name]
    with open(path, "wb") as f:
        f.write(f"P6 {w} {h} 255\n".encode())
        f.write(img.tobytes())


def main(outdir: str = "demo_out") -> None:
    os.makedirs(outdir, exist_ok=True)
    n = 1 << 18
    iq, truth = scenes.band_scene_40m_ssb(n)
    center = truth["center"]
    print(f"scene: 40 m, centered {center/1e6:.3f} MHz, "
          f"{len(truth['stations'])} stations + carrier + noise")

    # panadapter / waterfall / S-meter
    m, _ = analyze(jnp.asarray(iq), jnp.zeros((n // 512) * 512, jnp.float32),
                   scope_init())
    print(render_spectrum_ascii(np.asarray(m["view"])))
    print("-" * 128)
    print(render_waterfall_ascii(np.asarray(m["waterfall"])))
    s, plus = float(m["s_units"]), float(m["s9_plus_db"])
    print(f"S-meter: S{s:.0f}" + (f"+{plus:.0f}dB" if plus > 0 else ""))
    waterfall_ppm(os.path.join(outdir, "waterfall.ppm"), np.asarray(m["waterfall"]))

    # tune each station, demodulate, write audio
    for name, st in truth["stations"].items():
        cfg = ReceiverConfig(mode=DemodMode.LSB, vfo_freq=st["freq"],
                             capture_center_freq=center, agc=AGCMode.MEDIUM)
        rx = Receiver(cfg)
        out, _ = rx.process(iq, rx.init_state())
        path = os.path.join(outdir, f"{name}_{st['freq']/1e6:.4f}MHz.wav")
        io_utils.write_wav(path, np.asarray(out["audio_l"]), FS)
        rms = float(np.sqrt(np.mean(np.asarray(out['audio_l']) ** 2)))
        print(f"tuned {st['freq']/1e6:.4f} MHz LSB -> {path} (rms {rms:.3f})")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "demo_out")
