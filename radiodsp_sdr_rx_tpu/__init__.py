"""radiodsp_sdr_rx_tpu — a TPU-native software-defined-radio receive framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the Teensy-based
RadioDSP_SDR_RX receiver (reference: /root/reference). Not a port: the reference's
interrupt-driven 128-sample audio graph becomes batched block-tensor function
composition under ``jax.jit``; per-sample mutable DSP state (overlap tails, AGC
gain, LMS weights, NCO/PLL phase) becomes explicit carried scan state; the single
receiver becomes a many-channel bank sharded over a TPU mesh.

Layer map (mirrors SURVEY.md §1, bottom-up):
  ops/       — kernel library (FIR design, fast-convolution, NCO, demod, AGC,
               LMS NR, spectral subtraction, FFT analyzers)   [ref L3]
  models/    — receiver graph + declarative config/presets    [ref L2+L4]
  parallel/  — mesh, channel sharding, time-axis halo exchange [new: ICI/DCN]
  utils/     — host I/O, signal generators, scope/waterfall/S-meter rendering
               [ref L5, as tensors + host renderer]
"""

from radiodsp_sdr_rx_tpu.version import __version__

# Reference invariants (SURVEY.md §6). The non-round sample rate is the exact
# Teensy AUDIO_SAMPLE_RATE_EXACT used in all reference frequency math
# (ref: src/RadioDSP_SDR_RX/RDSP_convolutional.h:35).
SAMPLE_RATE = 44117.64706  # Hz, AUDIO_SAMPLE_RATE_EXACT
BLOCK_SIZE = 128           # samples per audio block (RDSP_convolutional.h:34)
FFT_LENGTH = 256           # overlap-save FFT length (RDSP_convolutional.h:36)

from radiodsp_sdr_rx_tpu.models.config import (  # noqa: E402
    ReceiverConfig,
    DemodMode,
    AGCMode,
    NRMode,
    AudioFilter,
    FilterWindow,
)
from radiodsp_sdr_rx_tpu.models.receiver import Receiver, ReceiverState  # noqa: E402

__all__ = [
    "__version__",
    "SAMPLE_RATE",
    "BLOCK_SIZE",
    "FFT_LENGTH",
    "ReceiverConfig",
    "DemodMode",
    "AGCMode",
    "NRMode",
    "AudioFilter",
    "FilterWindow",
    "Receiver",
    "ReceiverState",
]
