"""Receiver models: the reference's app/control plane (L4) + signal graph (L2)
as declarative config plus a jit-compiled block pipeline."""

from radiodsp_sdr_rx_tpu.models.config import (
    ReceiverConfig,
    DemodMode,
    AGCMode,
    NRMode,
    AudioFilter,
    FilterWindow,
)
from radiodsp_sdr_rx_tpu.models.receiver import Receiver, ReceiverState, ReceiverBank
from radiodsp_sdr_rx_tpu.models.vfo import VFO, TUNING_STEPS
