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
from radiodsp_sdr_rx_tpu.models.streaming import StreamingReceiver  # noqa: E402,F401
from radiodsp_sdr_rx_tpu.models.fused import (  # noqa: E402,F401
    FusedAMBank,
    FusedNRBank,
    FusedSAMBank,
    FusedSSBBank,
)
from radiodsp_sdr_rx_tpu.models.channelized import ChannelizedBank  # noqa: E402,F401
from radiodsp_sdr_rx_tpu.models.metrics import analyze, scope_init, ScopeState  # noqa: E402,F401
from radiodsp_sdr_rx_tpu.models.appliance import Appliance  # noqa: E402,F401
