"""Host-side utilities: IQ I/O, signal generation, scopes/S-meter rendering."""

from radiodsp_sdr_rx_tpu.utils.siggen import (
    carrier,
    am_signal,
    ssb_from_audio,
    two_tone,
    noise,
)
from radiodsp_sdr_rx_tpu.utils.smeter import smeter_from_spectrum, s_units
from radiodsp_sdr_rx_tpu.utils.display import (
    spectrum_smooth,
    waterfall_update,
    classify_waterfall_colors,
    render_waterfall_ascii,
)
from radiodsp_sdr_rx_tpu.utils.io import read_iq_wav, write_wav, read_raw_iq
