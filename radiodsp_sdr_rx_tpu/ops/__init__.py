"""Kernel library: the TPU-native equivalents of the reference's L3 DSP ops.

Reference components covered (SURVEY.md §2):
  - windowed-sinc complex FIR designer   (ref RDSP_convolutional.h:127-185)
  - overlap-save fast convolution        (ref RDSP_convolutional.h:228-353)
  - normalized-LMS noise reduction       (ref RDSP_noise_reduction.h)
  - spectral-subtraction denoise         (ref src/backup/RDSP_convolutional_spec.h)
  - IQ panadapter FFT / audio FFT        (ref analyze_fft256iq.cpp)
  - AudioSDR replacement: preprocessor, NCO mix, SSB/CW/AM/SAM demod, AGC,
    noise blanker, audio filter presets  (behavioral spec in SURVEY.md §2.2)
"""

from radiodsp_sdr_rx_tpu.ops.windows import fir_window, FIR_WINDOWS
from radiodsp_sdr_rx_tpu.ops.fir_design import (
    calc_cplx_fir_coeffs,
    filter_mask_from_coeffs,
    design_filter_mask,
    overlap_save_matrix,
)
from radiodsp_sdr_rx_tpu.ops.fastconv import (
    overlap_save_filter,
    overlap_save_filter_fft,
    frame_overlap_save,
)
from radiodsp_sdr_rx_tpu.ops.qformat import float_to_q15, q15_to_float, quantize_q15
from radiodsp_sdr_rx_tpu.ops.nco import nco_mix, nco_phase_advance
from radiodsp_sdr_rx_tpu.ops.agc import agc_run, AGCParams, AGC_PRESETS
from radiodsp_sdr_rx_tpu.ops.lms import lms_nr_init, lms_nr_run, LMSState, lms_mu_from_strength
from radiodsp_sdr_rx_tpu.ops.analyzers import (
    iq_spectrum_frames,
    iq_panadapter_bin_order,
    audio_spectrum_frames,
)
from radiodsp_sdr_rx_tpu.ops.demod import (
    demod_ssb,
    demod_am,
    demod_sam,
    hilbert_bandpass_mask,
)
from radiodsp_sdr_rx_tpu.ops.spectral_sub import spectral_subtract_frames
from radiodsp_sdr_rx_tpu.ops.noise_blanker import noise_blanker
from radiodsp_sdr_rx_tpu.ops import planar  # noqa: E402,F401 (device-layout kernels)
from radiodsp_sdr_rx_tpu.ops import pallas_kernels  # noqa: E402,F401 (fused fast path)
