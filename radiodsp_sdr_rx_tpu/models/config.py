"""Declarative receiver configuration with the reference's mode presets.

Replaces the reference's menu-FSM-mutated globals (ref:
src/RadioDSP_SDR_RX/RDSP_general_includes.h:62-119) and the mode/filter/AGC/NR
coupling logic (RDSP_controls.h:149-423) with an immutable dataclass. Retuning
or mode changes build a new config; the jitted pipeline re-specializes only on
static fields (mode, NR kind), while frequencies and filter matrices flow in as
device arrays.
"""

from __future__ import annotations

import dataclasses
import enum

SAMPLE_RATE = 44117.64706  # AUDIO_SAMPLE_RATE_EXACT (RDSP_convolutional.h:35)

# Tuning limits (RDSP_general_includes.h:68-69)
BOTTOM_FREQ = 30_000
TOP_FREQ = 30_000_000

# PBT legal ranges (RDSP_general_includes.h:79-82)
MIN_LOW, MAX_LOW = 0.0, 700.0
MIN_HI, MAX_HI = 800.0, 4000.0

CW_PITCH_HZ = 700.0
CW_SIDEBAND_SPLIT_HZ = 10_000_000  # CW auto-sideband: >10 MHz USB (RDSP_controls.h:336)


class DemodMode(enum.Enum):
    """Demod cycle, matching tuningMode's mndx order (RDSP_controls.h:330-423)."""

    CW_NARROW = "CW N"
    CW = "CW"
    USB = "USB"
    LSB = "LSB"
    AM = "AM"
    SAM = "SAM"
    RTTY = "RTTY"


class AudioFilter(enum.Enum):
    """Audio passband presets (AudioSDR setAudioFilter arguments; cycle at
    RDSP_controls.h:149-191). Value = (lo_hz, hi_hz) audio band."""

    CW_500 = (450.0, 950.0)      # audioCW: 500 Hz wide around the CW pitch
    F2100 = (300.0, 2400.0)      # audio2100
    F2700 = (300.0, 3000.0)      # audio2700
    F3100 = (300.0, 3400.0)      # audio3100
    AM_3900 = (0.0, 3900.0)      # audioAM
    WSPR_200 = (1400.0, 1600.0)  # audioWSPR: 200 Hz centered on 1500 Hz

    @property
    def lo(self) -> float:
        return self.value[0]

    @property
    def hi(self) -> float:
        return self.value[1]


class AGCMode(enum.Enum):
    """AGC cycle (RDSP_controls.h:196-232)."""

    OFF = "off"
    FAST = "fast"
    MEDIUM = "medium"
    SLOW = "slow"


class NRMode(enum.Enum):
    """NR cycle (RDSP_controls.h:237-297): off, LMS auto-notch, LMS denoise
    levels DNR1-4 (nr_level 20/30/40/50), plus the backup engine's
    spectral-subtraction denoise (src/backup/RDSP_convolutional_spec.h) exposed
    as first-class SPEC1-4 at the same levels."""

    OFF = ("off", 0)
    NOTCH = ("notch", 0)
    DNR1 = ("lms", 20)
    DNR2 = ("lms", 30)
    DNR3 = ("lms", 40)
    DNR4 = ("lms", 50)
    SPEC1 = ("spectral", 20)
    SPEC2 = ("spectral", 30)
    SPEC3 = ("spectral", 40)
    SPEC4 = ("spectral", 50)

    @property
    def kind(self) -> str:
        return self.value[0]

    @property
    def level(self) -> int:
        return self.value[1]


class FilterWindow(enum.IntEnum):
    """FIR design window ids (RDSP_convolutional.h:152-179)."""

    BLACKMAN_HARRIS_4 = 1
    BLACKMAN_HARRIS_4_ALT = 2
    COSINE = 3
    HANN = 4
    BLACKMAN_NUTTALL = 0


# Mode -> coupled audio filter preset (tuningMode, RDSP_controls.h:330-423)
MODE_FILTER = {
    DemodMode.CW_NARROW: AudioFilter.CW_500,
    DemodMode.CW: AudioFilter.F2100,
    DemodMode.USB: AudioFilter.F2700,
    DemodMode.LSB: AudioFilter.F2700,
    DemodMode.AM: AudioFilter.AM_3900,
    DemodMode.SAM: AudioFilter.AM_3900,
    DemodMode.RTTY: AudioFilter.F2100,
}


def mode_tuning_offset(mode: DemodMode, vfo_freq: float) -> float:
    """The TuningOffset returned by setDemodMode and applied to the LO
    (RDSP_controls.h:337-389, :445-448). With LO = vfo - offset, a carrier at
    the displayed frequency lands at +offset Hz in baseband — the CW side-tone.
    CW sideband auto-selects by band (>10 MHz: USB)."""
    if mode in (DemodMode.CW_NARROW, DemodMode.CW):
        return CW_PITCH_HZ if vfo_freq > CW_SIDEBAND_SPLIT_HZ else -CW_PITCH_HZ
    return 0.0


def mode_sideband(mode: DemodMode, vfo_freq: float) -> str:
    """'usb', 'lsb' or 'dsb' — which sideband the complex BPF selects."""
    if mode in (DemodMode.AM, DemodMode.SAM):
        return "dsb"
    if mode == DemodMode.LSB:
        return "lsb"
    if mode in (DemodMode.CW_NARROW, DemodMode.CW):
        return "usb" if vfo_freq > CW_SIDEBAND_SPLIT_HZ else "lsb"
    return "usb"  # USB, RTTY


@dataclasses.dataclass(frozen=True)
class ReceiverConfig:
    """Complete receiver configuration (the reference's global state as data)."""

    vfo_freq: float = 7_050_000.0        # RDSP_general_includes.h:72
    capture_center_freq: float = 7_050_000.0  # RF center of the IQ capture
    mode: DemodMode = DemodMode.LSB      # mndx=3 default (RDSP_general_includes.h:104)
    audio_filter: AudioFilter | None = None  # None -> mode-coupled preset
    agc: AGCMode = AGCMode.MEDIUM        # andx=2 default
    nr: NRMode = NRMode.OFF
    pbt_lo: float = 300.0                # dFLoCut default
    pbt_hi: float = 4000.0               # dFHiCut default
    fir_window: FilterWindow = FilterWindow.BLACKMAN_HARRIS_4
    sample_rate: float = SAMPLE_RATE
    fft_length: int = 256                # overlap-save FFT length
    noise_blanker: bool = False          # disabled in the app (ino:131)
    nb_threshold_db: float = 10.0
    # --- UNPINNED constants (the reference drives these through the closed-
    # source AudioSDR library, so the true values are unverifiable offline;
    # call sites: SDR.setAGCmode at RDSP_controls.h:196-232, NB at ino:129-131).
    # Defaults follow common SDR practice; override per deployment if a
    # measured AudioSDR value differs.
    agc_release_s: float | None = None   # None -> preset (fast .25/med .6/slow 2 s)
    agc_target: float = 0.5              # AGC output target level
    agc_max_gain: float = 316.0          # ~50 dB gain ceiling
    nb_tau_samples: float = 512.0        # NB magnitude-average time constant
    input_gain: float = 1.0              # SDR.setInputGain (ino:133)
    output_gain: float = 0.5             # SDR.setOutputGain (ino:134)
    iq_gain_balance: float = 1.020       # SDR.setIQgainBalance (ino:135)
    quantize_output: bool = False        # q15 round-trip at the audio boundary
    mute: bool = False                   # SDR.setMute (ino:177: unmuted after boot)
    # backup-sketch graph ordering: conv filter BEFORE the demod engine
    # (src/backup/RadioDSP_SDR_RX_Conv.ino:183-191); the audio band-pass runs
    # as a complex BPF on post-mix IQ and the post-demod PBT stage is skipped
    conv_first: bool = False
    # backup-sketch DENOISE build: loop() routes every block through
    # doConvolutionalProcessing_Denoise (src/backup/RadioDSP_SDR_RX_Conv.ino:
    # 1346-1351), where the pre-demod conv stage applies the inline spectral
    # denoise (threshold = mean of magnitude bins 60-120 x 3, :1591-1609)
    # and the FIR mask multiply is commented out (:1633). Requires
    # conv_first=True (it is a variant of that graph ordering).
    conv_inline_denoise: bool = False
    # Automatic I2S-misalignment detection + repair: the reference enables it
    # unconditionally at boot AND its detector keeps running in the ISR
    # graph (preProcessor.startAutoI2SerrorDetection(),
    # RadioDSP_SDR_RX.ino:117). When True, the Receiver re-scores the best
    # of {identity, delay I, delay Q} on EVERY processed segment (host-side
    # spectral-asymmetry scoring over a bounded prefix, ops/preprocessor.py)
    # and applies the current repair streaming-safe; a mid-stream slip is
    # adopted only after ``iq_repair_hysteresis`` consecutive segments agree
    # on the new candidate (round 5, VERDICT r4 #5). The CLI appliance
    # surfaces default it ON for reference parity; library default is off
    # (single-stream Receiver/StreamingReceiver only).
    auto_iq_repair: bool = False
    # consecutive disagreeing segments required to switch the applied repair
    iq_repair_hysteresis: int = 3
    # Manual I/Q swap — preProcessor.swapIQ(...), present-but-commented in the
    # reference boot (RadioDSP_SDR_RX.ino:118). A swap mirrors the spectrum,
    # which spectral-asymmetry detection cannot distinguish from aligned, so
    # like the reference this stays a manual option.
    swap_iq: bool = False
    # MXU matmul precision for the collapsed overlap-save / DFT operators:
    # "highest" (full f32, default — matches the reference's f32 CMSIS math),
    # "high" (3-pass bf16), "bf16" (1-pass bf16 — fastest; measured SNR delta
    # in docs/PERFORMANCE.md). Quality/throughput knob, opt-in.
    matmul_precision: str = "highest"

    def __post_init__(self):
        if not (BOTTOM_FREQ <= self.vfo_freq <= TOP_FREQ):
            raise ValueError(
                f"vfo_freq {self.vfo_freq} outside [{BOTTOM_FREQ}, {TOP_FREQ}]"
            )
        if not (MIN_LOW <= self.pbt_lo <= MAX_LOW):
            raise ValueError(f"pbt_lo {self.pbt_lo} outside [{MIN_LOW}, {MAX_LOW}]")
        if not (MIN_HI <= self.pbt_hi <= MAX_HI):
            raise ValueError(f"pbt_hi {self.pbt_hi} outside [{MIN_HI}, {MAX_HI}]")
        if self.matmul_precision not in ("highest", "high", "bf16"):
            raise ValueError(
                f"matmul_precision {self.matmul_precision!r} not in "
                "('highest', 'high', 'bf16')")
        if self.agc_release_s is not None and self.agc_release_s <= 0:
            raise ValueError("agc_release_s must be positive")
        if self.conv_inline_denoise and not self.conv_first:
            raise ValueError("conv_inline_denoise is a variant of the "
                             "backup sketch's conv-first graph; set "
                             "conv_first=True")

    @property
    def effective_audio_filter(self) -> AudioFilter:
        return self.audio_filter if self.audio_filter is not None else MODE_FILTER[self.mode]

    @property
    def tuning_offset(self) -> float:
        return mode_tuning_offset(self.mode, self.vfo_freq)

    @property
    def sideband(self) -> str:
        return mode_sideband(self.mode, self.vfo_freq)

    @property
    def nco_freq(self) -> float:
        """Digital LO frequency: signal at vfo_freq lands at +tuning_offset."""
        return self.vfo_freq - self.tuning_offset - self.capture_center_freq

    @property
    def iq_band(self) -> tuple[float, float]:
        """Complex band-pass edges at the IQ stage (sideband selection)."""
        flt = self.effective_audio_filter
        lo, hi = flt.lo, flt.hi
        sb = self.sideband
        # CW is SSB with the side-tone offset applied at the LO; the CW_500
        # audio preset is already centered on the pitch, so the plain sideband
        # mapping places the passband correctly for every mode.
        if sb == "usb":
            return (lo, hi)
        if sb == "lsb":
            return (-hi, -lo)
        return (-hi, hi)  # dsb (AM/SAM)

    def with_(self, **updates) -> "ReceiverConfig":
        return dataclasses.replace(self, **updates)
