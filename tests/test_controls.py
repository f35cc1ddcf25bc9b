"""Control-plane tests: config presets, VFO step semantics, menu FSM cycles
(vs RDSP_controls.h behavior)."""

import pytest

from radiodsp_sdr_rx_tpu.models.config import (
    AGCMode, AudioFilter, DemodMode, NRMode, ReceiverConfig,
)
from radiodsp_sdr_rx_tpu.models.controls import ControlPlane, L4_PBT_LH
from radiodsp_sdr_rx_tpu.models.vfo import VFO, TUNING_STEPS


def test_mode_filter_coupling():
    """tuningMode couples demod mode to filter preset (RDSP_controls.h:330-423)."""
    pairs = {
        DemodMode.CW_NARROW: AudioFilter.CW_500,
        DemodMode.CW: AudioFilter.F2100,
        DemodMode.USB: AudioFilter.F2700,
        DemodMode.LSB: AudioFilter.F2700,
        DemodMode.AM: AudioFilter.AM_3900,
        DemodMode.SAM: AudioFilter.AM_3900,
        DemodMode.RTTY: AudioFilter.F2100,
    }
    for mode, flt in pairs.items():
        assert ReceiverConfig(mode=mode).effective_audio_filter is flt


def test_cw_sideband_auto_select():
    """CW uses USB above 10 MHz, LSB below (RDSP_controls.h:336-352)."""
    hi = ReceiverConfig(mode=DemodMode.CW, vfo_freq=14_050_000.0,
                        capture_center_freq=14_050_000.0)
    lo = ReceiverConfig(mode=DemodMode.CW, vfo_freq=7_030_000.0,
                        capture_center_freq=7_030_000.0)
    assert hi.sideband == "usb" and hi.tuning_offset == 700.0
    assert lo.sideband == "lsb" and lo.tuning_offset == -700.0
    lo_band = lo.iq_band
    assert lo_band[0] < 0 and lo_band[1] < 0


def test_config_validation():
    with pytest.raises(ValueError):
        ReceiverConfig(vfo_freq=29_000.0)  # below 30 kHz
    with pytest.raises(ValueError):
        ReceiverConfig(pbt_lo=750.0)  # above MAX_LOW
    with pytest.raises(ValueError):
        ReceiverConfig(pbt_hi=4_500.0)  # above MAX_HI


def test_nr_levels():
    assert NRMode.DNR1.level == 20 and NRMode.DNR4.level == 50
    assert NRMode.NOTCH.kind == "notch"
    assert NRMode.SPEC2.kind == "spectral" and NRMode.SPEC2.level == 30


def test_vfo_step_cycle():
    """tuningStep cycles and wraps to index 1 (10 Hz) past max
    (RDSP_controls.h:135-142)."""
    v = VFO(freq=7_050_000, step_index=3)
    assert v.step == 1_000
    for want in (10_000, 100_000, 1_000_000, 10, 100):
        v.cycle_step()
        assert v.step == want


def test_vfo_clamps():
    v = VFO(freq=29_990_000, step_index=6)
    v.tune(+5)
    assert v.freq == 30_000_000
    v2 = VFO(freq=40_000, step_index=4)
    v2.tune(-5)
    assert v2.freq == 30_000


def test_vfo_auto_step_down():
    """showFreq steps 1 MHz down to 100 kHz when freq drops below 2 MHz
    (RDSP_controls.h:459-464)."""
    v = VFO(freq=2_500_000, step_index=6)
    v.tune(-1)  # 1.5 MHz
    assert v.freq == 1_500_000
    assert v.step == 100_000
    # and max step limited to 100 kHz below 1 MHz territory
    v3 = VFO(freq=90_000, step_index=3)
    v3.tune(0)
    assert v3.max_step_index == 4


def test_lo_clock_relation():
    v = VFO(freq=7_050_000)
    assert v.lo_clock_hz(0.0) == 4 * 7_050_000


def test_menu_fsm_cycles():
    cp = ControlPlane()
    # default: RUNNING at L1; button A cycles mode LSB -> AM
    assert cp.config.mode is DemodMode.LSB
    cp.button_a()
    assert cp.config.mode is DemodMode.AM
    # menu navigation
    cp.button_menu()
    cp.encoder(+1)
    cp.encoder(+1)
    assert cp.menu_level == 3
    cp.button_menu()  # back to running
    cp.button_b()  # at L3: cycle AGC MEDIUM -> SLOW
    assert cp.config.agc is AGCMode.SLOW
    cp.menu_level = 2
    cp.button_b()  # NR off -> NOTCH
    assert cp.config.nr is NRMode.NOTCH


def test_menu_fsm_tune_and_pbt():
    cp = ControlPlane()
    f0 = cp.vfo.freq
    cp.encoder(+3)
    assert cp.config.vfo_freq == f0 + 3 * cp.vfo.step
    cp.menu_level = L4_PBT_LH
    cp.pbt_adjust("lo", +1)
    assert cp.config.pbt_lo == 350.0
    cp.pbt_adjust("hi", -1)
    assert cp.config.pbt_hi == 3950.0
    # clamped at range edges
    for _ in range(20):
        cp.pbt_adjust("lo", +1)
    assert cp.config.pbt_lo == 700.0
