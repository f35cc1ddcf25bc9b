"""Appliance-surface tests: status-line rendering, VFO LO model, packaging.

Covers the reference's TFT status fields (RDSP_display.h:74-190), the
panadapter tuning cursor (:322-323), the Si5351 correction constant
(RDSP_controls.h:433), and the pip-installable release artifact
(pyproject.toml — the framework's equivalent of
pre_compiled/RadioDSP_SDR_RX.ino.hex).
"""

import numpy as np

from radiodsp_sdr_rx_tpu.models.config import (
    AGCMode, DemodMode, NRMode, ReceiverConfig,
)
from radiodsp_sdr_rx_tpu.models.vfo import SI5351_CORRECTION_PPB, VFO
from radiodsp_sdr_rx_tpu.utils.display import (
    render_spectrum_cursor, render_status_ascii,
)


def test_status_line_fields():
    cfg = ReceiverConfig(mode=DemodMode.USB, vfo_freq=7_200_000.0,
                         agc=AGCMode.MEDIUM, nr=NRMode.DNR2)
    v = VFO(freq=7_200_000, step_index=3)
    out = render_status_ascii(cfg, v, s_units=10.5)
    line, cursor = out.splitlines()
    assert "7.200.000 Hz" in line
    assert "[USB]" in line
    assert "NR:DNR2" in line
    assert "AGC:MEDIUM" in line
    assert "STEP 1k" in line
    assert "S9+2" in line  # 10.5 -> S9 + 1.5 units rounded
    # cursor points at the kHz digit ("7.200.000"[4], the 0 left of the
    # last group separator)
    assert cursor.index("^") == line.index("7.200.000") + 4


def test_status_cursor_tracks_step():
    cfg = ReceiverConfig(mode=DemodMode.AM, vfo_freq=999_000.0)
    for step_index, expect_digit in [(0, 0), (2, 2), (4, 4), (6, 6)]:
        v = VFO(freq=30_000_000, step_index=step_index)
        out = render_status_ascii(cfg, v)
        line, cursor = out.splitlines()
        grouped = line.split(" Hz")[0]
        # char under ^ must be the decimal digit the step changes
        pos = cursor.index("^")
        plain = grouped.replace(".", "")
        dots_left = grouped[:pos].count(".")
        digit_index = len(plain) - 1 - (pos - dots_left)
        assert digit_index == expect_digit, (grouped, cursor)


def test_status_s_meter_below_s9():
    cfg = ReceiverConfig()
    out = render_status_ascii(cfg, VFO(), s_units=4.2)
    assert "S4" in out.splitlines()[0]


def test_spectrum_cursor_centered():
    row = render_spectrum_cursor(128)
    assert len(row) == 128
    assert row.index("│") == 63


def test_lo_clock_correction():
    v = VFO(freq=7_050_000)
    # corrected (default): exactly the 4x quadrature target
    assert v.lo_clock_hz(tuning_offset=0.0) == 4.0 * 7_050_000
    raw = v.lo_clock_hz(tuning_offset=0.0, corrected=False)
    np.testing.assert_allclose(
        raw, 4.0 * 7_050_000 * (1 + SI5351_CORRECTION_PPB * 1e-9))
    # offset applied before the 4x (sendFreq, RDSP_controls.h:447)
    assert v.lo_clock_hz(tuning_offset=-11_025.0) == 4.0 * (7_050_000 + 11_025)


def test_package_metadata_installable():
    """pyproject declares the console entry point and the package version."""
    import pathlib
    import tomllib

    root = pathlib.Path(__file__).resolve().parents[1]
    meta = tomllib.loads((root / "pyproject.toml").read_text())
    assert meta["project"]["name"] == "radiodsp-sdr-rx-tpu"
    assert meta["project"]["scripts"]["radiodsp-sdr-rx"] == \
        "radiodsp_sdr_rx_tpu.cli:main"
    import radiodsp_sdr_rx_tpu
    assert meta["project"]["version"] == radiodsp_sdr_rx_tpu.version.__version__
    # the console target resolves
    from radiodsp_sdr_rx_tpu.cli import main
    assert callable(main)
