"""Pallas LMS kernel (interpret mode) vs the scan-based reference op."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from radiodsp_sdr_rx_tpu.ops import lms
from radiodsp_sdr_rx_tpu.ops.pallas_lms import LANES, lms_nr_run_pallas


def _run_reference(x, mu, mode):
    """vmapped scan-based LMS over channels."""
    def one(chan):
        out, st = lms.lms_nr_run(chan, lms.lms_nr_init(), mu, mode=mode)
        return out, st

    outs, states = jax.vmap(one)(x)
    return outs, states


def test_matches_scan_lms(rng):
    c, n = LANES, 2048
    x = (rng.standard_normal((c, n)) * 0.3).astype(np.float32)
    mu = 0.05
    want, want_st = _run_reference(jnp.asarray(x), mu, "denoise")

    weights = jnp.zeros((c, lms.LMS_TAPS), jnp.float32)
    window = jnp.zeros((c, lms.LMS_TAPS), jnp.float32)
    delay = jnp.zeros((c, lms.LMS_DELAY), jnp.float32)
    out, w2, win2, d2 = lms_nr_run_pallas(
        jnp.asarray(x), weights, window, delay, jnp.asarray(True), mu,
        chunk=1024, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-4)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(want_st.weights),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(want_st.delay), atol=0)


def test_notch_mode_and_chunk_invariance(rng):
    c, n = LANES, 2048
    x = (rng.standard_normal((c, n)) * 0.3).astype(np.float32)
    mu = 0.02
    want, _ = _run_reference(jnp.asarray(x), mu, "notch")

    for chunk in (512, 2048):
        out, *_ = lms_nr_run_pallas(
            jnp.asarray(x), jnp.zeros((c, lms.LMS_TAPS), jnp.float32),
            jnp.zeros((c, lms.LMS_TAPS), jnp.float32),
            jnp.zeros((c, lms.LMS_DELAY), jnp.float32),
            jnp.asarray(True), mu, mode="notch", chunk=chunk, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-4)


@pytest.mark.slow
def test_grouped_v3_matches_scan_lms(rng):
    """The grouped (v3) kernel is exact algebra: parity with the scan op."""
    c, n = LANES, 2048
    x = (rng.standard_normal((c, n)) * 0.3).astype(np.float32)
    mu = 0.05
    want, want_st = _run_reference(jnp.asarray(x), mu, "denoise")

    for group in (4, 8, 16):
        out, w2, win2, d2 = lms_nr_run_pallas(
            jnp.asarray(x), jnp.zeros((c, lms.LMS_TAPS), jnp.float32),
            jnp.zeros((c, lms.LMS_TAPS), jnp.float32),
            jnp.zeros((c, lms.LMS_DELAY), jnp.float32),
            jnp.asarray(True), mu, chunk=1024, group=group, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   atol=2e-4, err_msg=f"group={group}")
        np.testing.assert_allclose(np.asarray(w2),
                                   np.asarray(want_st.weights), atol=2e-4)
        np.testing.assert_allclose(np.asarray(d2),
                                   np.asarray(want_st.delay), atol=0)

    # notch (error) output too
    want_n, _ = _run_reference(jnp.asarray(x), 0.02, "notch")
    out_n, *_ = lms_nr_run_pallas(
        jnp.asarray(x), jnp.zeros((c, lms.LMS_TAPS), jnp.float32),
        jnp.zeros((c, lms.LMS_TAPS), jnp.float32),
        jnp.zeros((c, lms.LMS_DELAY), jnp.float32),
        jnp.asarray(True), 0.02, mode="notch", chunk=1024, group=8,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out_n), np.asarray(want_n),
                               atol=2e-4)


def test_chunk_shrinks_to_divisor(rng):
    """n not a multiple of the default chunk must still run (ADVICE r2).

    n=6144 = 3*2048 is a multiple of 2048 but not of the 4096 default; the
    runner shrinks chunk by halving until it divides n.
    """
    c, n = LANES, 6144
    x = (rng.standard_normal((c, n)) * 0.3).astype(np.float32)
    mu = 0.05
    want, _ = _run_reference(jnp.asarray(x), mu, "denoise")
    out, *_ = lms_nr_run_pallas(
        jnp.asarray(x), jnp.zeros((c, lms.LMS_TAPS), jnp.float32),
        jnp.zeros((c, lms.LMS_TAPS), jnp.float32),
        jnp.zeros((c, lms.LMS_DELAY), jnp.float32),
        jnp.asarray(True), mu, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=3e-4)
