"""Pallas SAM PLL kernel (interpret mode) == vmapped per-sample scan."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from radiodsp_sdr_rx_tpu.ops import planar
from radiodsp_sdr_rx_tpu.ops.iir import dc_blocker
from radiodsp_sdr_rx_tpu.ops.pallas_sam import LANES, sam_pll_run_pallas

FS = 44117.64706


def _sam_scan_reference(zr, zi, phase0, freq0):
    """vmapped demod_sam_planar minus its DC blocker (PLL only)."""

    def one(zr1, zi1, p0, f0):
        st = planar.SAMStatePlanar(phase=p0, freq=f0,
                                   dc=jnp.zeros(2, jnp.float32))
        # demod_sam_planar applies the DC blocker; reproduce just the PLL by
        # re-deriving vr from its scan (copy of the step law)
        wn = 2.0 * np.pi * 100.0 / FS
        zeta = 0.70710678
        kp = jnp.float32(2.0 * zeta * wn)
        ki = jnp.float32(wn * wn)
        max_freq = jnp.float32(2.0 * np.pi * 2000.0 / FS)

        def step(carry, zn):
            phase, freq = carry
            znr, zni = zn
            cr, ci = jnp.cos(phase), jnp.sin(phase)
            vr = znr * cr + zni * ci
            vi = zni * cr - znr * ci
            err = jnp.arctan2(vi, vr)
            freq = jnp.clip(freq + ki * err, -max_freq, max_freq)
            phase = jnp.mod(phase + freq + kp * err, 2.0 * np.pi)
            return (phase, freq), vr

        (p, f), vr = jax.lax.scan(step, (p0, f0), (zr1, zi1))
        return vr, p, f

    return jax.vmap(one)(zr, zi, phase0, freq0)


def test_sam_pallas_matches_scan(rng):
    c, n = LANES, 4096
    t = np.arange(n) / FS
    # AM-like carriers at per-channel offsets + noise
    zr = np.stack([
        (1.0 + 0.5 * np.sin(2 * np.pi * 400 * t))
        * np.cos(2 * np.pi * (30.0 + k) * t)
        for k in range(c)]).astype(np.float32)
    zi = np.stack([
        (1.0 + 0.5 * np.sin(2 * np.pi * 400 * t))
        * np.sin(2 * np.pi * (30.0 + k) * t)
        for k in range(c)]).astype(np.float32)
    zr += rng.standard_normal((c, n)).astype(np.float32) * 0.01
    zi += rng.standard_normal((c, n)).astype(np.float32) * 0.01

    p0 = np.zeros(c, np.float32)
    f0 = np.zeros(c, np.float32)
    want, wp, wf = _sam_scan_reference(jnp.asarray(zr), jnp.asarray(zi),
                                       jnp.asarray(p0), jnp.asarray(f0))
    got, gp, gf = sam_pll_run_pallas(jnp.asarray(zr), jnp.asarray(zi),
                                     p0, f0, chunk=1024, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(wp), atol=2e-3)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(wf), atol=1e-5)


def test_sam_pallas_streaming_continuity(rng):
    c, n = LANES, 4096
    zr = rng.standard_normal((c, 2 * n)).astype(np.float32) * 0.3 + 1.0
    zi = rng.standard_normal((c, 2 * n)).astype(np.float32) * 0.3

    full, _, _ = sam_pll_run_pallas(jnp.asarray(zr), jnp.asarray(zi),
                                    np.zeros(c, np.float32),
                                    np.zeros(c, np.float32),
                                    chunk=1024, interpret=True)
    a, p, f = sam_pll_run_pallas(jnp.asarray(zr[:, :n]), jnp.asarray(zi[:, :n]),
                                 np.zeros(c, np.float32),
                                 np.zeros(c, np.float32),
                                 chunk=1024, interpret=True)
    b, _, _ = sam_pll_run_pallas(jnp.asarray(zr[:, n:]), jnp.asarray(zi[:, n:]),
                                 p, f, chunk=1024, interpret=True)
    got = np.concatenate([np.asarray(a), np.asarray(b)], axis=1)
    np.testing.assert_allclose(got, np.asarray(full), atol=1e-5)


@pytest.mark.slow
def test_sam_pallas_plus_dc_matches_demod_sam(rng):
    """pallas PLL + XLA dc_blocker == planar.demod_sam_planar end to end."""
    c, n = LANES, 2048
    zr = (rng.standard_normal((c, n)).astype(np.float32) * 0.1 + 1.0)
    zi = rng.standard_normal((c, n)).astype(np.float32) * 0.1

    vr, _, _ = sam_pll_run_pallas(jnp.asarray(zr), jnp.asarray(zi),
                                  np.zeros(c, np.float32),
                                  np.zeros(c, np.float32),
                                  chunk=1024, interpret=True)
    got, _ = dc_blocker(vr, jnp.zeros((c, 2), jnp.float32))

    def one(a, b):
        audio, _ = planar.demod_sam_planar(a, b, planar.sam_init_planar(),
                                           sample_rate=FS)
        return audio

    want = jax.vmap(one)(jnp.asarray(zr), jnp.asarray(zi))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_atan2_poly_matches_numpy(rng):
    """In-kernel atan2 (octant reduction + Cephes poly — Mosaic has no
    atan2 primitive) vs numpy over all quadrants."""
    from radiodsp_sdr_rx_tpu.ops.pallas_sam import _atan2_poly

    y = rng.standard_normal((64, 128)).astype(np.float32)
    x = rng.standard_normal((64, 128)).astype(np.float32)
    got = np.asarray(_atan2_poly(jnp.asarray(y), jnp.asarray(x)))
    want = np.arctan2(y, x)
    np.testing.assert_allclose(got, want, atol=2e-6)
    # axes / origin edge cases
    ys = np.array([0.0, 0.0, 1.0, -1.0, 0.0], np.float32)
    xs = np.array([1.0, -1.0, 0.0, 0.0, 0.0], np.float32)
    got2 = np.asarray(_atan2_poly(jnp.asarray(ys), jnp.asarray(xs)))
    np.testing.assert_allclose(got2, np.arctan2(ys, xs), atol=2e-6)
