"""Benchmark: full RX chain throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.json): IQ megasamples/s/chip through the FULL receive
chain — input gain/IQ balance -> NCO mix -> sideband band-pass + fused SSB
demod (MXU collapsed overlap-save operator) -> AGC -> PBT audio filter ->
output gain — on a 128-channel receiver bank, single chip. Production path:
FusedSSBBank backend="sweep" (ops/pallas_sweep.sweep_full_chain), the whole
chain in ONE single-sweep Pallas kernel (2-slot VMEM DMA ring over time,
in-kernel LINEAR-domain decaying-max AGC scan; 8 B read + 8 B write per
sample). Falls back to the XLA planar ReceiverBank if the kernel path fails.

vs_baseline: the reference is a hard-real-time appliance processing exactly
44117.647 IQ samples/s on its Teensy 4.0 (SURVEY.md §6, BASELINE.md) — the
only throughput it defines. vs_baseline therefore counts how many reference
receivers' worth of IQ one chip sustains.

Timing methodology: this deployment runtime's ``block_until_ready`` does not
actually block, so throughput is measured over a *data-dependent chain* of
invocations (receiver state threads call-to-call) closed by a scalar readback
that forces the whole chain to completion. Inputs are device-resident.

Secondary metrics go to stderr (the driver records stdout only).
"""

import json
import os
import sys
import time

import numpy as np


CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")

SAMPLE_RATE = 44117.64706
BASELINE_SAMPLES_PER_S = SAMPLE_RATE  # one real-time reference receiver

N_CHANNELS = 128
SEG_LEN = 1 << 19          # IQ samples per channel per invocation
WARMUP = 2
REPS = 10


def main() -> None:
    import jax

    # Persistent compilation cache: the TPU pool relay's remote compiles are
    # slow (tens of seconds) and occasionally hang for minutes (the round-2
    # watchdog killer). A warm cache turns the bench's compile+first-run from
    # ~45 s into ~1 s, shrinking the hang-exposure window by ~98%. The cache
    # is warmed during the build round by running this same program.
    os.makedirs(CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    import jax.numpy as jnp

    from radiodsp_sdr_rx_tpu.models.config import AGCMode, DemodMode, ReceiverConfig
    from radiodsp_sdr_rx_tpu.models.fused import FusedSSBBank
    from radiodsp_sdr_rx_tpu.models.receiver import ReceiverBank

    cfg = ReceiverConfig(
        mode=DemodMode.USB,
        vfo_freq=7_200_000.0,
        capture_center_freq=7_190_000.0,
        agc=AGCMode.MEDIUM,
    )
    freqs = [7_190_000.0 + 1_000.0 * k for k in range(N_CHANNELS)]
    if "--xla-bank" in sys.argv:
        bank = ReceiverBank(cfg, freqs)
        path = "xla"
    else:
        # block_t sweep on-chip (2026-08-20): 8192 -> 5911, 16384 -> 6034,
        # 32768 -> 6012 Ms/s; 16384 matches 8192's checksum exactly
        bank = FusedSSBBank(cfg, freqs, block_t=16384, backend="sweep")
        path = "sweep"
    state = jax.device_put(bank.init_state())

    rng = np.random.default_rng(0)
    xr = jax.device_put(rng.standard_normal((N_CHANNELS, SEG_LEN))
                        .astype(np.float32) * 0.1)
    xi = jax.device_put(rng.standard_normal((N_CHANNELS, SEG_LEN))
                        .astype(np.float32) * 0.1)
    force = jax.jit(lambda o: jnp.sum(o["audio_l"]))

    t_compile = time.perf_counter()
    out, state = bank.process_planar(xr, xi, state)
    checksum = float(force(out))
    compile_s = time.perf_counter() - t_compile
    print(f"compile+first-run: {compile_s:.1f}s on {jax.devices()[0]} "
          f"(checksum {checksum:.4f})", file=sys.stderr)
    if not np.isfinite(checksum):
        raise RuntimeError("non-finite bench output")

    for _ in range(WARMUP):
        out, state = bank.process_planar(xr, xi, state)
    float(force(out))

    # Best of 3 timing windows: the first window after a relay-idle period
    # can run ~2x slow (observed 3.0 vs 5.8 Gs/s back-to-back); max-of-windows
    # reports the chip's sustained rate, not the relay's wake-up transient.
    elapsed = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(REPS):
            out, state = bank.process_planar(xr, xi, state)
        float(force(out))   # forces the whole dependent chain
        elapsed = min(elapsed, time.perf_counter() - t0)

    total_samples = N_CHANNELS * SEG_LEN * REPS
    samples_per_s = total_samples / elapsed
    msps = samples_per_s / 1e6

    print(
        f"{N_CHANNELS} ch x {SEG_LEN} samp x {REPS} reps in {elapsed:.3f}s "
        f"-> {msps:.1f} Msamples/s/chip "
        f"({samples_per_s / SAMPLE_RATE / N_CHANNELS:.1f}x real time per channel)",
        file=sys.stderr,
    )

    # "path" tags which engine produced the number so a silent fallback to the
    # XLA bank can never masquerade as a sweep-kernel result (VERDICT r1 #9)
    print(json.dumps({
        "metric": "full_rx_chain_iq_throughput",
        "value": round(msps, 2),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(samples_per_s / BASELINE_SAMPLES_PER_S, 1),
        "path": path,
    }))


if __name__ == "__main__":
    # The TPU pool relay is occasionally flaky: transient UNIMPLEMENTED errors
    # AND multi-minute hard hangs inside remote compiles (uninterruptible C
    # calls — SIGALRM can't fire). Each attempt therefore runs in a fresh
    # subprocess with a hard timeout; the parent retries.
    if "--preflight" in sys.argv:
        # Trivial end-to-end device round-trip; proves the relay is up.
        import jax.numpy as jnp
        assert float(jnp.ones((8,)).sum()) == 8.0
        sys.exit(0)

    if "--inner" in sys.argv:
        main()
        sys.exit(0)

    import subprocess

    def run_child(extra, budget):
        try:
            r = subprocess.run(
                [sys.executable, __file__, "--inner", *extra],
                timeout=budget, capture_output=True, text=True,
            )
            return r, None
        except subprocess.TimeoutExpired as e:
            tail = e.stderr or b""
            if isinstance(tail, bytes):
                tail = tail.decode("utf-8", "replace")
            return None, (f"watchdog timeout after {budget}s (relay hang); "
                          f"stderr tail={tail[-300:]!r}")

    def relay_up(budget=75):
        try:
            r = subprocess.run(
                [sys.executable, __file__, "--inner", "--preflight"],
                timeout=budget, capture_output=True, text=True,
            )
            return r.returncode == 0
        except subprocess.TimeoutExpired:
            return False

    # Retry plan (round-2 post-mortem: 3x 420-s relay hangs forced the XLA
    # fallback even though the sweep path was healthy). The relay has
    # multi-minute outage windows (observed 2026-08-20: even jax.devices()
    # hangs >90 s), so each real attempt is gated by a cheap preflight probe
    # — a down relay costs a 75-s probe + sleep, not a full watchdog window.
    # With a warm compilation cache a good sweep attempt finishes in ~1 min.
    # Only after repeated healthy-relay sweep failures fall back to XLA.
    DEADLINE = time.monotonic() + 40 * 60
    ATTEMPTS = [
        ("sweep", [], 300),
        ("sweep", [], 300),
        ("sweep", [], 420),
        ("sweep", [], 420),
        ("sweep", [], 600),
        ("xla", ["--xla-bank"], 420),
    ]
    last = None
    for attempt, (label, extra, budget) in enumerate(ATTEMPTS, 1):
        # past the deadline, skip straight to the final XLA fallback
        if time.monotonic() > DEADLINE and attempt < len(ATTEMPTS):
            print(f"bench deadline near; skipping attempt {attempt} [{label}]",
                  file=sys.stderr)
            continue
        while not relay_up():
            print("preflight: relay down, waiting 30s", file=sys.stderr)
            if time.monotonic() > DEADLINE:
                raise SystemExit(f"bench deadline exhausted waiting for relay; last={last}")
            time.sleep(30)
        r, err = run_child(extra, budget)
        if r is not None:
            sys.stderr.write(r.stderr)
            lines = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
            if r.returncode == 0 and lines:
                print(lines[-1])
                sys.exit(0)
            last = (f"rc={r.returncode} out={r.stdout[-200:]!r} "
                    f"err={r.stderr[-300:]!r}")
        else:
            last = err
        print(f"bench attempt {attempt} [{label}] failed: {last}", file=sys.stderr)
        time.sleep(10)
    raise SystemExit(f"bench failed after retries: {last}")
