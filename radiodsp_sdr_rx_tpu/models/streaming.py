"""Streaming runtime: the reference's ISR/loop split as a host feeder loop.

The reference couples a hard-real-time audio ISR to a best-effort main loop
through block queues (SURVEY.md §1, §3.2-3.3). Here the same structure is a
``StreamingReceiver``: a producer (capture thread, file reader, or caller)
pushes IQ into the native lock-free ring (native/rdsp_io.cpp); the consumer
side drains fixed-size blocks through the jitted receiver pipeline, carrying
``ReceiverState`` (and optionally ``ScopeState`` metrics) across blocks.
Back-pressure is explicit: ring overruns are counted, not hidden — the
observable version of the reference's silent block dropping when ``loop()``
falls behind (RDSP_convolutional.h:231).
"""

from __future__ import annotations

import threading

import numpy as np

from radiodsp_sdr_rx_tpu.models.config import ReceiverConfig
from radiodsp_sdr_rx_tpu.models.receiver import Receiver
from radiodsp_sdr_rx_tpu.models.metrics import analyze_jit, scope_init


class StreamingReceiver:
    """Block-streaming receiver over the native IQ ring buffer.

    >>> sr = StreamingReceiver(cfg, block=16384)
    >>> sr.push(iq_chunk)          # producer side (any thread)
    >>> audio = sr.drain()         # consumer side: demod everything available
    >>> sr.stats                   # pushed/popped/dropped counters
    """

    def __init__(
        self,
        config: ReceiverConfig,
        block: int = 16384,
        ring_capacity: int = 1 << 17,
        metrics: bool = False,
    ):
        from radiodsp_sdr_rx_tpu.utils import native_io

        if block % 128:
            raise ValueError("block must be a multiple of 128")
        self.receiver = Receiver(config)
        self.block = block
        self.metrics_enabled = metrics
        self.ring = native_io.IQRing(ring_capacity)
        self.state = self.receiver.init_state()
        self.scope = scope_init() if metrics else None
        self.last_metrics: dict | None = None
        self._lock = threading.Lock()

    # -- producer side --------------------------------------------------------

    def push(self, iq: np.ndarray) -> int:
        """Push complex64 IQ; returns samples accepted (rest counted dropped)."""
        return self.ring.push_complex(np.asarray(iq))

    def push_backpressure(self, iq: np.ndarray) -> None:
        """Push with retry until fully accepted (file/offline producers)."""
        seg = np.asarray(iq)
        while len(seg):
            accepted = self.ring.push_complex(seg)
            seg = seg[accepted:]
            if not accepted and len(seg):
                self.process_available()  # consumer must drain in this thread

    # -- consumer side --------------------------------------------------------

    def process_available(self) -> list[np.ndarray]:
        """Demodulate every full block currently in the ring."""
        outs = []
        with self._lock:
            while self.ring.available >= self.block:
                iq = self.ring.pop_complex(self.block)
                out, self.state = self.receiver.process(iq, self.state)
                if self.metrics_enabled and len(iq) % 512 == 0:
                    m, self.scope = analyze_jit(
                        iq, out["audio_l"], self.scope,
                        sample_rate=self.receiver.config.sample_rate)
                    self.last_metrics = m
                outs.append(np.asarray(out["audio_l"]))
        return outs

    def run_file(self, iq: np.ndarray, chunk: int = 65536) -> np.ndarray:
        """Offline convenience: stream an in-memory capture through the ring
        (exercising the full producer/consumer path) and return the audio."""
        outs = []
        pos = 0
        n = (len(iq) // self.block) * self.block
        while pos < n:
            seg = np.asarray(iq[pos : pos + chunk])
            while len(seg):
                accepted = self.ring.push_complex(seg)
                seg = seg[accepted:]
                outs.extend(self.process_available())
            pos += chunk
        outs.extend(self.process_available())
        return np.concatenate(outs) if outs else np.zeros(0, np.float32)

    @property
    def stats(self) -> dict:
        return self.ring.stats

    def close(self) -> None:
        self.ring.close()
