"""Device mesh construction for channel x time sharding (+ multi-host DCN).

The reference is a single-core appliance (SURVEY.md §2.3); scale here comes
from a ``jax.sharding.Mesh`` with axes:

  host    — DCN: segments/banks across hosts (jax.distributed)
  channel — ICI: independent receiver channels (DP analog)
  time    — ICI: contiguous stream segments with halo exchange (SP/CP analog)

Collectives ride ICI within a slice; the host axis maps to DCN. On CPU test
rigs an 8-device virtual mesh stands in (tests/conftest.py).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(channel: int = 1, time: int = 1, devices=None) -> Mesh:
    """Build a (channel, time) mesh over ``channel*time`` devices."""
    if devices is None:
        devices = jax.devices()
    n = channel * time
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(channel, time)
    return Mesh(arr, axis_names=("channel", "time"))


def make_global_mesh(channel: int = 1, time: int = 1) -> Mesh:
    """Multi-host variant: uses all processes' devices (call
    ``initialize_distributed`` first on each host). Device order follows
    jax.devices(), so hosts tile the leading (channel) axis — channel banks
    shard across hosts over DCN while time segments stay intra-host on ICI."""
    return make_mesh(channel, time, devices=jax.devices())


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """jax.distributed bring-up for multi-host pods (no-op if single process).

    The reference has no multi-node story; this is the DCN layer required by
    BASELINE.json config 5 (1024-channel bank over N>=2 hosts).
    """
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
