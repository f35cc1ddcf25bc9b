"""Checkpoint / resume for receiver state.

The reference has NO persistence — a power cycle forgets tuning and all DSP
state (SURVEY.md §5). Here every carried quantity is an explicit pytree
(ReceiverState, ScopeState, LMS weights, PLL phase, overlap tails...), so
checkpointing is a flat save of named leaves; resume is exact — a restored
stream continues bit-identically, including halo-correct overlap tails
(tests/test_checkpoint.py proves stream-split-across-checkpoint == unbroken
stream).

Format: a single .npz with the pytree flattened by jax.tree paths, plus the
ReceiverConfig as JSON. No orbax dependency needed at this scale; the pytrees
are kilobytes.
"""

from __future__ import annotations

import dataclasses
import enum
import json

import numpy as np
import jax

from radiodsp_sdr_rx_tpu.models.config import (
    AGCMode, AudioFilter, DemodMode, FilterWindow, NRMode, ReceiverConfig,
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "name"):
            parts.append(str(p.name))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "key"):
            parts.append(str(p.key))
        else:
            parts.append(str(p))
    return "/".join(parts)


def save_state(path: str, state, config: ReceiverConfig | None = None) -> None:
    """Save any state pytree (ReceiverState, ScopeState, ...) to ``path``."""
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(state)[0]
    arrays = {_path_str(p): np.asarray(v) for p, v in leaves_with_paths}
    if config is not None:
        arrays["__config__"] = np.frombuffer(
            config_to_json(config).encode(), dtype=np.uint8
        )
    np.savez(path, **arrays)


def load_state(path: str, template):
    """Load a pytree saved by save_state, shaped like ``template``.

    Returns (state, config_or_None).
    """
    data = np.load(path)
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for p, tmpl in paths:
        key = _path_str(p)
        if key not in data:
            # version skew: state grew a field since this checkpoint was
            # written (e.g. conv_tail_r/i) — resume with the template's
            # (zero-initialised) leaf instead of an opaque KeyError
            leaves.append(np.asarray(tmpl))
            continue
        a = data[key]
        leaves.append(a.astype(np.asarray(tmpl).dtype).reshape(np.shape(tmpl)))
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    config = None
    if "__config__" in data:
        config = config_from_json(bytes(data["__config__"]).decode())
    return state, config


def config_to_json(config: ReceiverConfig) -> str:
    d = {}
    for f in dataclasses.fields(config):
        v = getattr(config, f.name)
        d[f.name] = v.name if isinstance(v, enum.Enum) else v
    return json.dumps(d)


_ENUMS = {
    "mode": DemodMode, "audio_filter": AudioFilter, "agc": AGCMode,
    "nr": NRMode, "fir_window": FilterWindow,
}


def config_from_json(s: str) -> ReceiverConfig:
    d = json.loads(s)
    for k, enum_cls in _ENUMS.items():
        if d.get(k) is not None:
            d[k] = enum_cls[d[k]]
    return ReceiverConfig(**d)
