"""Checkpoint / resume.

The reference declares backup globals but never implements them
(Globals.h:105-109 — no .c file references them; SURVEY.md §5.4): the only
restart is the in-process -ff static→dynamic flow.  This module provides the
missing capability: the full particle SoA + step counter round-trips through
a single compressed npz (host-side, no extra deps), so any run can resume
mid-schedule via Time_Int_Params-style i0.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np
import jax.numpy as jnp

from .. import config
from ..types import Particles

_FORMAT_VERSION = 1


def save_checkpoint(path: str, p: Particles, step: int, extra: dict = None) -> str:
    """Write particle state + step counter (+ optional extra arrays)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fields = {f"particles.{k}": np.asarray(v) for k, v in vars(p).items()}
    fields["meta.step"] = np.asarray(step, np.int64)
    fields["meta.version"] = np.asarray(_FORMAT_VERSION, np.int64)
    for k, v in (extra or {}).items():
        fields[f"extra.{k}"] = np.asarray(v)
    tmp = path + ".tmp"
    np.savez_compressed(tmp, **fields)
    # np.savez appends .npz to the name it's given
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)
    return path


def load_checkpoint(path: str) -> Tuple[Particles, int, dict]:
    """Restore (particles, step, extra)."""
    data = np.load(path)
    version = int(data["meta.version"])
    if version != _FORMAT_VERSION:
        raise ValueError(f"checkpoint version {version} != {_FORMAT_VERSION}")
    kw = {}
    for key in data.files:
        if key.startswith("particles."):
            name = key.split(".", 1)[1]
            arr = data[key]
            kw[name] = jnp.asarray(arr)
    p = Particles(**kw)
    extra = {
        key.split(".", 1)[1]: data[key]
        for key in data.files
        if key.startswith("extra.")
    }
    return p, int(data["meta.step"]), extra
