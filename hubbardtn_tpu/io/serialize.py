"""State and result serialization.

TPU-native equivalent of the reference's JLD2-based ``save_state`` /
``load_state`` (/root/reference/src/HubbardFunctions.jl:1669-1691) and the
DrWatson result files.  A :class:`UniformMPS` is stored as one ``.npz``
archive: every block of every tensor becomes a named numpy array and the
static metadata (group, spaces, arrows, charges) is pickled alongside, so a
fresh process can rebuild the exact block structure."""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from ..mps.imps import UniformMPS
from ..symmetry import groups as _groups
from ..symmetry.groups import AbelianGroup
from ..symmetry.spaces import Space
from ..tensor.symtensor import SymTensor

_GROUPS = {
    "fZ2xU1szxU1c": _groups.FERMION_SPIN_CHARGE,
    "fZ2xU1sz": _groups.FERMION_SPIN,
    "fZ2xSU2xU1c": _groups.FERMION_SU2_CHARGE,
    "fZ2xSU2": _groups.FERMION_SU2,
}


def _group_name(group: AbelianGroup) -> str:
    name = str(group)
    if name not in _GROUPS:
        raise ValueError(f"unknown group {name}; register it in serialize._GROUPS")
    return name


def _tensor_meta(t) -> dict:
    from ..tensor.fusion import FusionTensor
    fusion = isinstance(t, FusionTensor)
    return {
        "cls": "fusion" if fusion else "sym",
        "group": _group_name(t.group),
        "spaces": [list(sp.items) for sp in t.spaces],
        "arrows": list(t.arrows),
        "charge": t.charges if fusion else t.charge,
        "keys": sorted(t.blocks.keys()),
        "dtype": str(t.dtype),
    }


def _tensor_from_meta(meta: dict, arrays: List[np.ndarray]):
    group = _GROUPS[meta["group"]]
    spaces = [Space(group, [(tuple(q), d) for q, d in sp])
              for sp in meta["spaces"]]
    if meta.get("cls") == "fusion":
        from ..tensor.fusion import FusionTensor
        blocks = {k: jnp.asarray(a) for k, a in zip(meta["keys"], arrays)}
        return FusionTensor(group, spaces, meta["arrows"], blocks,
                            tuple(meta["charge"]), meta["dtype"])
    blocks = {tuple(tuple(int(x) for x in q) for q in k): jnp.asarray(a)
              for k, a in zip(meta["keys"], arrays)}
    return SymTensor(group, spaces, meta["arrows"], blocks,
                     tuple(meta["charge"]), meta["dtype"])


def save_state(psi: UniformMPS, path: str) -> None:
    """Save a uniform MPS to ``path`` (.npz)."""
    arrays: Dict[str, np.ndarray] = {}
    meta: Dict[str, Any] = {"T": psi.T, "tensors": {}}
    for role, tensors in (("AL", psi.ALs), ("AR", psi.ARs), ("C", psi.Cs)):
        for x, t in enumerate(tensors):
            tag = f"{role}{x}"
            meta["tensors"][tag] = _tensor_meta(t)
            for i, k in enumerate(meta["tensors"][tag]["keys"]):
                arrays[f"{tag}__{i}"] = np.asarray(t.blocks[k])
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    arrays["__meta__"] = np.frombuffer(pickle.dumps(meta), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_state(path: str) -> UniformMPS:
    """Load a uniform MPS saved by :func:`save_state`."""
    data = np.load(path, allow_pickle=False)
    meta = pickle.loads(data["__meta__"].tobytes())
    out = {"AL": [], "AR": [], "C": []}
    for role in ("AL", "AR", "C"):
        for x in range(meta["T"]):
            tag = f"{role}{x}"
            tmeta = meta["tensors"][tag]
            arrays = [data[f"{tag}__{i}"] for i in range(len(tmeta["keys"]))]
            out[role].append(_tensor_from_meta(tmeta, arrays))
    return UniformMPS(out["AL"], out["AR"], out["C"])


def save_result(obj: dict, path: str) -> None:
    """Pickle a result dictionary (states stored via their block arrays)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = {}
    for key, val in obj.items():
        if key in ("environments", "ham"):
            continue  # live objects, recomputed on load
        if isinstance(val, UniformMPS):
            payload[key] = ("__mps__", _mps_payload(val))
        else:
            try:
                pickle.dumps(val)
                payload[key] = ("__raw__", val)
            except Exception:
                continue  # skip non-picklables
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_result(path: str) -> dict:
    with open(path, "rb") as f:
        payload = pickle.load(f)
    out = {}
    for key, (kind, val) in payload.items():
        out[key] = _mps_from_payload(val) if kind == "__mps__" else val
    return out


def _mps_payload(psi: UniformMPS):
    return {
        "T": psi.T,
        "tensors": {
            f"{role}{x}": (_tensor_meta(t),
                           [np.asarray(t.blocks[k])
                            for k in sorted(t.blocks.keys())])
            for role, ts in (("AL", psi.ALs), ("AR", psi.ARs), ("C", psi.Cs))
            for x, t in enumerate(ts)
        },
    }


def _mps_from_payload(p) -> UniformMPS:
    out = {"AL": [], "AR": [], "C": []}
    for role in ("AL", "AR", "C"):
        for x in range(p["T"]):
            meta, arrays = p["tensors"][f"{role}{x}"]
            out[role].append(_tensor_from_meta(meta, arrays))
    return UniformMPS(out["AL"], out["AR"], out["C"])
