"""Learned-artifact persistence: the small models the operators train
(IVF centroids, PQ codebooks, BPE merges) saved beside the tables they
index.

These artifacts are tiny (KiB-MiB) but EXPENSIVE to reproduce at
100 TB (each is a corpus pass), and every one of them must be the
SAME object across the jobs that share an index — a PQ code is
meaningless against regenerated codebooks. So they persist like any
other table asset: a directory with a JSON manifest (kind, shape,
creation params, content digest) plus the payload (``.npy`` for
arrays, JSON for merge lists), and loads VERIFY the digest — a
half-written or hand-edited artifact fails loudly instead of serving
wrong neighbors.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np

_MANIFEST = "artifact.json"
_PAYLOAD_NPY = "payload.npy"
_PAYLOAD_JSON = "payload.json"


def _digest(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as fh:
        for chunk in iter(lambda: fh.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def save_artifact(root: str, obj, kind: str, params: dict | None = None) -> str:
    """Persist a learned artifact. ``obj``: np.ndarray (centroids,
    codebooks) or a JSON-serializable structure (BPE merge list).
    Overwrites atomically (temp dir + rename)."""
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(dir=os.path.dirname(root) or ".")
    try:
        if isinstance(obj, np.ndarray):
            payload = _PAYLOAD_NPY
            np.save(os.path.join(tmp, "payload.npy"), obj)
            shape = list(obj.shape)
        else:
            payload = _PAYLOAD_JSON
            with open(os.path.join(tmp, "payload.json"), "w") as fh:
                json.dump(obj, fh)
            shape = [len(obj)] if hasattr(obj, "__len__") else None
        manifest = {
            "kind": kind,
            "payload": payload,
            "shape": shape,
            "params": params or {},
            "sha256": _digest(os.path.join(tmp, payload)),
        }
        with open(os.path.join(tmp, _MANIFEST), "w") as fh:
            json.dump(manifest, fh)
        shutil.rmtree(root, ignore_errors=True)
        os.rename(tmp, root)
        return root
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise


def load_artifact(root: str, expect_kind: str | None = None):
    """Load and VERIFY an artifact: digest mismatch or kind mismatch
    raises — wrong-index bugs surface at load, not as silently wrong
    neighbors. Returns (object, manifest)."""
    with open(os.path.join(root, _MANIFEST)) as fh:
        m = json.load(fh)
    if expect_kind is not None and m["kind"] != expect_kind:
        raise ValueError(
            f"artifact at {root} is kind {m['kind']!r}, expected {expect_kind!r}"
        )
    payload_path = os.path.join(root, m["payload"])
    got = _digest(payload_path)
    if got != m["sha256"]:
        raise ValueError(
            f"artifact payload digest mismatch at {root}: manifest "
            f"{m['sha256'][:12]}.., file {got[:12]}.. — corrupt or edited"
        )
    if m["payload"] == _PAYLOAD_NPY:
        obj = np.load(payload_path)
    else:
        with open(payload_path) as fh:
            obj = json.load(fh)
    return obj, m
