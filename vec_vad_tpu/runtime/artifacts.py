"""Artifact persistence and stage caching.

The reference's de-facto runtime is a relay of on-disk artifacts guarded by
boolean *_saved flags (config.cfg:21-25; train.py:96-100,220-237;
test.py:175-191) and torch.save'd weight grids (train.py:436). Here:

  * VadModel (weights + score stats per block) serializes to a single .npz
    with path-flattened pytree keys + a JSON config header — no pickle, no
    torch dependency.
  * ArtifactCache replaces the boolean flags with content-hash
    invalidation: a stage's artifact is keyed by a fingerprint of its
    inputs/config, so changing a knob recomputes exactly the stale stages.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from typing import Any, Callable, Dict, Optional

import numpy as np


# ---------------------------------------------------------------------------
# Pytree <-> npz
# ---------------------------------------------------------------------------


def _flatten(tree: Any, prefix: str, out: Dict[str, np.ndarray]) -> None:
    if isinstance(tree, dict):
        for k, v in tree.items():
            _flatten(v, f"{prefix}/{k}" if prefix else str(k), out)
    elif tree is None:
        pass
    else:
        out[prefix] = np.asarray(tree)


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    root: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return root


def save_pytree_npz(path: str, tree: Any, meta: Optional[dict] = None) -> None:
    flat: Dict[str, np.ndarray] = {}
    _flatten(tree, "", flat)
    if meta is not None:
        flat["__meta__"] = np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8
        )
    np.savez_compressed(path, **flat)


def load_pytree_npz(path: str):
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    meta = None
    if "__meta__" in flat:
        meta = json.loads(bytes(flat.pop("__meta__").tobytes()).decode())
    return _unflatten(flat), meta


# ---------------------------------------------------------------------------
# VadModel serialization
# ---------------------------------------------------------------------------


def save_vad_model(path: str, model) -> None:
    """Serialize a pipeline.VadModel (the analog of the reference's
    model_set + training-scores artifacts)."""
    from vec_vad_tpu.pipeline import VadModel  # local import: avoid cycle

    assert isinstance(model, VadModel)
    tree: Dict[str, Any] = {}
    for key, blk in model.blocks.items():
        kstr = "_".join(str(k) for k in key)
        tree[kstr] = {
            "params": blk.params,
            "batch_stats": blk.batch_stats,
            "raw_scores": blk.raw_scores,
        }
        if blk.of_scores is not None:
            tree[kstr]["of_scores"] = blk.of_scores
    meta = {"cfg": dataclasses.asdict(model.cfg)}
    save_pytree_npz(path, tree, meta)


def load_vad_model(path: str):
    from vec_vad_tpu.config import (
        CompletionConfig,
        ForegroundConfig,
        PipelineConfig,
    )
    from vec_vad_tpu.pipeline import VadModel
    from vec_vad_tpu.train.trainer import TrainedBlock

    tree, meta = load_pytree_npz(path)
    cfg_d = meta["cfg"]
    cfg = PipelineConfig(
        **{
            **{
                k: v
                for k, v in cfg_d.items()
                if k not in ("fore", "model")
            },
            "fore": ForegroundConfig(**cfg_d["fore"]),
            "model": CompletionConfig(**cfg_d["model"]),
        }
    )
    model = VadModel(cfg=cfg)
    for kstr, blk in tree.items():
        key = tuple(int(x) for x in kstr.split("_"))
        model.blocks[key] = TrainedBlock(
            params=blk["params"],
            batch_stats=blk["batch_stats"],
            raw_scores=np.asarray(blk["raw_scores"]),
            of_scores=(
                np.asarray(blk["of_scores"]) if "of_scores" in blk else None
            ),
        )
    return model


# ---------------------------------------------------------------------------
# Stage cache
# ---------------------------------------------------------------------------


def fingerprint(*parts: Any) -> str:
    """Stable content hash of configs/arrays/strings."""
    h = hashlib.sha256()
    for p in parts:
        if dataclasses.is_dataclass(p) and not isinstance(p, type):
            h.update(json.dumps(dataclasses.asdict(p), sort_keys=True).encode())
        elif isinstance(p, np.ndarray):
            h.update(str(p.shape).encode())
            h.update(str(p.dtype).encode())
            h.update(hashlib.sha256(np.ascontiguousarray(p).tobytes()).digest())
        elif isinstance(p, (list, tuple)):
            for q in p:
                h.update(fingerprint(q).encode())
        else:
            h.update(repr(p).encode())
    return h.hexdigest()[:16]


class ArtifactCache:
    """Content-addressed stage cache.

    cache.get_or_compute('foreground_train', fp, compute_fn, save_fn,
    load_fn) runs compute_fn only when no artifact for (stage, fp) exists —
    the content-hash replacement for the reference's *_saved booleans.
    """

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def path(self, stage: str, fp: str, ext: str = ".npz") -> str:
        return os.path.join(self.root, f"{stage}_{fp}{ext}")

    def get_or_compute(
        self,
        stage: str,
        fp: str,
        compute: Callable[[], Any],
        save: Callable[[str, Any], None],
        load: Callable[[str], Any],
        ext: str = ".npz",
    ) -> Any:
        p = self.path(stage, fp, ext)
        if os.path.exists(p):
            return load(p)
        value = compute()
        save(p, value)
        return value
