"""Portable compressed checkpoint exports (``export.npz``).

The reference ships its trained artifact as TF checkpoint files a user
points ``inference.py --ckpt_path`` at (reference inference.py:121-123).
The Orbax workdirs this framework trains into are the working-format
equivalent, but they are heavy (optimizer state triples the size) and
directory-shaped (awkward to version or hand someone). This module adds a
single-file, compressed, optionally fp16 export of just what synthesis
needs — ``{params, batch_stats, epoch}`` — and ``cli.inference`` falls back
to it automatically when a ``--model_dir`` holds an ``export.npz`` instead
of (or alongside no) Orbax checkpoint.

Format: one ``np.savez_compressed`` archive. Each pytree leaf is stored
under its ``/``-joined key path prefixed by the top-level collection
(``params/...``, ``batch_stats/...``); ``epoch`` is a scalar entry; a
``__meta__`` JSON entry records the export dtype and original leaf dtypes
so loading restores the exact training-time dtypes (fp16 storage is a
pure-compression choice, re-expanded on load — measured harmless for
synthesis at ~1e-3 relative weight rounding, and the flow's fp32 math runs
on the re-cast fp32 weights).
"""

from __future__ import annotations

import io
import json
import os
from typing import Any, Dict

import jax
import numpy as np

EXPORT_NAME = "export.npz"


def _flatten(tree: Any, prefix: str) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = prefix + "/".join(_path_part(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _path_part(p) -> str:
    if hasattr(p, "key"):  # DictKey
        return str(p.key)
    if hasattr(p, "idx"):  # SequenceKey
        return str(p.idx)
    return str(p)


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        node = tree
        parts = key.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return tree


def save_npz(path: str, state: Dict[str, Any],
             store_dtype: str | None = "float16") -> str:
    """Write ``{params, batch_stats, epoch}`` to a compressed archive.

    ``store_dtype``: floating leaves are stored at this dtype (None keeps
    the original); integer leaves are never down-cast. Original dtypes are
    recorded and restored by :func:`load_npz`.
    """
    flat = {}
    flat.update(_flatten(state["params"], "params/"))
    flat.update(_flatten(state.get("batch_stats", {}), "batch_stats/"))
    dtypes = {k: str(v.dtype) for k, v in flat.items()}
    if store_dtype is not None:
        down = np.dtype(store_dtype)
        flat = {k: (v.astype(down)
                    if np.issubdtype(v.dtype, np.floating) else v)
                for k, v in flat.items()}
    flat["epoch"] = np.asarray(int(state.get("epoch", 0)), np.int64)
    meta = {"version": 1, "store_dtype": store_dtype, "dtypes": dtypes}
    flat["__meta__"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8).copy()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    # write via a buffer then one atomic rename so a crashed export never
    # leaves a truncated archive where the inference fallback will find it
    buf = io.BytesIO()
    np.savez_compressed(buf, **flat)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    os.replace(tmp, path)
    return path


def load_npz(path: str) -> Dict[str, Any]:
    """Read an export back to ``{params, batch_stats, epoch}`` with each
    leaf at its original (pre-compression) dtype."""
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode("utf-8"))
        dtypes = meta["dtypes"]
        flat = {k: z[k].astype(dtypes[k]) for k in dtypes}
        epoch = int(z["epoch"])
    params = _unflatten({k[len("params/"):]: v for k, v in flat.items()
                         if k.startswith("params/")})
    batch_stats = _unflatten(
        {k[len("batch_stats/"):]: v for k, v in flat.items()
         if k.startswith("batch_stats/")})
    return {"params": params, "batch_stats": batch_stats, "epoch": epoch}


def export_model_dir(model_dir: str, out_path: str | None = None,
                     store_dtype: str | None = "float16",
                     epoch: int | None = None) -> str:
    """Export the latest (or ``epoch``-pinned) Orbax checkpoint in
    ``model_dir`` (a training workdir's ``ckpt/``) to ``out_path``
    (default: ``model_dir/export.npz``, where the inference fallback
    looks)."""
    from ..configs.serialize import load_hparams
    from ..models.vaenar import VAENAR
    from ..training.steps import init_model, make_optimizer
    from .checkpoint import CheckpointManager

    hp = load_hparams(model_dir)
    if hp is None:
        raise FileNotFoundError(f"no hparams.json in {model_dir} — export "
                                "needs the resolved training config")
    model = VAENAR(hp)
    params, batch_stats = init_model(hp, model, hp.train.random_seed,
                                     text_max=hp.dataset.text_bucket,
                                     mel_max=hp.dataset.mel_bucket)
    mgr = CheckpointManager(model_dir)
    full = {"params": params, "batch_stats": batch_stats, "epoch": 0,
            "opt_state": make_optimizer(hp).init(params)}
    restored = mgr.restore(full, epoch=epoch)
    mgr.close()
    if restored is None:
        raise FileNotFoundError(f"no checkpoint found in {model_dir}")
    out = out_path or os.path.join(model_dir, EXPORT_NAME)
    return save_npz(out, {"params": restored["params"],
                          "batch_stats": restored["batch_stats"],
                          "epoch": int(restored["epoch"])},
                    store_dtype=store_dtype)
