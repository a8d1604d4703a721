"""Config serialization: persist the resolved HParams next to checkpoints so
inference/synthesis reconstruct exactly the trained architecture (the
reference couples them by convention only - config is code, hparams.py:233).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

from .hparams import HParams


def hparams_to_dict(hp: HParams) -> dict:
    return dataclasses.asdict(hp)


def hparams_from_dict(d: dict) -> HParams:
    defaults = HParams()
    kwargs: dict = {}
    for f in dataclasses.fields(HParams):
        if f.name not in d:
            continue
        v = d[f.name]
        sub_default = getattr(defaults, f.name)
        if dataclasses.is_dataclass(sub_default):
            sub_cls = type(sub_default)
            sub_kwargs = {}
            for sf in dataclasses.fields(sub_cls):
                if sf.name in v:
                    sv = v[sf.name]
                    if isinstance(sv, list):  # json has no tuples
                        sv = tuple(sv)
                    sub_kwargs[sf.name] = sv
            kwargs[f.name] = sub_cls(**sub_kwargs)
        else:
            kwargs[f.name] = v
    return HParams(**kwargs)


def save_hparams(hp: HParams, model_dir: str) -> str:
    os.makedirs(model_dir, exist_ok=True)
    path = os.path.join(model_dir, "hparams.json")
    with open(path, "w") as f:
        json.dump(hparams_to_dict(hp), f, indent=2)
    return path


def load_hparams(model_dir: str) -> HParams | None:
    path = os.path.join(model_dir, "hparams.json")
    if not os.path.isfile(path):
        return None
    with open(path) as f:
        return hparams_from_dict(json.load(f))
