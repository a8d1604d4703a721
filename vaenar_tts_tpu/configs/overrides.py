"""Dotted-path config overrides for CLI experimentation.

The reference's config is code-only (SURVEY.md section 5: no flags/env/
serialization). This adds the missing override surface for ablations
(e.g. the BASELINE.json flow-depth study):

    hp = apply_overrides(get_config("ljspeech"),
                         ["prior.n_blk=12", "train.learning_rate=1e-4"])
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Sequence

from .hparams import HParams


def _parse_value(raw: str, current: Any, field_name: str = "") -> Any:
    # the tri-state bool/"auto" knob (use_pallas_attention) accepts "auto";
    # plain bool fields must NOT (a truthy 'auto' string silently stored in
    # e.g. train.shuffle would survive serialization as a type-invalid value)
    tri_state = (field_name == "use_pallas_attention"
                 or (isinstance(current, str)
                     and current in ("auto", "on", "off")))
    if isinstance(current, bool) or tri_state:
        if raw.lower() == "auto":
            if not tri_state:
                raise ValueError(
                    f"{field_name}: 'auto' is only valid for tri-state "
                    f"knobs, not plain booleans")
            return "auto"
        return raw.lower() in ("1", "true", "yes", "on")
    if isinstance(current, int):
        return int(raw)
    if isinstance(current, float):
        return float(raw)
    if isinstance(current, tuple):
        parts = [p for p in raw.strip("()[]").split(",") if p]
        elem = current[0] if current else 0
        return tuple(type(elem)(p) for p in parts)
    return raw


def apply_overrides(hp: HParams, overrides: Sequence[str]) -> HParams:
    for ov in overrides or []:
        if "=" not in ov:
            raise ValueError(f"override must be key.path=value: {ov!r}")
        path, raw = ov.split("=", 1)
        keys = path.strip().split(".")
        # walk to the leaf's parent dataclass
        nodes = [hp]
        for k in keys[:-1]:
            nodes.append(getattr(nodes[-1], k))
        leaf_parent = nodes[-1]
        current = getattr(leaf_parent, keys[-1])
        value = _parse_value(raw.strip(), current, field_name=keys[-1])
        # rebuild the dataclass chain immutably
        new = dataclasses.replace(leaf_parent, **{keys[-1]: value})
        for node, key in zip(reversed(nodes[:-1]), reversed(keys[:-1])):
            new = dataclasses.replace(node, **{key: new})
        hp = new
    return hp
