"""Device mesh + sharding rules for multi-chip training and synthesis.

The reference has NO distributed support (SURVEY.md section 2 parallelism
census); this is a new first-class TPU-native component. Strategy:

  * ``data`` axis: batch-sharded inputs (DP). Gradients are globally correct
    by GSPMD semantics - jit over NamedSharding inputs makes XLA insert the
    psum over ICI.
  * ``model`` axis: tensor-parallel weight sharding for the wide matmuls
    (encoder FFN 1024-hidden, prenet convs, embedding table). Params whose
    output dim is divisible by the model-axis size and large enough are
    sharded on that dim; everything else is replicated.

Single-device semantics are preserved at global-batch level: the same batch on
a 1-device mesh computes bit-identical losses (modulo reduction order).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices=None) -> Mesh:
    """Create a ('data', 'model') mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, (data, model, n)
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


MIN_SHARD_DIM = 512


def param_sharding_rules(params: Any, mesh: Mesh) -> Any:
    """Pytree of NamedShardings: shard the last (output) dim of large kernels
    over 'model'; replicate the rest.

    Flow params (slogdet/inverse) and all small tensors stay replicated.
    """
    model_size = mesh.shape["model"]

    def rule(path: Tuple, leaf) -> NamedSharding:
        if model_size <= 1:
            return replicated(mesh)
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if "prior" in keys:  # flow stays replicated (inverse/slogdet locality)
            return replicated(mesh)
        shape = getattr(leaf, "shape", ())
        if (len(shape) >= 2 and shape[-1] % model_size == 0
                and shape[-1] >= MIN_SHARD_DIM):
            spec = [None] * (len(shape) - 1) + ["model"]
            return NamedSharding(mesh, P(*spec))
        return replicated(mesh)

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Device-put params according to the sharding rules."""
    shardings = param_sharding_rules(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def shard_batch(batch_arrays: Tuple, mesh: Mesh) -> Tuple:
    bs = batch_sharding(mesh)
    return tuple(jax.device_put(a, bs) for a in batch_arrays)
