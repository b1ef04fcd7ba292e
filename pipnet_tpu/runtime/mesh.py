"""Device mesh setup and batch sharding helpers.

The multi-chip story (replacing torchrun/DDP/NCCL, SURVEY §2.9/§5.8): a 1-D
``data`` mesh over all devices; parameters replicated, batches sharded on the
leading axis.  Under ``jax.jit`` with these shardings XLA inserts the gradient
all-reduce over ICI — there is no hand-written collective code to maintain.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(num_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), axis_names=("data",))


def shard_batch(mesh: Mesh, *arrays):
    """Place arrays with the leading axis sharded over the data mesh."""
    sh = NamedSharding(mesh, P("data"))
    return tuple(jax.device_put(a, sh) for a in arrays)


def replicate(mesh: Mesh, tree):
    sh = NamedSharding(mesh, P())
    return jax.device_put(tree, sh)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# -- prototype-axis model parallelism ----------------------------------------
#
# The stacked prototype axis ``P`` (tree/compile.py) is this architecture's
# real scaling axis (SURVEY §5.7): every tree node adds a prototype bank, so
# at large phylogenies (10k+ species) the head parameters, their optimizer
# state, and the (B, H, W, P) activation maps outgrow one chip long before the
# fixed-size backbone does.  A 2-D ("data", "model") mesh shards exactly those
# along P while the backbone stays pure data-parallel.  Every head op is a
# plain matmul or a one-hot-matmul segment reduction (ops/segment.py), so
# GSPMD propagates the shardings and inserts the ICI collectives — there is no
# hand-written collective code, matching the DP design above.
#
# The fused Pallas head is a single-device kernel; model-parallel runs use the
# XLA head (Trainer validates this).

# head param name -> dim carrying the stacked prototype axis (models/heads.py)
PROTO_AXIS_PARAMS = {
    "add_on_kernel": 1,    # (C_in, P)
    "add_on_bias": 0,      # (P,)
    "cls_weight": 1,       # (C, P)
    "proto_presence": 0,   # (P, 2)
}


def dp_mp_mesh(n_data: int, n_model: int, devices=None) -> Mesh:
    """2-D ("data", "model") mesh over the first n_data*n_model devices."""
    if devices is None:
        devices = jax.devices()
    need = n_data * n_model
    if len(devices) < need:
        raise ValueError(f"need {need} devices for a ({n_data},{n_model}) "
                         f"mesh, found {len(devices)}")
    grid = np.asarray(devices[:need]).reshape(n_data, n_model)
    return Mesh(grid, axis_names=("data", "model"))


def _proto_axis_spec(path, leaf) -> P:
    """PartitionSpec for one state leaf: shard the prototype axis of the head
    params (and of their optimizer-state mirrors, which carry the same leaf
    names through optax's mu/nu trees); everything else replicated."""
    ndim = getattr(leaf, "ndim", None)
    for entry in reversed(path):
        name = getattr(entry, "key", getattr(entry, "name", None))
        if name in PROTO_AXIS_PARAMS:
            dim = PROTO_AXIS_PARAMS[name]
            if ndim is not None and ndim > dim:
                spec = [None] * ndim
                spec[dim] = "model"
                return P(*spec)
    return P()


def _zero1_spec(path, leaf, dp: int) -> P:
    """ZeRO-1 spec for one optimizer-state leaf: shard the largest
    dp-divisible dim of mu/nu over "data"; replicate everything else.

    Params and gradients stay replicated (the plain-DP contract), only the
    Adam moments are partitioned — each device updates its slice and XLA
    all-gathers the resulting param delta, the classic ZeRO-1 wire profile
    (one extra all-gather, same bytes as the grad psum) for a dp-fold cut in
    optimizer-state HBM.

    Expected cost signature: XLA warns "Some donated buffers were not
    usable" for the updated params — an all-gather-produced output cannot
    alias its donated input buffer, so each step writes one fresh
    params-worth of HBM.  That traffic IS the ZeRO-1 trade; the warning is
    benign."""
    names = [getattr(e, "key", getattr(e, "name", None)) for e in path]
    if "mu" not in names and "nu" not in names:
        return P()
    shape = getattr(leaf, "shape", ())
    best_dim, best_size = None, 0
    for d, size in enumerate(shape):
        if size % dp == 0 and size > best_size:
            best_dim, best_size = d, size
    if best_dim is None:
        return P()
    spec = [None] * len(shape)
    spec[best_dim] = "data"
    return P(*spec)


def state_shardings(mesh: Mesh, state, zero1: bool = False):
    """NamedSharding pytree for a train state.

    On a 1-D data mesh everything is replicated (the DP contract above); on a
    ("data", "model") mesh the head params' prototype axis is sharded over
    "model".  Works on the full TrainState — optax mu/nu mirror the param tree
    leaf names, so path matching shards them identically to their params.

    ``zero1`` additionally shards the Adam moments over "data"
    (``_zero1_spec``); a head leaf that carries the prototype axis keeps its
    "model" sharding (it is already partitioned dp*mp-wide there).
    """
    dp = int(dict(mesh.shape).get("data", 1))
    has_model = "model" in mesh.axis_names

    def spec_for(path, leaf) -> P:
        if has_model:
            s = _proto_axis_spec(path, leaf)
            if s != P():
                return s
        if zero1 and dp > 1:
            return _zero1_spec(path, leaf, dp)
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_for(path, leaf)), state)
