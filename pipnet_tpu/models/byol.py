"""BYOL self-supervised variant: patch-level projector/predictor heads with an
EMA target network.

Counterpart of ``pipnet_byol/pipnet_byol.py:35-160``: per-patch 1x1-conv MLPs
(D -> 3072 -> D with BatchNorm+ReLU) on top of the backbone; the target
branch is an exponential moving average of the online backbone+projector with
cosine-scheduled tau (``pipnet/train.py:343-350``).

TPU-native notes: target parameters live in the train state as a separate
pytree and the EMA update is a pure ``tree.map`` inside the jitted step —
identical on every replica, so the reference's implicit DDP synchronization
concerns disappear.

(The reference's optimizer for BYOL raises NotImplementedError —
``util/args.py:453-454`` — so training BYOL end-to-end is an extension here,
faithful to the model/loss definitions that do exist.)
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

BYOL_HIDDEN = 3072


class PatchMLP(nn.Module):
    """1x1-conv MLP over patches: D -> hidden -> D (BatchNorm + ReLU)."""
    out_channels: int
    hidden: int = BYOL_HIDDEN
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc_in")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        x = nn.relu(x)
        return nn.Dense(self.out_channels, dtype=self.dtype, name="fc_out")(x)


def byol_tau_schedule(step, max_steps, tau_base: float = 0.9995,
                      tau_max: float = 1.0):
    """Cosine-ramped EMA coefficient (ref pipnet/train.py:344)."""
    cos = jnp.cos(jnp.pi * step / jnp.maximum(max_steps, 1))
    return tau_max - (tau_max - tau_base) * (cos + 1.0) / 2.0


def ema_update(target_tree, online_tree, tau):
    """target <- tau * target + (1 - tau) * online (ref pipnet/train.py:39-42)."""
    return jax.tree.map(lambda t, o: tau * t + (1.0 - tau) * o,
                        target_tree, online_tree)


def init_byol_state(backbone_params, projector_params) -> Dict[str, Any]:
    """Deep-copy init of the target branch (ref pipnet_byol.py:73-76)."""
    return {"target_backbone": jax.tree.map(jnp.array, backbone_params),
            "target_projector": jax.tree.map(jnp.array, projector_params)}
