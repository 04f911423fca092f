"""Full training-state checkpointing via orbax.

The light .npz format (utils/checkpoint.py) stores serving params only; this
module persists the complete train state (params + optimizer moments + BN
stats + step) so interrupted runs resume exactly — a capability the reference
lacks entirely (its resume reloads weights but resets the optimizer,
reference train.py:112-116).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _ckptr():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_train_state(path: str, state: Dict[str, Any]) -> None:
    """Write the full train state to ``path`` (an orbax directory)."""
    host_state = jax.tree.map(np.asarray, state)
    _ckptr().save(os.path.abspath(path), host_state, force=True)


def restore_train_state(path: str,
                        template: Optional[Dict[str, Any]] = None
                        ) -> Dict[str, Any]:
    """Restore a train state; ``template`` (a freshly-initialized state)
    restores exact array types/structure when given."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    if template is not None:
        host_template = jax.tree.map(np.asarray, template)
        return _ckptr().restore(path, args=ocp.args.PyTreeRestore(
            item=host_template))
    return _ckptr().restore(path)
