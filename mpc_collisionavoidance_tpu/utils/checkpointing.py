"""Checkpoint / resume for long scenario sweeps (SURVEY.md section 5).

The reference has no on-disk checkpointing — the SQP-RTI warm start *is*
the checkpoint, held in acados process memory, plus a couple of carried
doubles (past_psied / past_Tport, reference
src/nmpc_guidance_ca1.cpp:593).  Our equivalents are already explicit
pytrees (SolverState / LaneState / GuidanceState), so checkpointing is
just orbax on those trees: a million-scenario sweep can stop and resume
mid-campaign with warm starts intact.
"""

import os
from typing import Any

import jax


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_state(path: str, state: Any) -> str:
    """Save any pytree (solver/mission/sim state) to `path` (a directory).

    The tree is flattened to an indexed leaf dict before saving: orbax
    round-trips dicts faithfully, while custom NamedTuple nodes would come
    back as plain dicts; `restore_state` rebuilds the original structure
    from a template."""
    import numpy as np
    path = os.path.abspath(path)
    leaves = [np.asarray(leaf) for leaf in jax.tree.leaves(state)]
    _checkpointer().save(
        path, {f"leaf_{i}": leaf for i, leaf in enumerate(leaves)},
        force=True)
    return path


def restore_state(path: str, like: Any) -> Any:
    """Restore a pytree saved with `save_state`, shaped like `like` (the
    template supplies the tree structure; arrays land on default devices)."""
    import jax.numpy as jnp
    restored = _checkpointer().restore(os.path.abspath(path))
    treedef = jax.tree.structure(like)
    if len(restored) != treedef.num_leaves:
        raise ValueError(
            f"checkpoint at {path} has {len(restored)} leaves but the "
            f"template has {treedef.num_leaves} — wrong template?")
    leaves = []
    for i, tmpl in enumerate(jax.tree.leaves(like)):
        leaf = restored[f"leaf_{i}"]
        t_shape = getattr(tmpl, "shape", None)
        if t_shape is not None and tuple(leaf.shape) != tuple(t_shape):
            raise ValueError(
                f"checkpoint leaf {i} has shape {tuple(leaf.shape)} but the "
                f"template expects {tuple(t_shape)} — wrong template?")
        leaves.append(jnp.asarray(leaf))
    return jax.tree.unflatten(treedef, leaves)
