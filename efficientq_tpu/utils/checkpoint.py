"""Orbax checkpoint backend — optional alternative to the reference-parity
pickle snapshots (src/utils/trainer.py:427-441).

Why: pickles are single-host, synchronous, and torch-layout-specific.  Orbax
checkpoints are directory-based, atomic, async-flushable and multi-host-safe
(every host writes its shard), which is the right substrate for mesh-sharded
training runs.  The payload schema is identical to the pickle backend
(epoch / state_dict / opt_state / step_idx / max_metric), so either backend
can restore a run into the same Trainer.
"""
from __future__ import annotations

import os.path as P
from typing import Any, Dict

ORBAX_SUFFIX = ".orbax"


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_checkpoint(path: str, payload: Dict[str, Any]) -> str:
    """Write ``payload`` (a pytree of arrays/scalars) to directory ``path``.
    Blocks until durable. Returns the path."""
    ck = _checkpointer()
    ck.save(P.abspath(path), payload, force=True)
    ck.wait_until_finished()
    return path


def restore_checkpoint(path: str, target: Dict[str, Any]) -> Dict[str, Any]:
    """Restore a checkpoint written by :func:`save_checkpoint`.

    ``target`` is a same-structure payload (live arrays are fine) used to
    restore exact pytree structure — optax states come back as the original
    namedtuples, not dicts.
    """
    ck = _checkpointer()
    return ck.restore(P.abspath(path), target)


def is_orbax_checkpoint(path: str) -> bool:
    return path.endswith(ORBAX_SUFFIX) or (
        P.isdir(path) and P.isfile(P.join(path, "_CHECKPOINT_METADATA")))
