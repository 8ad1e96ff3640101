"""Native checkpointing: Orbax primary, flax-msgpack fallback.

Artifact layout mirrors the reference (SURVEY.md §5):
``<model_path>/<name>/model_epoch_<e>`` — an Orbax directory (or a
``.msgpack`` file) holding the full TrainState (params, batch_stats,
optimizer state, step), so resume restores Adam moments — fixing the
reference's lossy resume, which restarted them from zero
(``src/trainNetwork.py:104-113``, SURVEY.md §5 checkpoint/resume).
"""

from __future__ import annotations

import os
from typing import Any

import jax


def save_checkpoint(path: str, state: Any, use_orbax: bool = True) -> str:
    """Save a pytree; returns the concrete path written."""
    path = os.path.abspath(path)
    if use_orbax:
        try:
            import orbax.checkpoint as ocp

            ckptr = ocp.StandardCheckpointer()
            ckptr.save(path, jax.device_get(state), force=True)
            ckptr.wait_until_finished()
            return path
        except Exception:
            pass  # fall through to msgpack
    import flax.serialization

    fpath = path + ".msgpack"
    with open(fpath, "wb") as f:
        f.write(flax.serialization.to_bytes(jax.device_get(state)))
    return fpath


def restore_checkpoint(path: str, template: Any) -> Any:
    """Restore a pytree saved by :func:`save_checkpoint` (either format)."""
    path = os.path.abspath(path)
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(path, template)
    fpath = path if path.endswith(".msgpack") else path + ".msgpack"
    import flax.serialization

    with open(fpath, "rb") as f:
        return flax.serialization.from_bytes(template, f.read())


def restore_checkpoint_raw(path: str) -> Any:
    """Restore without a template (nested dicts of arrays)."""
    path = os.path.abspath(path)
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        return ocp.StandardCheckpointer().restore(path)
    fpath = path if path.endswith(".msgpack") else path + ".msgpack"
    import flax.serialization

    with open(fpath, "rb") as f:
        return flax.serialization.msgpack_restore(f.read())


def checkpoint_exists(path: str) -> bool:
    path = os.path.abspath(path)
    return os.path.isdir(path) or os.path.exists(path + ".msgpack")
