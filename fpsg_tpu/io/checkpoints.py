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


def save_checkpoint(
    path: str, state: Any, use_orbax: bool = True, gather: bool = True
) -> str:
    """Save a pytree; returns the concrete path written.

    ``gather=False`` hands the (possibly mesh-sharded) ``jax.Array``
    leaves to Orbax directly — each shard is written from the device
    that holds it, with the sharding recorded in the checkpoint, so no
    full-state host gather ever happens. This is the scalable path for
    FSDP/dp-sharded TrainStates (on a multi-host mesh a gather of
    non-addressable shards would not even be possible). The msgpack
    fallback always gathers (it has no sharded representation).
    """
    path = os.path.abspath(path)
    if use_orbax:
        try:
            import orbax.checkpoint as ocp

            ckptr = ocp.StandardCheckpointer()
            ckptr.save(
                path, state if not gather else jax.device_get(state),
                force=True,
            )
            ckptr.wait_until_finished()
            return path
        except Exception:
            pass  # fall through to msgpack
    import flax.serialization

    fpath = path + ".msgpack"
    with open(fpath, "wb") as f:
        f.write(flax.serialization.to_bytes(jax.device_get(state)))
    return fpath


def restore_checkpoint(path: str, template: Any, shardings: Any = None) -> Any:
    """Restore a pytree saved by :func:`save_checkpoint` (either format).

    With ``shardings`` (a NamedSharding tree matching ``template``, e.g.
    ``parallel.mesh.fsdp_state_sharding``), the Orbax path restores each
    leaf DIRECTLY into its target sharding — shards stream from disk to
    their owning devices with no host-resident full copy. The msgpack
    path restores to host and then ``device_put``s onto the shardings.
    """
    path = os.path.abspath(path)
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        if shardings is None:
            return ckptr.restore(path, template)
        abstract = jax.tree.map(
            lambda x, s: jax.ShapeDtypeStruct(
                jnp_shape(x), jnp_dtype(x), sharding=s
            ),
            template, shardings,
        )
        return ckptr.restore(path, abstract)
    fpath = path if path.endswith(".msgpack") else path + ".msgpack"
    import flax.serialization

    with open(fpath, "rb") as f:
        restored = flax.serialization.from_bytes(template, f.read())
    if shardings is not None:
        restored = jax.device_put(restored, shardings)
    return restored


def jnp_shape(x):
    return getattr(x, "shape", ())


def jnp_dtype(x):
    import numpy as np

    return getattr(x, "dtype", None) or np.asarray(x).dtype


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
