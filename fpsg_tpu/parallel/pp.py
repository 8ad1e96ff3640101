"""Pipeline ('pp') parallelism — GPipe over the ICI ring.

The reference is single-GPU (`src/train.py` hardcodes one device); its
only concurrency is CUDA streams inside one chip. This module completes
the parallel family for models DEEPER than one chip: dp = episodes,
mp = decoder clusters, fsdp = optimizer state, sp = points, **pp =
layers**. Stage s of the network lives on device s of a ``('pp',)``
mesh axis; microbatches stream through the ring (GPipe schedule,
arXiv:1811.06965) with one ``lax.ppermute`` hop per tick carrying the
boundary activation to the next stage.

Everything is a single SPMD program under ``shard_map``:

- **Schedule.** ``S`` stages x ``M`` microbatches run in
  ``T = M + S - 1`` ticks of one ``lax.scan``. At tick ``t`` device
  ``d`` processes microbatch ``m = t - d`` (a bubble when ``m`` is out
  of range — the standard GPipe bubble fraction ``(S-1)/T``). Stage 0
  injects microbatch ``t`` from its (replicated) input; stage ``S-1``
  accumulates outputs; a final masked ``psum`` replicates the
  collected outputs (every other shard is zero, so the sum is a
  broadcast, not a reduction).
- **Gradients come from AD, not a hand-written backward pass.**
  ``ppermute`` transposes to the reverse rotation, the scan transposes
  to the reverse-time scan, so ``jax.grad`` of a loss on the pipeline
  output IS the backward pipeline — cotangents hop the ring in
  reverse. Each stage call is ``jax.checkpoint``-wrapped (``remat=``)
  so the backward rematerializes stage compute instead of storing
  ``T`` boundary activations.
- **Homogeneous fast path** (:func:`pipeline_repeated`): when the
  network is a repeated block (the transformer/pp textbook case),
  per-stage params stack into ``(S, ...)`` leaves sharded
  ``P('pp', ...)`` — each device materializes ONLY its stage's
  parameters (true pp memory scaling), and boundary activations need
  no padding.
- **Heterogeneous path** (:func:`pipeline_stages`): arbitrary stage
  functions (e.g. VGG conv blocks whose activation shapes shrink
  224²x64 → 14²x512). SPMD needs one ppermute buffer shape, so
  boundary activations are flattened and zero-padded to the widest
  boundary, and each device picks its stage with ``lax.switch``.
  The padding waste is the honest cost of heterogeneous pp — for
  VGG-16 the widest boundary (224²x64) is ~25x the narrowest, so ICI
  carries up to 25x useful bytes. That, plus the bubble at the small
  ``M`` this workload runs (E=1 episodes), is why pp is a CAPABILITY
  here (deep repeated backbones, models deeper than one chip's HBM)
  and dp/sp/fsdp are the production axes — see DESIGN.md.

No ``'ep'`` (expert) axis exists anywhere in this family: the
reference has no mixture-of-experts component (SURVEY.md §2 lists
none), so there is nothing to expert-shard. Documented here so the
omission is a decision, not a gap.
"""

from __future__ import annotations

import functools
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def make_pp_mesh(n_stages: int, devices=None) -> Mesh:
    """1-D ``('pp',)`` mesh over the first ``n_stages`` devices."""
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_stages, (len(devices), n_stages)
    return Mesh(np.array(devices[:n_stages]), ("pp",))


def stack_stage_params(params_list: Sequence) -> object:
    """Stack per-stage pytrees (identical treedefs/shapes) into one
    pytree with a leading stage axis — shard its leaves ``P('pp',...)``
    so each device holds only its stage's slice."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)


# ---------------------------------------------------------------------------
# Homogeneous (repeated-block) pipeline: true param sharding, no padding.
# ---------------------------------------------------------------------------


def _gpipe_local_repeated(stage_fn, remat, n_micro, axis_name,
                          stacked_local, x):
    """SPMD body (inside shard_map). ``stacked_local``: params with a
    local leading axis of 1 (this device's stage). ``x``:
    ``(M, *a)`` replicated microbatched input; boundary activations
    all share shape ``a`` (repeated block)."""
    s = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    params = jax.tree.map(lambda l: l[0], stacked_local)
    perm = [(i, (i + 1) % s) for i in range(s)]
    t_total = n_micro + s - 1
    a_shape = x.shape[1:]

    fn = jax.checkpoint(stage_fn) if remat else stage_fn

    def tick(carry, t):
        cur, out = carry
        inj = x[jnp.clip(t, 0, n_micro - 1)]
        cur = jnp.where(my == 0, inj, cur)
        y = fn(params, cur)
        m_out = jnp.clip(t - (s - 1), 0, n_micro - 1)
        valid = (my == s - 1) & (t >= s - 1)
        upd = jnp.where(valid, y, out[m_out])
        out = jax.lax.dynamic_update_index_in_dim(out, upd, m_out, 0)
        cur = jax.lax.ppermute(y, axis_name, perm)
        return (cur, out), None

    init = (jnp.zeros(a_shape, x.dtype),
            jnp.zeros((n_micro,) + a_shape, x.dtype))
    (_, out), _ = jax.lax.scan(tick, init, jnp.arange(t_total))
    # Only the last stage's shard is nonzero: psum == broadcast.
    mask = (my == s - 1).astype(out.dtype)
    return jax.lax.psum(out * mask, axis_name)


def pipeline_repeated(stage_fn: Callable, mesh: Mesh, n_micro: int,
                      axis_name: str = "pp", remat: bool = True,
                      ) -> Callable:
    """Pipeline a repeated block: ``stage_fn(params, a) -> a`` applied
    ``S = mesh['pp']`` times with per-stage params.

    Returns ``run(stacked_params, x)`` where ``stacked_params`` leaves
    have a leading stage axis ``S`` (see :func:`stack_stage_params`)
    and ``x`` is ``(n_micro, *a)``; result is the ``(n_micro, *a)``
    output of the S-stage composition, replicated. Differentiable in
    both arguments; param grads come back pp-sharded like the params.
    """
    s = mesh.shape[axis_name]
    from jax import shard_map

    body = functools.partial(_gpipe_local_repeated, stage_fn, remat,
                             n_micro, axis_name)
    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(P(axis_name), P()),
        out_specs=P(),
        check_vma=False,
    )

    def run(stacked_params, x):
        for path, leaf in jax.tree_util.tree_flatten_with_path(
                stacked_params)[0]:
            # A divisible-but-wrong stage count would SILENTLY compute
            # with every (shape[0]//s)-th stage (each device's local
            # slice is taken at index 0) — fail loudly instead.
            if leaf.shape[0] != s:
                raise ValueError(
                    f"pipeline_repeated: stacked param "
                    f"{jax.tree_util.keystr(path)} has stage axis "
                    f"{leaf.shape[0]} but the '{axis_name}' mesh axis "
                    f"is {s}")
        return sharded(stacked_params, x)

    return run


# ---------------------------------------------------------------------------
# Heterogeneous pipeline: arbitrary per-stage shapes via padded buffers.
# ---------------------------------------------------------------------------


def _boundary_shapes(stage_fns, params_all, x_shape, dtype):
    """Activation shape at each stage boundary (input = boundary 0).

    Abstract evaluation only — works under trace (params may be
    tracers; ``eval_shape`` never touches their values).
    """
    shapes = [tuple(x_shape)]
    cur = jax.ShapeDtypeStruct(tuple(x_shape), dtype)
    for f, p in zip(stage_fns, params_all):
        cur = jax.eval_shape(f, p, cur)
        assert cur.dtype == dtype, (
            "pipeline_stages: all boundary activations must share one "
            f"dtype, got {cur.dtype} vs {dtype}")
        shapes.append(tuple(cur.shape))
    return shapes


def _gpipe_local_stages(stage_fns, shapes, width, remat, n_micro,
                        axis_name, params_all, x):
    s = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % s) for i in range(s)]
    t_total = n_micro + s - 1
    dtype = x.dtype

    def pad_flat(a):
        flat = a.reshape(-1)
        return jnp.pad(flat, (0, width - flat.shape[0]))

    def wrapped(i):
        f = jax.checkpoint(stage_fns[i]) if remat else stage_fns[i]

        def g(buf):
            a = buf[: int(np.prod(shapes[i]))].reshape(shapes[i])
            return pad_flat(f(params_all[i], a))

        return g

    branches = [wrapped(i) for i in range(len(stage_fns))]

    def tick(carry, t):
        cur, out = carry
        inj = pad_flat(x[jnp.clip(t, 0, n_micro - 1)])
        cur = jnp.where(my == 0, inj, cur)
        y = jax.lax.switch(my, branches, cur)
        m_out = jnp.clip(t - (s - 1), 0, n_micro - 1)
        valid = (my == s - 1) & (t >= s - 1)
        upd = jnp.where(valid, y, out[m_out])
        out = jax.lax.dynamic_update_index_in_dim(out, upd, m_out, 0)
        cur = jax.lax.ppermute(y, axis_name, perm)
        return (cur, out), None

    init = (jnp.zeros((width,), dtype),
            jnp.zeros((n_micro, width), dtype))
    (_, out), _ = jax.lax.scan(tick, init, jnp.arange(t_total))
    mask = (my == s - 1).astype(out.dtype)
    return jax.lax.psum(out * mask, axis_name)


def pipeline_stages(stage_fns: List[Callable], mesh: Mesh,
                    axis_name: str = "pp", remat: bool = True,
                    ) -> Callable:
    """Pipeline arbitrary stages ``f_i(params_i, a_i) -> a_{i+1}``
    (boundary shapes may differ per stage).

    ``len(stage_fns)`` must equal the mesh's pp size. Returns
    ``run(params_all, x)`` with ``params_all`` a tuple of per-stage
    pytrees (replicated — heterogeneous trees can't be stacked onto a
    pp-sharded axis; the homogeneous path does that) and ``x`` of shape
    ``(n_micro, *in_shape)``; the result is the ``(n_micro, *out)``
    composition output, replicated and differentiable in both
    arguments.

    SPMD cost note: boundary buffers are zero-padded to the widest
    boundary, so ICI traffic per hop is ``max_i prod(shapes[i])``
    elements regardless of the true boundary size — see module
    docstring for when that is and isn't acceptable.
    """
    s = mesh.shape[axis_name]
    assert len(stage_fns) == s, (len(stage_fns), s)
    from jax import shard_map

    def run(params_all, x):
        n_micro = x.shape[0]
        shapes = _boundary_shapes(stage_fns, params_all, x.shape[1:],
                                  x.dtype)
        width = max(int(np.prod(sh)) for sh in shapes)
        out_shape = shapes[-1]
        body = functools.partial(
            _gpipe_local_stages, stage_fns, shapes, width, remat,
            n_micro, axis_name)
        out_flat = shard_map(
            body, mesh=mesh, in_specs=(P(), P()), out_specs=P(),
            check_vma=False,
        )(tuple(params_all), x)
        n_out = int(np.prod(out_shape))
        return out_flat[:, :n_out].reshape((n_micro,) + out_shape)

    return run
