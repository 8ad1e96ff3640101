"""Shared bits of the loop-level transient-failure resume.

An axon tunnel flake poisons BOTH the donated input state and the step's
output (CLAUDE.md platform quirks), so the training drivers recover by
replaying from a host-side snapshot of (state, rng keys) — see
``train/loop.py`` and ``train/pretrain.py``. This module holds the one
knob they share.
"""

from __future__ import annotations

import jax

# Cool-down before a replay: flake bursts last a few seconds after a
# tunnel hiccup; off-TPU there is no tunnel to wait out, so tests replay
# immediately.
RETRY_COOLDOWN_S = 15.0


def transient_cooldown(seconds: float = None) -> None:
    if jax.default_backend() == "tpu":
        import time

        time.sleep(RETRY_COOLDOWN_S if seconds is None else seconds)


def is_transient_backend_error(exc: BaseException) -> bool:
    """True iff ``exc`` matches the OBSERVED axon-flake signature — a bare
    ``INVALID_ARGUMENT: TPU backend error`` (CLAUDE.md platform quirks;
    BENCH_r04 failure record). Deliberately requires BOTH substrings:
    deterministic XLA INVALID_ARGUMENT errors (genuinely bad shapes or
    dtypes) must fail fast instead of burning retry budgets. All
    per-transfer retry sites (``data/corpus.py:put``, ``bench.py:sync``)
    share this one predicate so they cannot drift.
    """
    s = str(exc)
    return "INVALID_ARGUMENT" in s and "TPU backend error" in s


def is_deterministic_error(exc: BaseException) -> bool:
    """True for errors a replay can NEVER fix, so the loops fail fast
    instead of burning replay attempts. Deliberately narrow: flax
    module/param errors are structural (e.g. a mis-grafted checkpoint).
    ValueError is NOT here — the axon layout-poison transient surfaces
    as one (CLAUDE.md platform quirks)."""
    try:
        from flax.errors import FlaxError
    except ImportError:  # pragma: no cover - flax always present
        return False
    return isinstance(exc, FlaxError)


def retry_readonly(fn, retries: int = 2, cooldown_s: float = None):
    """Run ``fn()`` with bounded retry + cooldown.

    ONLY for read-only dispatches (eval/serving: nothing donated, no state
    mutated) — re-running such a dispatch is free of side effects, and the
    rng keys it uses are closed over, so a retried call is bit-identical.
    Covers the transient-burst case where device buffers survive; a truly
    dead backend exhausts the budget and re-raises the last error.

    ``cooldown_s`` overrides the default ``RETRY_COOLDOWN_S`` — latency-
    sensitive callers (the serving batcher, where one sleeping thread
    stalls every coalesced HTTP client) pass a short value.
    """
    last = None
    for attempt in range(max(0, retries) + 1):
        try:
            return fn()
        except KeyboardInterrupt:
            raise
        except Exception as exc:  # noqa: BLE001 — backend transients
            if is_deterministic_error(exc):
                raise
            last = exc
            if attempt < retries:
                transient_cooldown(cooldown_s)
    raise last
