"""Inference/serving API: single-image point-cloud generation.

The reference has no standalone inference entry point (generation is buried
in the eval/visualization paths); production deployment needs one. This
module builds a jitted generator around a trained checkpoint:

    gen = Generator.from_checkpoint(conf, ckpt_path)
    cloud = gen(image_u8, support_clouds)      # (2048, 3)

Shapes are static per (n_support, image size), so repeated calls reuse one
compiled executable; batching over query images is a leading axis.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fpsg_tpu.config import FPSGConfig
from fpsg_tpu.io.checkpoints import restore_checkpoint
from fpsg_tpu.train.loop import build_model, make_state
from fpsg_tpu.train.optim import make_optimizer


class Generator:
    """Jitted few-shot generator: (query images, support clouds) → clouds."""

    def __init__(self, model, variables, seed: int = 0,
                 transient_retries: int = 2):
        self.model = model
        self.variables = variables
        self._key = jax.random.PRNGKey(seed)
        # Generation is read-only (nothing donated), so transient backend
        # failures are retried in place (train/retry.py); the key for a
        # call is fixed before dispatch, so a retried call is identical.
        self._retries = transient_retries

        def _norm(xq):
            # uint8 images normalize ON DEVICE: the host link carries 1
            # byte/pixel instead of 4 (the tunnel/PCIe transfer dominates
            # serving latency — benchmarks/serve_bench.py). One shared
            # definition with training (data/corpus.py) so the transform
            # cannot drift between the two.
            if jnp.issubdtype(xq.dtype, jnp.integer):
                from fpsg_tpu.data.corpus import normalize_images

                xq = normalize_images(xq)
            return xq

        def _generate(variables, xq, pcs, key):
            sample = {"xq": _norm(xq), "pcs": pcs}
            return model.apply(
                variables, sample, method=model.generate,
                rngs={"template": key},
            )

        def _proto(variables, pcs):
            return model.apply(
                variables, pcs, method=model.encode_prototype)

        def _from_proto_keyed(variables, xq, proto, keys):
            # Per-item template draws (models/protonet.py:
            # per_item_template_points): row i of the output is a pure
            # function of keys[i] — independent of batch size and of the
            # other rows. This is the path dynamic batching
            # (serve_http.py) relies on being coalescing-invariant.
            from fpsg_tpu.models.protonet import per_item_template_points

            tp = per_item_template_points(model, keys)
            return model.apply(
                variables, _norm(xq), proto, tp,
                method=model.generate_from_proto,
            )

        def _from_proto(variables, xq, proto, key):
            return model.apply(
                variables, _norm(xq), proto,
                method=model.generate_from_proto,
                rngs={"template": key},
            )

        self._fn = jax.jit(_generate)
        self._proto_fn = jax.jit(_proto)
        self._from_proto_fn = jax.jit(_from_proto)
        self._from_proto_keyed_fn = jax.jit(_from_proto_keyed)

    @classmethod
    def from_checkpoint(
        cls,
        conf: FPSGConfig,
        checkpoint: Optional[str] = None,
        img_size: int = 224,
    ) -> "Generator":
        model = build_model(conf)
        state = make_state(model, conf, make_optimizer(), img_size=img_size)
        if checkpoint:
            state = restore_checkpoint(checkpoint, state)
        return cls(
            model,
            {"params": state.params, "batch_stats": state.batch_stats},
            seed=conf.seed,
            transient_retries=getattr(conf, "transient_retries", 2),
        )

    def stream(self, images_iter, *, proto, buffer: int = 2):
        """Pipelined throughput serving: generate clouds for a stream of
        same-shape image batches, overlapping host→device transfer,
        compute, and device→host readback across batches.

        One-at-a-time ``__call__`` serializes upload → compute →
        download every call, so a transfer-bound link (PCIe, or the
        dev tunnel) idles the chip; here a feeder thread uploads batch
        k+1 while batch k computes and batch k-1 reads back (the same
        double-buffering as the training host pipeline,
        `data/host_pipeline.py`). Yields one ``(Q, num_points, 3)``
        float32 array per input batch, in order; results are identical
        to per-call ``__call__(images, proto=proto)`` with the same
        seed (the RNG advances once per batch either way).

        Args:
          images_iter: iterable of (Q, H, W, 3) uint8/float batches —
            same shape throughout (one compiled executable).
          proto: class prototype from :meth:`prototype` (required: the
            hot path serves a fixed support set).
          buffer: feeder queue depth (in-flight uploads).
        """
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=max(1, buffer))
        cancel = threading.Event()

        def feeder():
            # Always terminate the queue — with the upstream exception if
            # the iterator (or conversion) raises, else a clean stop —
            # so the consumer can never block forever on q.get(). On
            # consumer cancellation (early break / close), bounded puts
            # keep this thread from leaking on a full queue.
            def put(item):
                while not cancel.is_set():
                    try:
                        q.put(item, timeout=1.0)
                        return True
                    except queue.Full:
                        continue
                return False

            try:
                for images in images_iter:
                    images = np.asarray(images)
                    if images.ndim == 3:
                        images = images[None]
                    if np.issubdtype(images.dtype, np.integer):
                        images = images.astype(np.uint8)
                    xq = jnp.asarray(
                        images,
                        images.dtype if images.dtype == np.uint8
                        else np.float32)
                    if not put(("item", xq)):
                        return
            except BaseException as e:  # noqa: BLE001 — re-raised below
                put(("raise", e))
                return
            put(("stop", None))

        threading.Thread(target=feeder, daemon=True).start()
        pending = None
        try:
            while True:
                kind, payload = q.get()
                if kind == "stop":
                    break
                if kind == "raise":
                    raise payload
                self._key, sub = jax.random.split(self._key)
                out = self._from_proto_fn(
                    self.variables, payload, proto, sub)
                if pending is not None:
                    yield np.asarray(pending)  # previous batch: D2H
                pending = out                  # while this one computes
            if pending is not None:
                yield np.asarray(pending)
        finally:
            cancel.set()

    def generate_keyed(self, images: np.ndarray, *, proto: jax.Array,
                       keys: jax.Array) -> np.ndarray:
        """Batching-INVARIANT generation: one explicit RNG key per image.

        Output row i is a pure function of ``(images[i], proto, keys[i])``
        — unlike :meth:`__call__`, where the single 'template' key makes
        each row's randomness depend on the batch it shipped in. Dynamic
        batching (serve_http.py) requires this: a request coalesced into
        a batch of 7 must return bits identical to the same request
        served alone.

        Args:
          images: (Q, H, W, 3) uint8 or float in [-1, 1].
          proto: precomputed class prototype from :meth:`prototype` —
            one shared (F,), or a PER-ITEM batch (Q, F) so one dispatch
            can serve requests for different classes (the dynamic
            batcher in serve_http.py coalesces across classes).
          keys: (Q,) typed PRNG key array, or (Q, 2) uint32 key data.

        Returns:
          (Q, num_points, 3) float32.
        """
        images = np.asarray(images)
        if images.ndim == 3:
            images = images[None]
        if np.issubdtype(images.dtype, np.integer):
            images = images.astype(np.uint8)
        xq = jnp.asarray(
            images,
            images.dtype if images.dtype == np.uint8 else np.float32)
        keys = jnp.asarray(keys)
        if not jnp.issubdtype(keys.dtype, jax.dtypes.prng_key):
            keys = jax.vmap(jax.random.wrap_key_data)(
                keys.astype(jnp.uint32))
        if keys.shape[0] != xq.shape[0]:
            raise ValueError(
                f"{keys.shape[0]} keys for {xq.shape[0]} images")
        from fpsg_tpu.train.retry import retry_readonly

        def compute():
            out = self._from_proto_keyed_fn(
                self.variables, xq, proto, keys)
            return np.asarray(out)

        return retry_readonly(compute, retries=self._retries)

    def prototype(self, support_clouds: np.ndarray) -> jax.Array:
        """Encode a class support set ``(S, N, 3)`` into its prototype.

        Deployment serves a FIXED per-class support set against a stream
        of query images; computing the prototype once and passing it to
        ``__call__(images, proto=...)`` removes the per-call PointNet
        encode (the support set is typically 32 x 2048 points — far more
        input work than the query images at small Q). The returned
        device array is reusable across calls and processes (it's just
        an ``(F,)`` embedding)."""
        from fpsg_tpu.train.retry import retry_readonly

        def compute():
            out = self._proto_fn(
                self.variables, jnp.asarray(support_clouds, jnp.float32))
            # one-element device read: the only reliable error/sync point
            # on axon (block_until_ready does not drain — CLAUDE.md);
            # prototype() is one-time per class, so the extra RTT is free
            jax.device_get(out.ravel()[0])
            return out

        return retry_readonly(compute, retries=self._retries)

    def __call__(
        self,
        images: np.ndarray,
        support_clouds: Optional[np.ndarray] = None,
        *,
        proto: Optional[jax.Array] = None,
    ) -> np.ndarray:
        """Generate clouds for query images given a class support set.

        Args:
          images: (Q, H, W, 3) uint8 or float in [-1, 1].
          support_clouds: (S, N, 3) float32 unit-ball clouds.
          proto: precomputed class prototype from :meth:`prototype`
            (pass INSTEAD of ``support_clouds`` on the hot path).

        Returns:
          (Q, num_points, 3) float32.
        """
        if (support_clouds is None) == (proto is None):
            raise ValueError(
                "pass exactly one of support_clouds or proto")
        images = np.asarray(images)
        if images.ndim == 3:
            images = images[None]
        if np.issubdtype(images.dtype, np.integer):
            # ANY integer dtype means raw pixel bytes (int32/int64 are
            # common out of image-decode code) — narrow to uint8 so the
            # device-side normalize applies; without this, 0-255 values
            # would reach the model as if already in [-1, 1].
            images = images.astype(np.uint8)
        self._key, sub = jax.random.split(self._key)
        # uint8 ships as uint8 (normalized on device — see _norm above);
        # float input is assumed already in [-1, 1].
        xq = jnp.asarray(
            images,
            images.dtype if images.dtype == np.uint8 else np.float32)
        from fpsg_tpu.train.retry import retry_readonly

        def compute():
            if proto is not None:
                out = self._from_proto_fn(self.variables, xq, proto, sub)
            else:
                out = self._fn(
                    self.variables, xq,
                    jnp.asarray(support_clouds, jnp.float32), sub,
                )
            return np.asarray(out)  # D2H read surfaces deferred errors

        return retry_readonly(compute, retries=self._retries)
