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

    def __init__(self, model, variables, seed: int = 0):
        self.model = model
        self.variables = variables
        self._key = jax.random.PRNGKey(seed)

        def _generate(variables, xq, pcs, key):
            sample = {"xq": xq, "pcs": pcs}
            return model.apply(
                variables, sample, method=model.generate,
                rngs={"template": key},
            )

        self._fn = jax.jit(_generate)

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
        )

    def __call__(
        self, images: np.ndarray, support_clouds: np.ndarray
    ) -> np.ndarray:
        """Generate clouds for query images given a class support set.

        Args:
          images: (Q, H, W, 3) uint8 or float in [-1, 1].
          support_clouds: (S, N, 3) float32 unit-ball clouds.

        Returns:
          (Q, num_points, 3) float32.
        """
        images = np.asarray(images)
        if images.ndim == 3:
            images = images[None]
        if images.dtype == np.uint8:
            images = images.astype(np.float32) * (2.0 / 255.0) - 1.0
        self._key, sub = jax.random.split(self._key)
        out = self._fn(
            self.variables,
            jnp.asarray(images, jnp.float32),
            jnp.asarray(support_clouds, jnp.float32),
            sub,
        )
        return np.asarray(out)
