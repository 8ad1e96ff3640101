"""Serialized serving artifacts via ``jax.export`` (StableHLO).

Deployment rarely wants Python model code, flax trees, and checkpoint
loading on the serving host. This module freezes a trained
:class:`fpsg_tpu.serve.Generator` into self-contained StableHLO
artifacts — weights baked in as constants — that any JAX process (or an
XLA runtime speaking the jax.export calling convention) can execute
without importing ``fpsg_tpu.models`` or reading a checkpoint:

    export_generator(gen, "artifacts/", img_size=224)      # train side
    g = ExportedGenerator("artifacts/")                    # serving side
    proto = g.prototype(support_clouds)                    # once per class
    clouds = g.generate(images_u8, proto, seed=0)          # hot path

Two functions are exported (mirroring the live Generator's split):

- ``prototype.jaxexport`` — (S, N, 3) support clouds → (F,) class
  prototype. Fixed S (the support-set size is a deployment constant).
- ``generate.jaxexport`` — (b, H, W, 3) uint8 images + (F,) proto +
  uint32[b, 2] PER-ITEM key data → (b, num_points, 3) f32 clouds, with
  ``b`` SYMBOLIC (one artifact serves every batch size; jax.export
  shape polymorphism). Per-item keys make row i a pure function of
  (image i, proto, key i), so dynamic batching (serve_http.py) cannot
  change what any single request gets.

The reference has nothing comparable (its eval path re-instantiates the
torch model from source + ``.pt`` every time); this is the TPU-idiomatic
production packaging: ahead-of-time lowered, platform-tagged
(``platforms=["tpu"]`` by default), and checked at call time by the
jax.export runtime.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

_MANIFEST = "manifest.json"
_GEN_FILE = "generate.jaxexport"
_PROTO_FILE = "prototype.jaxexport"


def export_generator(
    gen,
    out_dir: str,
    *,
    img_size: int,
    n_support: int = 1,
    n_points_per_cloud: int = 2048,
    platforms: Optional[Sequence[str]] = None,
    batch: Optional[int] = None,
    int8: bool = False,
) -> dict:
    """Serialize ``gen``'s serving functions to ``out_dir``.

    Args:
      gen: a live :class:`fpsg_tpu.serve.Generator` (weights are baked
        into the artifacts as constants).
      img_size: H (= W) of the query images the artifact accepts.
      n_support: support-set size S accepted by the prototype artifact.
      n_points_per_cloud: N of the support clouds.
      platforms: lowering targets (default: the current backend). Pass
        ``["tpu"]`` (or several, e.g. ``["tpu", "cpu"]``) to pin.
      batch: export a FIXED query batch size instead of a symbolic one
        (fallback for models whose lowering rejects symbolic shapes).
      int8: bake the int8-quantized VGG image encoder into the generate
        artifact (fpsg_tpu/serve_quant.py — BN-folded per-channel int8
        weights as constants, dynamic per-tensor activation quant in the
        graph). Prototype/decoder stay full precision. Requires the
        vgg_16 backbone.

    Returns the manifest dict (also written to ``out_dir/manifest.json``).
    """
    from jax import export as jexport

    os.makedirs(out_dir, exist_ok=True)
    plats = list(platforms) if platforms else [jax.default_backend()]

    variables = gen.variables
    # Export the PORTABLE XLA decoder path: Pallas kernels cannot lower
    # symbolic-batch block shapes (and tie the artifact to one Mosaic
    # runtime). Same param tree, equivalence-tested vs the fused path
    # (tests/test_fused_decoder.py), and serving is transport-bound
    # anyway (BASELINE.md round 3i).
    model = gen.model
    if getattr(model, "decoder_fused", None) is not None:
        model = model.clone(decoder_fused="off")

    qlayers = None
    if int8:
        from fpsg_tpu.serve_quant import quantize_vgg

        try:
            qlayers = quantize_vgg(
                variables["params"]["img_encoder"]["encoder"],
                variables["batch_stats"]["img_encoder"]["encoder"])
        except KeyError as e:
            raise ValueError(
                "int8 export requires the vgg_16 image backbone "
                f"(missing {e} in the checkpoint tree)") from e

    def generate(xq, proto, key_data):
        # PER-ITEM keys (key_data is (b, 2) uint32): output row i is a
        # pure function of (xq[i], proto, key_data[i]) — the template
        # draw is keyed per item (models/protonet.py:
        # per_item_template_points), so a dynamic batcher coalescing
        # requests (serve_http.py) cannot change what any request gets.
        from fpsg_tpu.data.corpus import normalize_images
        from fpsg_tpu.models.protonet import per_item_template_points

        keys = jax.vmap(jax.random.wrap_key_data)(key_data)
        tp = per_item_template_points(model, keys)
        if qlayers is not None:
            from fpsg_tpu.serve_quant import quant_vgg_forward

            img_z = quant_vgg_forward(qlayers, normalize_images(xq))
            return model.apply(
                variables, img_z, proto, tp,
                method=model.decode_from_embedding,
            )
        return model.apply(
            variables, normalize_images(xq), proto, tp,
            method=model.generate_from_proto,
        )

    def prototype(pcs):
        return model.apply(variables, pcs, method=model.encode_prototype)

    if batch is None:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = int(batch)
    xq_spec = jax.ShapeDtypeStruct((b, img_size, img_size, 3), jnp.uint8)
    proto_shape = jax.eval_shape(
        prototype,
        jax.ShapeDtypeStruct(
            (n_support, n_points_per_cloud, 3), jnp.float32),
    )
    key_spec = jax.ShapeDtypeStruct((b, 2), jnp.uint32)

    exp_gen = jexport.export(jax.jit(generate), platforms=plats)(
        xq_spec, proto_shape, key_spec)
    exp_proto = jexport.export(jax.jit(prototype), platforms=plats)(
        jax.ShapeDtypeStruct(
            (n_support, n_points_per_cloud, 3), jnp.float32))

    with open(os.path.join(out_dir, _GEN_FILE), "wb") as f:
        f.write(exp_gen.serialize())
    with open(os.path.join(out_dir, _PROTO_FILE), "wb") as f:
        f.write(exp_proto.serialize())
    manifest = {
        "img_size": img_size,
        "n_support": n_support,
        "n_points_per_cloud": n_points_per_cloud,
        "proto_dim": list(proto_shape.shape),
        "out_points": int(exp_gen.out_avals[0].shape[1]),
        "platforms": plats,
        "batch": "symbolic" if batch is None else int(batch),
        "int8_encoder": bool(int8),
        "keying": "per_item",  # key_data is (b, 2): one key per image
        "jax_version": jax.__version__,
    }
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


class ExportedGenerator:
    """Run exported artifacts — no model code, no checkpoint loads.

    The call convention mirrors :class:`fpsg_tpu.serve.Generator`, with
    the rng made explicit (deployment owns its seeds):

        g = ExportedGenerator(path)
        proto = g.prototype(support_clouds)       # (F,) device array
        clouds = g.generate(images_u8, proto, seed=17)
    """

    def __init__(self, path: str):
        from jax import export as jexport

        with open(os.path.join(path, _MANIFEST)) as f:
            self.manifest = json.load(f)
        with open(os.path.join(path, _GEN_FILE), "rb") as f:
            self._gen = jexport.deserialize(bytearray(f.read()))
        with open(os.path.join(path, _PROTO_FILE), "rb") as f:
            self._proto = jexport.deserialize(bytearray(f.read()))
        # Exported.call TRACES on every invocation; jit it so repeated
        # same-shape serving calls reuse one compiled executable (the
        # same one-compile contract as the live Generator). A symbolic-
        # batch artifact compiles once per distinct batch size.
        self._gen_call = jax.jit(self._gen.call)
        self._proto_call = jax.jit(self._proto.call)

    def prototype(self, support_clouds) -> jax.Array:
        return self._proto_call(
            jnp.asarray(support_clouds, jnp.float32))

    def generate(self, images, proto, *, seed: int = 0,
                 key=None, keys=None) -> np.ndarray:
        """images: (b, H, W, 3) uint8 (or a single (H, W, 3) image).

        Randomness (most to least explicit): ``keys`` = one PRNG key per
        image — (b,) typed keys or (b, 2) uint32 key data — row i is a
        pure function of (image i, proto, keys[i]); ``key`` = a single
        typed key, split into b per-item keys; ``seed`` = PRNGKey(seed)
        then split. Same keys ⇒ same rows, however requests were
        batched (the artifact is keyed per item)."""
        images = np.asarray(images)
        if images.ndim == 3:
            images = images[None]
        b = images.shape[0]
        if keys is not None:
            keys = jnp.asarray(keys)
            if jnp.issubdtype(keys.dtype, jax.dtypes.prng_key):
                keys = jax.random.key_data(keys)
            key_data = keys.astype(jnp.uint32)
            if key_data.shape != (b, 2):
                raise ValueError(
                    f"keys must be (b={b}, 2) key data or (b,) typed "
                    f"keys; got {key_data.shape}")
        else:
            if key is None:
                key = jax.random.PRNGKey(seed)
            key_data = jax.random.key_data(
                jax.random.split(key, b)).astype(jnp.uint32)
        out = self._gen_call(
            jnp.asarray(images, jnp.uint8), proto, key_data)
        return np.asarray(out)
