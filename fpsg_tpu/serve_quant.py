"""int8-quantized serving path for the VGG image encoder.

Serving is eval-mode and VGG-dominated (the query encode is ~90% of the
generate FLOPs; BASELINE.md round-3i), and the v5e MXU runs s8 x s8 ->
s32 at 2x its bf16 peak. The decision probe (benchmarks/
int8_probe_device.py, on-chip fori_loop rates) measured XLA lowering
int8 convs onto that path at 1.33-1.72x the bf16 rate for every large
VGG conv site. MEASURED END-TO-END, however (BASELINE.md round-3k),
the full int8 encoder is bf16-parity at b8 and 0.86x at b32 on this
toolchain: the per-layer dynamic-quant machinery (a full-tensor
abs-max reduction + requant write per layer, over f32 intermediates)
costs the conv gains back. The opt-in remains for deployment reasons
the local chip cannot see — 4x smaller baked encoder weights in the
exported artifacts, and serving stacks with calibration data can swap
the dynamic scales for static ones (removing the reduction pass
entirely, the knob that would make the conv-level win reachable).

Scheme (standard TPU-friendly post-training quantization):

- Eval-mode BN folding first: conv -> BN-affine(+relu) collapses into
  one conv with W'[..., c] = W[..., c] * k_c and a bias
  b'_c = k_c * (conv_bias_c - running_mean_c) + beta_c, where
  k_c = gamma_c * rsqrt(running_var_c + eps). Exact — same math the
  eval path computes, reassociated.
- Weights: symmetric PER-OUTPUT-CHANNEL int8 (scale = max|W'|/127 per
  channel). Per-channel weight scales cost nothing on the MXU (the
  dequant is a per-channel multiply fused into the conv epilogue) and
  carry most of the accuracy.
- Activations: symmetric PER-TENSOR DYNAMIC int8 — the scale is
  max|x|/127 computed on device each call (one reduction XLA fuses
  into the producing op). No calibration set is needed (the image has
  none to offer), and dynamic scales adapt to any input distribution.
- The conv itself: ``lax.conv_general_dilated(int8, int8,
  preferred_element_type=int32)`` — the MXU int8 path; dequantize with
  sx * sw_c, add b', relu, requantize.
- Maxpools run ON the int8 representation (monotone per-tensor scaling
  commutes with max): 4x less pool traffic than f32.

The decoder and the PointNet prototype encoder stay in f32/bf16 — they
are a small slice of serving compute, and the prototype is computed
once per class.

Only the generator's image branch changes; everything downstream reuses
``ImgPCProtoNet.decode_from_embedding``, so the quantized generator is
a drop-in for ``serve.Generator`` in the HTTP batcher (same
``generate_keyed`` / ``prototype`` surface).

Accuracy is bounded in tests/test_serve_quant.py (embedding and
output-cloud drift vs the f32 path) and is NOT claimed beyond that:
there are no pretrained weights or real datasets in this environment,
so task-level accuracy under quantization must be validated on real
checkpoints at deployment (MIGRATION.md).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fpsg_tpu.nn.vgg import VGG16_CFG

__all__ = ["quantize_vgg", "quant_vgg_forward", "calibrate_act_scales",
           "QuantizedGenerator"]

_EPS = 1e-5  # nn.normalization.BatchNorm.epsilon


def quantize_vgg(enc_params, enc_stats, *, eps: float = _EPS):
    """Fold eval-mode BN into each conv and quantize to int8.

    Args:
      enc_params: the VGG16BN param subtree
        (``variables["params"]["img_encoder"]["encoder"]``) —
        ``features_<i>``: conv {kernel, bias} / BN {scale, bias}.
      enc_stats: matching ``batch_stats`` subtree — BN {mean, var}.

    Returns:
      list of per-conv dicts {"wq": (3,3,Ci,Co) int8, "sw": (Co,) f32,
      "b": (Co,) f32} in feature order (pools are implicit in
      VGG16_CFG) — a valid jit pytree.
    """
    layers = []
    idx = 0
    for v in VGG16_CFG:
        if v == "M":
            idx += 1
            continue
        conv = enc_params[f"features_{idx}"]
        bn_p = enc_params[f"features_{idx + 1}"]
        bn_s = enc_stats[f"features_{idx + 1}"]
        w = np.asarray(conv["kernel"], np.float32)      # (3, 3, Ci, Co)
        cb = np.asarray(conv["bias"], np.float32)
        gamma = np.asarray(bn_p["scale"], np.float32)
        beta = np.asarray(bn_p["bias"], np.float32)
        mean = np.asarray(bn_s["mean"], np.float32)
        var = np.asarray(bn_s["var"], np.float32)
        k = gamma / np.sqrt(var + eps)
        w_f = w * k                                      # fold BN scale
        b_f = k * (cb - mean) + beta                     # fold shift
        sw = np.maximum(np.abs(w_f).max(axis=(0, 1, 2)), 1e-12) / 127.0
        wq = np.clip(np.rint(w_f / sw), -127, 127).astype(np.int8)
        layers.append({
            "wq": jnp.asarray(wq),
            "sw": jnp.asarray(sw.astype(np.float32)),
            "b": jnp.asarray(b_f.astype(np.float32)),
        })
        idx += 3  # conv, bn, relu
    return layers


def _dyn_quant(x: jax.Array):
    """Per-tensor symmetric dynamic int8: (values, scale)."""
    sx = jnp.maximum(jnp.max(jnp.abs(x)), 1e-12) / 127.0
    return jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8), sx


def _static_quant(x: jax.Array, sx: jax.Array):
    """Per-tensor symmetric int8 with a FIXED scale (no reduction —
    XLA fuses this straight into the producing conv's epilogue)."""
    return jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)


def _pool2x2_int8(xq: jax.Array) -> jax.Array:
    b, h, w, c = xq.shape
    return jnp.max(xq.reshape(b, h // 2, 2, w // 2, 2, c), axis=(2, 4))


def quant_vgg_forward(qlayers, x: jax.Array, act_scales=None,
                      return_scales: bool = False):
    """int8 VGG16-bn features: (B, H, W, 3) float in [-1, 1] -> (B, 512)
    f32 embedding (H, W powers of two >= 32, as in the f32 path).

    Args:
      act_scales: optional (14,) f32 — STATIC per-tensor activation
        scales (entry 0 for the input image, entry i+1 for conv i's
        output), from :func:`calibrate_act_scales`. With scales fixed,
        every requantize is pure elementwise and XLA fuses the whole
        dequant+bias+relu+requant chain into the conv epilogue — the
        dynamic mode's per-layer abs-max reduction (an extra HBM pass
        over f32 activations) disappears, which is what let int8 lose
        its per-conv 1.33-1.72x advantage end-to-end (BASELINE.md
        round-3k).
      return_scales: also return the (14,) per-tensor scales this call
        used (dynamic mode: computed; static mode: echoed) — the
        calibration capture surface.
    """
    x = x.astype(jnp.float32)
    static = act_scales is not None
    if static:
        xq = _static_quant(x, act_scales[0])
        sx = act_scales[0]
    else:
        xq, sx = _dyn_quant(x)
    scales = [sx]
    li = 0
    for v in VGG16_CFG:
        if v == "M":
            xq = _pool2x2_int8(xq)
            continue
        layer = qlayers[li]
        li += 1
        y = jax.lax.conv_general_dilated(
            xq, layer["wq"], (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * (sx * layer["sw"])
        y = jnp.maximum(y + layer["b"], 0.0)
        if static:
            sx = act_scales[li]
            xq = _static_quant(y, sx)
        else:
            xq, sx = _dyn_quant(y)
        scales.append(sx)
    # AdaptiveAvgPool2d((1,1)): global mean, dequantized
    out = jnp.mean(xq.astype(jnp.float32), axis=(1, 2)) * sx
    if return_scales:
        return out, jnp.stack(scales)
    return out


def calibrate_act_scales(qlayers, images_batches) -> jax.Array:
    """Static PTQ calibration: run the DYNAMIC int8 path over
    calibration batches and keep the elementwise MAX of the per-tensor
    scales it computes (max |activation|/127 — the scale self-consistent
    with the int8 path the static mode then freezes).

    Args:
      qlayers: from :func:`quantize_vgg`.
      images_batches: iterable of (B, H, W, 3) float arrays in [-1, 1]
        (pre-normalized, as `quant_vgg_forward` expects).

    Returns:
      (14,) f32 scales for `quant_vgg_forward(act_scales=...)`.
    """
    fn = jax.jit(lambda q, x: quant_vgg_forward(
        q, x, return_scales=True)[1])
    out = None
    for x in images_batches:
        s = fn(qlayers, jnp.asarray(x))
        out = s if out is None else jnp.maximum(out, s)
    if out is None:
        raise ValueError("calibration needs at least one batch")
    return out


class QuantizedGenerator:
    """Drop-in serving generator with the int8 image encoder.

    Same hot-path surface as ``serve.Generator`` (``generate_keyed``,
    ``prototype``), so it slots straight into the dynamic batcher:

        gen = Generator.from_checkpoint(conf, ckpt)
        qgen = QuantizedGenerator(gen)
        engine = BatchingEngine(qgen, ...)

    The prototype path (PointNet, once per class) and the decoder stay
    unquantized; only the per-request VGG query encode runs int8.
    """

    def __init__(self, gen):
        self.model = gen.model
        self.variables = gen.variables
        self._base = gen
        self._retries = gen._retries
        try:
            enc_p = self.variables["params"]["img_encoder"]["encoder"]
            enc_s = self.variables["batch_stats"]["img_encoder"]["encoder"]
            enc_p["features_0"]["kernel"]
        except KeyError as e:
            raise ValueError(
                "QuantizedGenerator requires the vgg_16 image backbone "
                f"(missing {e} in the checkpoint tree)") from e
        self.qlayers = quantize_vgg(enc_p, enc_s)
        self.act_scales = None          # dynamic quant until calibrated
        model = self.model

        def _keyed(qlayers, variables, xq, proto, keys, act_scales):
            if jnp.issubdtype(xq.dtype, jnp.integer):
                from fpsg_tpu.data.corpus import normalize_images

                xq = normalize_images(xq)
            img_z = quant_vgg_forward(qlayers, xq, act_scales)
            from fpsg_tpu.models.protonet import per_item_template_points

            tp = per_item_template_points(model, keys)
            return model.apply(
                variables, img_z, proto, tp,
                method=model.decode_from_embedding)

        self._keyed_fn = jax.jit(_keyed)
        self._embed_fn = jax.jit(
            lambda qlayers, xq, act_scales: quant_vgg_forward(
                qlayers, xq, act_scales))

    def calibrate(self, images, batch: int = 8) -> jax.Array:
        """Freeze STATIC activation scales from calibration images
        (uint8 or [-1, 1] float, (N, H, W, 3)); subsequent calls use
        the fused static-quant path (no per-layer reductions). Returns
        the (14,) scales. Deployment should calibrate on real data;
        drift vs the dynamic path is bounded in tests on the same
        distribution."""
        images = np.asarray(images)
        if np.issubdtype(images.dtype, np.integer):
            from fpsg_tpu.data.corpus import normalize_images

            if images.min() < 0 or images.max() > 255:
                raise ValueError(
                    "integer calibration images must be uint8-range "
                    f"pixels (got min={images.min()}, max={images.max()})"
                    " — wrapping the cast would corrupt the scales")
            images = np.asarray(normalize_images(jnp.asarray(
                images.astype(np.uint8))))
        batches = [images[i:i + batch].astype(np.float32)
                   for i in range(0, len(images), batch)]
        self.act_scales = calibrate_act_scales(self.qlayers, batches)
        return self.act_scales

    def embed(self, images: jax.Array) -> jax.Array:
        """int8 image embedding (test/diagnostic surface): float images
        in [-1, 1] -> (B, 512) f32."""
        return self._embed_fn(self.qlayers, jnp.asarray(images),
                              self.act_scales)

    def prototype(self, support_clouds) -> jax.Array:
        return self._base.prototype(support_clouds)

    def generate_keyed(self, images: np.ndarray, *, proto: jax.Array,
                       keys: jax.Array) -> np.ndarray:
        """See ``serve.Generator.generate_keyed`` — identical contract
        (per-item keys and protos; batching-invariant), int8 encoder."""
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
            out = self._keyed_fn(self.qlayers, self.variables, xq,
                                 jnp.asarray(proto), keys,
                                 self.act_scales)
            return np.asarray(out)

        return retry_readonly(compute, retries=self._retries)
