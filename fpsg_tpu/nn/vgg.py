"""Image branch: VGG16-bn encoder, TPU-native.

Re-design of ``ImageEncoderWarpper`` (reference ``src/models/image_net.py:
6-39``): torchvision VGG16-bn ``.features`` + AdaptiveAvgPool2d(1,1),
yielding a 512-d image embedding from a 224x224x3 input.

Layout: NHWC (TPU-native conv layout). Convs run in bf16-friendly shapes on
the MXU; BN follows torch semantics (:mod:`fpsg_tpu.nn.normalization`).

ImageNet-pretrained weights: the reference downloads them from torchvision
at runtime (``image_net.py:14``). This framework ships a converter
(:mod:`fpsg_tpu.io.convert`) that ingests a torchvision ``vgg16_bn``
state-dict file when one is provided (``--img_encoder_path``); with no
checkpoint the encoder trains from torch-default random init.

Note reference quirk (SURVEY.md §5.1 item 7): ``_set_finetune`` is never
called, so the whole VGG finetunes. We reproduce that default and make the
freeze actually work when ``finetune_layer >= 0`` is requested (the fixed
behavior is opt-in via the optimizer mask in fpsg_tpu.train).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from fpsg_tpu.nn.activations import relu
from fpsg_tpu.nn.normalization import BatchNorm

# torchvision cfg 'D' (vgg16): conv widths with 'M' maxpools.
VGG16_CFG: Sequence[Union[int, str]] = (
    64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
    512, 512, 512, "M", 512, 512, 512, "M",
)


def _conv_init(key, shape, dtype=jnp.float32):
    """torch Conv2d default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))."""
    fan_in = shape[0] * shape[1] * shape[2]  # kh * kw * in_ch (HWIO)
    bound = (1.0 / fan_in) ** 0.5
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class _ConvFold(nn.Module):
    """3x3 same-padding conv whose bias is returned, NOT applied — it folds
    into the following BatchNorm (see fpsg_tpu.nn.normalization docstring),
    saving one full read+write pass over the activation per layer. Param
    names/shapes/inits are identical to ``nn.Conv`` so checkpoint maps and
    golden tests are unchanged."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array):
        in_ch = x.shape[-1]
        kernel = self.param("kernel", _conv_init,
                            (3, 3, in_ch, self.features))
        bound = (1.0 / (9 * in_ch)) ** 0.5
        bias = self.param(
            "bias",
            lambda key, shape, dtype=jnp.float32: jax.random.uniform(
                key, shape, dtype, -bound, bound),
            (self.features,),
        )
        dt = self.dtype or jnp.promote_types(x.dtype, kernel.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(dt), kernel.astype(dt), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y, bias


def _window_slices(x):
    """The four 2x2-window elements as quarter-size slices, in torch's
    row-major scan order (dh, dw)."""
    b, h, w, c = x.shape
    x6 = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return [x6[:, :, i, :, j, :] for i in (0, 1) for j in (0, 1)]


@jax.custom_vjp
def _maxpool_2x2(x: jax.Array) -> jax.Array:
    """2x2/2 max pool. Identical forward to ``nn.max_pool``; the custom
    backward routes the cotangent by a 2-bit argmax saved at forward time
    (torch's tie rule: FIRST maximal element in row-major window order) —
    one fused pass over g+idx, never re-reading x, vs XLA's slow
    select-and-scatter (2.5 ms/step) or eq-mask recompute (7.5 ms/step,
    both measured on the step trace)."""
    b, h, w, c = x.shape
    return jnp.max(x.reshape(b, h // 2, 2, w // 2, 2, c), axis=(2, 4))


def _maxpool_2x2_fwd(x):
    e = _window_slices(x)
    y = jnp.maximum(jnp.maximum(e[0], e[1]), jnp.maximum(e[2], e[3]))
    idx = jnp.where(
        e[0] == y, jnp.int8(0),
        jnp.where(e[1] == y, jnp.int8(1),
                  jnp.where(e[2] == y, jnp.int8(2), jnp.int8(3))),
    )
    return y, idx


def _maxpool_2x2_bwd(idx, g):
    # One fused elementwise pass: broadcast idx/g onto the windowed 6-d
    # view and compare against the window-position code 2*dh+dw. No
    # concatenates (a quad-stack formulation materializes a concat tree —
    # measured 7 ms/step); the (b,h2,2,w2,2,c)->(b,h,w,c) reshape is
    # contiguity-preserving.
    b, h2, w2, c = idx.shape
    idx6 = idx[:, :, None, :, None, :]
    g6 = g[:, :, None, :, None, :]
    dh = jax.lax.broadcasted_iota(jnp.int8, (1, 1, 2, 1, 1, 1), 2)
    dw = jax.lax.broadcasted_iota(jnp.int8, (1, 1, 1, 1, 2, 1), 4)
    pos = 2 * dh + dw
    gx6 = jnp.where(
        idx6 == pos,
        jnp.broadcast_to(g6, (b, h2, 2, w2, 2, c)),
        jnp.zeros((), g.dtype),
    )
    return (gx6.reshape(b, 2 * h2, 2 * w2, c),)


_maxpool_2x2.defvjp(_maxpool_2x2_fwd, _maxpool_2x2_bwd)


class VGG16BN(nn.Module):
    """VGG16-bn feature extractor: (B, 224, 224, 3) → (B, 512).

    Layer names carry the torchvision ``features.<i>`` index so checkpoint
    conversion is a direct key map.
    """

    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    precise_stats: bool = False  # two-pass BN variance everywhere (exact
                                 # torch-trajectory parity; ~5% slower)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        if self.dtype is not None:
            x = x.astype(self.dtype)
        idx = 0
        for v in VGG16_CFG:
            if v == "M":
                x = _maxpool_2x2(x)
                idx += 1
                continue
            y, b = _ConvFold(int(v), dtype=self.dtype,
                             name=f"features_{idx}")(x)
            x = BatchNorm(axis_name=self.axis_name, dtype=self.dtype,
                          two_pass=self.precise_stats, activation="relu",
                          name=f"features_{idx + 1}")(y, not train, shift=b)
            idx += 3  # conv, bn, relu
        # AdaptiveAvgPool2d((1,1)) == global mean over H, W.
        return jnp.mean(x.astype(jnp.float32), axis=(1, 2))


class TinyImageEncoder(nn.Module):
    """Small conv stub behind the same 512-d interface (for tests/CI and the
    minimum end-to-end slice, SURVEY.md §7)."""

    features: int = 512
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        for i, ch in enumerate((32, 64, 128)):
            x = nn.Conv(ch, (3, 3), strides=(2, 2), name=f"conv{i}")(x)
            x = BatchNorm(axis_name=self.axis_name, name=f"bn{i}")(x, not train)
            x = relu(x)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.features, name="proj")(x)


class ImageEncoder(nn.Module):
    """``ImageEncoderWarpper`` equivalent (image_net.py:6-24): backbone
    selector behind a fixed 512-d interface."""

    backbone: str = "vgg_16"
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    precise_stats: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        if self.backbone == "vgg_16":
            return VGG16BN(axis_name=self.axis_name, dtype=self.dtype,
                           precise_stats=self.precise_stats,
                           name="encoder")(x, train)
        if self.backbone == "tiny":
            return TinyImageEncoder(axis_name=self.axis_name, name="encoder")(
                x, train
            )
        raise NotImplementedError(
            f"Unsupported image encoder backbone: {self.backbone}"
        )
