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


class VGG16BN(nn.Module):
    """VGG16-bn feature extractor: (B, 224, 224, 3) → (B, 512).

    Layer names carry the torchvision ``features.<i>`` index so checkpoint
    conversion is a direct key map.
    """

    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        if self.dtype is not None:
            x = x.astype(self.dtype)
        idx = 0
        for v in VGG16_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                idx += 1
                continue
            fan_in = 9 * x.shape[-1]
            x = nn.Conv(
                int(v),
                (3, 3),
                padding=1,
                dtype=self.dtype,
                kernel_init=_conv_init,
                bias_init=lambda key, shape, dtype=jnp.float32, _f=fan_in: (
                    jax.random.uniform(
                        key, shape, dtype,
                        -(1.0 / _f) ** 0.5, (1.0 / _f) ** 0.5,
                    )
                ),
                name=f"features_{idx}",
            )(x)
            x = BatchNorm(axis_name=self.axis_name, dtype=self.dtype,
                          name=f"features_{idx + 1}")(x, not train)
            x = jax.nn.relu(x)
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
            x = jax.nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.features, name="proj")(x)


class ImageEncoder(nn.Module):
    """``ImageEncoderWarpper`` equivalent (image_net.py:6-24): backbone
    selector behind a fixed 512-d interface."""

    backbone: str = "vgg_16"
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        if self.backbone == "vgg_16":
            return VGG16BN(axis_name=self.axis_name, dtype=self.dtype,
                           name="encoder")(x, train)
        if self.backbone == "tiny":
            return TinyImageEncoder(axis_name=self.axis_name, name="encoder")(
                x, train
            )
        raise NotImplementedError(
            f"Unsupported image encoder backbone: {self.backbone}"
        )
