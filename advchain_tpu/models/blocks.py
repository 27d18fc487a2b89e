"""Extended model blocks — Flax rebuilds of the reference's building-block
zoo (advchain/models/unet_parts.py, custom_layers.py).

Everything operates on NHWC (the TPU conv layout; the UNet family converts
from NCHW at its boundary).  Blocks:

  * down/up variants: ConvDown (:254), ResConvDown (:279), ResConv (:323),
    ResBilinearUp (:367), ResConvUp (:417), SqeUp (:589), DilationConv
    (:200), OutConvRelu (:648)
  * attention / recalibration: SELayer (:469), CSELayer (:487),
    ChannelSELayer (custom_layers.py:10), SpatialSELayer (:41),
    ChannelSpatialSELayer (:68)
  * norms: BatchInstanceNorm (custom_layers.py:246-307, gated BN+IN mix),
    AdaptiveInstanceNorm / AdaptiveBatchNorm (:174-243 — note the
    reference's AdaptiveBatchNorm2d constructor is broken
    (``torch.ones_like(list)``); here it is implemented as documented)
  * misc: bilinear_additive_upsampling (:87), spatial_pyramid_pool (:310),
    UnetConv3 / UnetUp3 (unet_parts.py:702, 667)
  * init_weights: normal / xavier / kaiming initializers
    (init_weight.py:5-66) as Flax kernel initializers.

Spectral-norm variants (if_SN): ``spectral=True`` on DoubleConv / ConvDown
/ ResConvDown / ResConv / ResBilinearUp / ResConvUp (and UNet itself)
wraps the same convs the reference wraps in torch spectral_norm
(unet_parts.py:16-44, 279-365, 367-467) via flax.linen.SpectralNorm; the
u/v power-iteration estimates live in 'batch_stats'.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from advchain_tpu.models.norm import TorchBatchNorm
from advchain_tpu.models.unet import (DoubleConv, apply_maybe_spectral,
                                      kaiming_conv_init,
                                      max_pool_2x2,
                                      upsample2x_align_corners,
                                      _pad_or_crop_to)

__all__ = [
    "ConvDown", "ResConvDown", "ResConv", "ResBilinearUp", "ResConvUp",
    "DilationConv", "OutConvRelu", "SELayer", "CSELayer", "ChannelSELayer",
    "SpatialSELayer", "ChannelSpatialSELayer", "SqeUp",
    "BatchInstanceNorm", "AdaptiveInstanceNorm", "AdaptiveBatchNorm",
    "bilinear_additive_upsampling", "spatial_pyramid_pool",
    "UnetConv3", "UnetUp3", "normal_init", "xavier_init", "kaiming_init",
    "DomainDoubleConv", "DomainInConv", "DomainPoolDown", "DomainUp",
    "UnetConv2", "Conv2DBatchNorm", "Conv2DBatchNormRelu",
]

# ------------------------------------------------------------ initializers
normal_init = nn.initializers.normal(stddev=0.02)
xavier_init = nn.initializers.xavier_normal()
kaiming_init = kaiming_conv_init


# ------------------------------------------------------------- conv blocks
class ConvDown(nn.Module):
    """Strided conv downsampling + double conv (unet_parts.py:254-277).
    ``spectral`` threads to the double conv (the reference passes if_SN
    through, :264; the strided down_conv stays bare)."""
    out_ch: int
    dropout: Optional[float] = None
    spectral: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        x = nn.Conv(in_ch, (3, 3), strides=(2, 2), padding=1,
                    kernel_init=kaiming_conv_init, name="down_conv")(x)
        x = DoubleConv(self.out_ch, spectral=self.spectral,
                       name="conv")(x, train=train)
        if self.dropout is not None:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class _ResBody(nn.Module):
    """conv3 -> BN -> ReLU -> conv3 -> BN (no final act) — the residual
    branch shared by the res_* blocks.  ``spectral`` wraps both convs in
    spectral norm (the if_SN branches, unet_parts.py:288-298, 331-350)."""
    out_ch: int
    spectral: bool = False

    def _conv(self, x, name, train):
        conv = nn.Conv(self.out_ch, (3, 3), padding=1,
                       kernel_init=kaiming_conv_init, name=name)
        if self.spectral:
            return apply_maybe_spectral(self, conv, x, train)
        return conv(x)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = self._conv(x, "conv1", train)
        x = TorchBatchNorm(name="bn1")(x, use_running_average=not train)
        x = nn.relu(x)
        x = self._conv(x, "conv2", train)
        return TorchBatchNorm(name="bn2")(x, use_running_average=not train)


class ResConvDown(nn.Module):
    """maxpool + residual double conv (unet_parts.py:279-321).

    Quirk parity: with ``spectral`` the reference wraps only the residual
    branch's convs — NOT conv_input (unet_parts.py:308-309; contrast
    res_conv :352, which does wrap it)."""
    out_ch: int
    dropout: Optional[float] = None
    spectral: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = max_pool_2x2(x)
        skip = nn.Conv(self.out_ch, (1, 1),
                       kernel_init=kaiming_conv_init, name="conv_input")(x)
        out = nn.relu(skip + _ResBody(self.out_ch, spectral=self.spectral,
                                      name="conv")(x, train))
        if self.dropout is not None:
            out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return out


class ResConv(nn.Module):
    """Residual double conv (unet_parts.py:323-365).  With ``spectral``
    the reference wraps the residual convs AND conv_input
    (unet_parts.py:351-352)."""
    out_ch: int
    dropout: Optional[float] = None
    spectral: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv_in = nn.Conv(self.out_ch, (1, 1),
                          kernel_init=kaiming_conv_init, name="conv_input")
        if self.spectral:
            skip = apply_maybe_spectral(self, conv_in, x, train)
        else:
            skip = conv_in(x)
        out = nn.relu(skip + _ResBody(self.out_ch, spectral=self.spectral,
                                      name="conv")(x, train))
        if self.dropout is not None:
            out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return out


class ResBilinearUp(nn.Module):
    """bilinear x2 + conv3, concat skip, residual conv
    (unet_parts.py:367-415).  ``spectral`` wraps only the residual
    branch's convs (unet_parts.py:379-388; up/conv_input stay bare)."""
    out_ch: int
    dropout: Optional[float] = None
    spectral: bool = False

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        in_ch = x1.shape[-1]
        up = upsample2x_align_corners(x1)
        up = nn.Conv(in_ch, (3, 3), padding=1,
                     kernel_init=kaiming_conv_init, name="up_conv")(up)
        combined = jnp.concatenate([up, x2], axis=-1)
        skip = nn.Conv(self.out_ch, (1, 1), kernel_init=kaiming_conv_init,
                       name="conv_input")(combined)
        out = nn.relu(skip + _ResBody(self.out_ch, spectral=self.spectral,
                                      name="conv")(combined, train))
        if self.dropout is not None:
            out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return out


class ResConvUp(nn.Module):
    """Transposed-conv x2 upsampling, concat skip, residual conv
    (unet_parts.py:417-467).  ``spectral`` wraps only the residual
    branch's convs (unet_parts.py:429-438)."""
    out_ch: int
    dropout: Optional[float] = None
    spectral: bool = False

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        in_ch = x1.shape[-1]
        # torch ConvTranspose2d(k=4, s=2, p=1) -> out = 2*in; flax's SAME
        # padding on ConvTranspose gives the same output geometry
        up = nn.ConvTranspose(in_ch, (4, 4), strides=(2, 2), padding="SAME",
                              kernel_init=kaiming_conv_init,
                              name="up_deconv")(x1)
        combined = jnp.concatenate([up, x2], axis=-1)
        skip = nn.Conv(self.out_ch, (1, 1), kernel_init=kaiming_conv_init,
                       name="conv_input")(combined)
        out = nn.relu(skip + _ResBody(self.out_ch, spectral=self.spectral,
                                      name="conv")(combined, train))
        if self.dropout is not None:
            out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return out


class DilationConv(nn.Module):
    """Dilated conv -> BN -> ReLU (unet_parts.py:200-216)."""
    out_ch: int
    kernel_size: int = 3
    dilation: int = 1
    dropout: Optional[float] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.dilation * (self.kernel_size - 1) // 2
        x = nn.Conv(self.out_ch, (self.kernel_size,) * 2, padding=pad,
                    kernel_dilation=(self.dilation,) * 2, use_bias=False,
                    kernel_init=kaiming_conv_init, name="conv")(x)
        x = TorchBatchNorm(name="bn")(x, use_running_average=not train)
        x = nn.relu(x)
        if self.dropout is not None:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class OutConvRelu(nn.Module):
    """1x1 conv head with optional activation (unet_parts.py:648-664)."""
    num_classes: int
    activation: Optional[str] = "relu"

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.num_classes, (1, 1),
                    kernel_init=kaiming_conv_init, name="conv")(x)
        if self.activation == "relu":
            return nn.relu(x)
        return x


# --------------------------------------------------- SE / recalibration
class SELayer(nn.Module):
    """Squeeze-and-excitation, reduction 16 (unet_parts.py:469-485)."""
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2))
        y = nn.relu(nn.Dense(c // self.reduction, name="fc1")(y))
        y = jax.nn.sigmoid(nn.Dense(c, name="fc2")(y))
        return x * y[:, None, None, :]


class CSELayer(nn.Module):
    """Spatial gate: 1x1 conv -> sigmoid (unet_parts.py:487-498)."""

    @nn.compact
    def __call__(self, x):
        y = jax.nn.sigmoid(nn.Conv(1, (1, 1), name="spatial_conv")(x))
        return x * y


class ChannelSELayer(nn.Module):
    """SE block, no biases, reduction 2 (custom_layers.py:10-38)."""
    reduction_ratio: int = 2

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2))
        y = nn.relu(nn.Dense(c // self.reduction_ratio, use_bias=False,
                             name="fc1")(y))
        y = jax.nn.sigmoid(nn.Dense(c, use_bias=False, name="fc2")(y))
        return x * y[:, None, None, :]


class SpatialSELayer(nn.Module):
    """Spatial squeeze / channel excitation (custom_layers.py:41-65)."""

    @nn.compact
    def __call__(self, x):
        y = jax.nn.sigmoid(nn.Conv(1, (1, 1), name="conv")(x))
        return x * y


class ChannelSpatialSELayer(nn.Module):
    """Concurrent cSE + sSE with max-out (custom_layers.py:68-84)."""
    reduction_ratio: int = 2

    @nn.compact
    def __call__(self, x):
        return jnp.maximum(
            ChannelSELayer(self.reduction_ratio, name="cSE")(x),
            SpatialSELayer(name="sSE")(x))


class SqeUp(nn.Module):
    """SE-gated decoder block: upsample, pad+concat, SE, double conv,
    + spatial-gated residual (unet_parts.py:589-636)."""
    out_ch: int
    dropout: Optional[float] = None

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        x1 = upsample2x_align_corners(x1)
        x2 = _pad_or_crop_to(x2, x1.shape[1], x1.shape[2])
        x = jnp.concatenate([x2, x1], axis=-1)
        x = SELayer(name="sqe")(x)
        feature = DoubleConv(self.out_ch, name="conv")(x, train=train)
        out = feature + CSELayer(name="cqe")(feature)
        if self.dropout is not None:
            out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return out


# ------------------------------------------------------------------- norms
class BatchInstanceNorm(nn.Module):
    """Gated mix of batch norm and instance norm
    (custom_layers.py:246-307): out = BN(x; gate*w) + IN(x) * ((1-gate)*w).
    Works for NHWC (2d) and NDHWC (3d) inputs."""
    momentum: float = 0.1
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        c = x.shape[-1]
        w = self.param("scale", nn.initializers.ones, (c,))
        b = self.param("bias", nn.initializers.zeros, (c,))
        gate = self.param("gate", nn.initializers.ones, (c,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(c))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(c))
        shape = (1,) * (x.ndim - 1) + (c,)
        axes = tuple(range(x.ndim - 1))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            mean = jnp.mean(x, axis=axes)
            var = jnp.var(x, axis=axes)
            if self.is_mutable_collection("batch_stats") and \
                    not self.is_initializing():
                n = x.size // c
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value \
                    + m * var * (n / max(n - 1, 1))
        bn = (x - mean.reshape(shape)) * jax.lax.rsqrt(
            var.reshape(shape) + self.epsilon)
        out_bn = bn * (w * gate).reshape(shape) + b.reshape(shape)
        # instance norm branch (always batch-free stats, per sample+channel)
        sp_axes = tuple(range(1, x.ndim - 1))
        in_mean = jnp.mean(x, axis=sp_axes, keepdims=True)
        in_var = jnp.var(x, axis=sp_axes, keepdims=True)
        out_in = (x - in_mean) * jax.lax.rsqrt(in_var + self.epsilon)
        out_in = out_in * (w * (1.0 - gate)).reshape(shape)
        return out_bn + out_in


class AdaptiveInstanceNorm(nn.Module):
    """AdaIN: instance norm with externally supplied affine parameters
    (custom_layers.py:174-204)."""
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, weight, bias):
        sp_axes = tuple(range(1, x.ndim - 1))
        mean = jnp.mean(x, axis=sp_axes, keepdims=True)
        var = jnp.var(x, axis=sp_axes, keepdims=True)
        shape = (1,) * (x.ndim - 1) + (x.shape[-1],)
        out = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return out * weight.reshape(shape) + bias.reshape(shape)


class AdaptiveBatchNorm(nn.Module):
    """AdaBN: batch norm with externally supplied affine parameters
    (custom_layers.py:209-243; the reference ctor is broken — implemented
    as documented)."""
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, weight, bias):
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        shape = (1,) * (x.ndim - 1) + (x.shape[-1],)
        out = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return out * weight.reshape(shape) + bias.reshape(shape)


# -------------------------------------------------------------------- misc
def bilinear_additive_upsampling(x, output_channel_num: int):
    """Bilinear x2 upsample then sum channel groups
    (custom_layers.py:87-118); x: NHWC."""
    in_ch = x.shape[-1]
    assert in_ch > output_channel_num, (
        "the number of output channels should not be greater than the "
        "number of input channels")
    assert in_ch % output_channel_num == 0, (
        "input channels must be equally divided by output_channel_num")
    split = in_ch // output_channel_num
    up = upsample2x_align_corners(x)
    n, h, w, _ = up.shape
    return jnp.sum(up.reshape(n, h, w, output_channel_num, split), axis=-1)


def spatial_pyramid_pool(x, out_bin_sizes: Sequence[int]):
    """SPP max pooling at multiple bin counts, concatenated flat
    (custom_layers.py:310-336); x: NHWC -> (N, sum_bins)."""
    n, h, w, c = x.shape
    feats = []
    for bins in out_bin_sizes:
        h_wid = int(math.ceil(h / bins))
        w_wid = int(math.ceil(w / bins))
        h_pad = (h_wid * bins - h + 1) // 2
        w_pad = (w_wid * bins - w + 1) // 2
        padded = jnp.pad(x, [(0, 0), (h_pad, h_pad), (w_pad, w_pad),
                             (0, 0)], constant_values=-jnp.inf)
        pooled = jax.lax.reduce_window(
            padded, -jnp.inf, jax.lax.max, (1, h_wid, w_wid, 1),
            (1, h_wid, w_wid, 1), "VALID")
        feats.append(pooled.reshape(n, -1))
    return jnp.concatenate(feats, axis=1)


# ---------------------------------------------------------------- 3D bits
class UnetConv3(nn.Module):
    """(conv3d -> BN -> ReLU) x2 (unet_parts.py:702-726); NDHWC."""
    out_ch: int
    use_batchnorm: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in (1, 2):
            x = nn.Conv(self.out_ch, (3, 3, 3), padding=1,
                        kernel_init=kaiming_conv_init, name=f"conv{i}")(x)
            if self.use_batchnorm:
                x = TorchBatchNorm(name=f"bn{i}")(
                    x, use_running_average=not train)
            x = nn.relu(x)
        return x


class UnetUp3(nn.Module):
    """3D decoder block: trilinear upsample (z_scale on all axes) + pad +
    concat + UnetConv3 (unet_parts.py:667-699, is_deconv=False path)."""
    out_ch: int
    z_scale_factor: int = 1
    use_batchnorm: bool = True

    @nn.compact
    def __call__(self, skip, x, train: bool = False):
        from advchain_tpu.ops.resize import interpolate
        # NDHWC -> NCDHW for the shared resize helper, and back
        xc = jnp.moveaxis(x, -1, 1)
        f = self.z_scale_factor
        xc = interpolate(xc, scale_factor=(f, f, f), mode="trilinear",
                         align_corners=False)
        up = jnp.moveaxis(xc, 1, -1)
        off_d = up.shape[1] - skip.shape[1]
        off_h = up.shape[2] - skip.shape[2]
        off_w = up.shape[3] - skip.shape[3]
        skip = jnp.pad(skip, [(0, 0),
                              (off_d // 2, off_d - off_d // 2),
                              (off_h // 2, off_h - off_h // 2),
                              (off_w // 2, off_w - off_w // 2), (0, 0)])
        return UnetConv3(self.out_ch, self.use_batchnorm, name="conv")(
            jnp.concatenate([skip, up], axis=-1), train=train)


# ------------------------------------------------- domain-specific blocks
class DomainDoubleConv(nn.Module):
    """double conv with per-domain BN banks (unet_parts.py:48-86):
    ``domain_id`` selects which normalization statistics/affine to use —
    the multi-site training trick of the reference."""
    out_ch: int
    num_domains: int = 1

    @nn.compact
    def __call__(self, x, domain_id: int, train: bool = False):
        x = nn.Conv(self.out_ch, (3, 3), padding=1,
                    kernel_init=kaiming_conv_init, name="conv_1")(x)
        x = self._domain_norm("norm_1", x, domain_id, train)
        x = nn.relu(x)
        x = nn.Conv(self.out_ch, (3, 3), padding=1,
                    kernel_init=kaiming_conv_init, name="conv_2")(x)
        x = self._domain_norm("norm_2", x, domain_id, train)
        return nn.relu(x)

    def _domain_norm(self, prefix, x, domain_id, train):
        """Apply the domain_id-th norm of a bank.  domain_id is a static
        python int (the reference indexes a ModuleList the same way);
        every bank member is created at init so checkpoints are complete."""
        bank = [TorchBatchNorm(name=f"{prefix}_{d}")
                for d in range(self.num_domains)]
        if self.is_initializing():
            for d, nb in enumerate(bank):
                if d != domain_id:
                    nb(x, use_running_average=not train)
        return bank[domain_id](x, use_running_average=not train)


class DomainInConv(nn.Module):
    """domain_inconv (unet_parts.py:237-252)."""
    out_ch: int
    num_domains: int = 1
    dropout: Optional[float] = None

    @nn.compact
    def __call__(self, x, domain_id: int, train: bool = False):
        x = DomainDoubleConv(self.out_ch, self.num_domains,
                             name="conv")(x, domain_id, train)
        if self.dropout is not None:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class DomainPoolDown(nn.Module):
    """domain_pool_down (unet_parts.py:218-235)."""
    out_ch: int
    num_domains: int = 1
    dropout: Optional[float] = None

    @nn.compact
    def __call__(self, x, domain_id: int, train: bool = False):
        x = max_pool_2x2(x)
        x = DomainDoubleConv(self.out_ch, self.num_domains,
                             name="conv_block")(x, domain_id, train)
        if self.dropout is not None:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class DomainUp(nn.Module):
    """domain_up (unet_parts.py:544-584): bilinear x2 + pad + concat +
    domain double conv."""
    out_ch: int
    num_domains: int = 1
    dropout: Optional[float] = None

    @nn.compact
    def __call__(self, x1, x2, domain_id: int, train: bool = False):
        x1 = upsample2x_align_corners(x1)
        x2 = _pad_or_crop_to(x2, x1.shape[1], x1.shape[2])
        x = jnp.concatenate([x2, x1], axis=-1)
        if self.dropout is not None:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return DomainDoubleConv(self.out_ch, self.num_domains,
                                name="conv")(x, domain_id, train)


class UnetConv2(nn.Module):
    """unetConv2 (unet_parts.py:123-158): n stacked conv->(BN)->ReLU."""
    out_ch: int
    use_batchnorm: bool = True
    n: int = 2
    kernel_size: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(1, self.n + 1):
            x = nn.Conv(self.out_ch, (self.kernel_size,) * 2,
                        strides=(self.stride,) * 2, padding=1,
                        kernel_init=kaiming_conv_init, name=f"conv{i}")(x)
            if self.use_batchnorm:
                x = TorchBatchNorm(name=f"bn{i}")(
                    x, use_running_average=not train)
            x = nn.relu(x)
        return x


class Conv2DBatchNorm(nn.Module):
    """conv2DBatchNorm (unet_parts.py:88-103)."""
    out_ch: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out_ch, (self.kernel_size,) * 2,
                    strides=(self.stride,) * 2, padding=self.padding,
                    kernel_init=kaiming_conv_init, name="conv")(x)
        return TorchBatchNorm(name="bn")(x, use_running_average=not train)


class Conv2DBatchNormRelu(nn.Module):
    """conv2DBatchNormRelu (unet_parts.py:105-121)."""
    out_ch: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.relu(Conv2DBatchNorm(
            self.out_ch, self.kernel_size, self.stride, self.padding,
            name="cb")(x, train=train))
