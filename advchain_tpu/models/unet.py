"""Flax UNet family — TPU-native rebuild of the reference demo models
(advchain/models/unet.py, unet_parts.py).

Architecture parity: UNet (``UNet_16`` = feature_scale 4, ``UNet_64`` =
feature_scale 1), UNetv2 (1024-wide bottleneck), DeeplySupervisedUNet.
Blocks: double_conv = (3x3 conv -> BN -> ReLU) x2 (unet_parts.py:16-44);
down = 2x2 maxpool + double_conv (:176-197); up = bilinear x2 upsample
(align_corners=True) + pad-to-match + concat[skip, x] + double_conv
(:500-541); outconv = 1x1 conv (:638-645); optional Self_Attn at the
bottleneck (custom_layers.py:121-167).

TPU-first design: the network body runs NHWC (XLA's native conv layout on
TPU — channels on the 128-lane minor dim feeds the MXU directly); the public
``__call__`` takes/returns NCHW to match the rest of the framework.  BN has
explicit ``train`` control so the adversarial solver can run
batch-statistics mode without touching running stats (the JAX equivalent of
the reference's ``_disable_tracking_bn_stats``, common/utils.py:114-147);
dropout takes an explicit rng so masks can be held fixed across the PGD
inner loop (the Fixable dropout equivalent, common/layers.py:5-63).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from advchain_tpu.ops.resize import interp_matrix
from advchain_tpu.models.norm import TorchBatchNorm

# torch kaiming_normal_(a=0, mode='fan_in') equivalent
kaiming_conv_init = nn.initializers.variance_scaling(
    2.0, "fan_in", "normal")
# torch BN init: weight ~ N(1, 0.02), bias = 0 (init_weight.py:36-38)
def bn_scale_init(key, shape, dtype=jnp.float32):
    return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)


def _apply_last_act(y, act):
    """Optional head activation (reference UNet last_layer_act,
    models/unet.py:66,90-92)."""
    if act is None:
        return y
    if act == "softmax":
        return jax.nn.softmax(y, axis=-1)
    if act == "sigmoid":
        return jax.nn.sigmoid(y)
    raise NotImplementedError(f"last_layer_act {act!r}")


def max_pool_2x2(x):
    """2x2/2 max pool on NHWC (torch MaxPool2d(2) parity: VALID, floor)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def upsample2x_align_corners(x):
    """Bilinear x2 upsampling with align_corners=True on NHWC (torch
    nn.Upsample(scale_factor=2, mode='bilinear', align_corners=True))."""
    n, h, w, c = x.shape
    wh = interp_matrix(h, 2 * h, True).astype(x.dtype)
    ww = interp_matrix(w, 2 * w, True).astype(x.dtype)
    x = jnp.einsum("nhwc,Hh->nHwc", x, wh)
    x = jnp.einsum("nHwc,Ww->nHWc", x, ww)
    return x


def _pad_or_crop_to(skip, target_h, target_w):
    """Pad (or crop, for negative diffs) the skip tensor to the upsampled
    size, replicating unet_parts.py:525-535 (floor/floor split)."""
    n, h, w, c = skip.shape
    dh = target_h - h
    dw = target_w - w

    # replicate torch exactly: (d//2, int(d/2)) — floor/truncate split
    def split(d):
        return d // 2, int(d / 2)

    ph0, ph1 = split(dh)
    pw0, pw1 = split(dw)
    pads = [(0, 0), (ph0, ph1), (pw0, pw1), (0, 0)]
    if all(p[0] >= 0 and p[1] >= 0 for p in pads):
        out = jnp.pad(skip, pads)
    else:
        # negative padding = crop (torch F.pad semantics)
        out = skip
        if ph0 < 0 or ph1 < 0:
            out = out[:, max(0, -ph0):h + min(0, ph1), :, :]
        if pw0 < 0 or pw1 < 0:
            out = out[:, :, max(0, -pw0):w + min(0, pw1), :]
        out = jnp.pad(out, [(0, 0),
                            (max(0, ph0), max(0, ph1)),
                            (max(0, pw0), max(0, pw1)), (0, 0)])
    # guarantee exact target size
    return out[:, :target_h, :target_w, :]


def apply_maybe_spectral(module, conv, x, train: bool,
                         n_steps: int = 1):
    """Apply ``conv`` to ``x``, optionally under flax.linen.SpectralNorm
    (the if_SN branches of the reference blocks, unet_parts.py:16-44,
    279-365: torch spectral_norm = 1 power-iteration per training forward,
    stored u/v estimates at eval).  The u/v estimates live in
    'batch_stats'; they update only when that collection is mutable
    (quirk/DIVERGENCE: torch also power-iterates inside the solver's
    frozen inner loop — here frozen passes use the stored estimates, the
    converged behavior)."""
    sn = nn.SpectralNorm(conv, n_steps=n_steps,
                         name=conv.name + "_sn")
    update = train and module.is_mutable_collection("batch_stats")
    return sn(x, update_stats=update)


class DoubleConv(nn.Module):
    """(3x3 conv -> BN -> ReLU) x2 (unet_parts.py double_conv).

    ``spectral`` replicates the reference's ``if_SN=True`` branch
    (unet_parts.py:30-40): both 3x3 convs wrapped in spectral norm."""
    out_ch: int
    use_bias: bool = True
    spectral: bool = False

    def _conv(self, x, name, train):
        conv = nn.Conv(self.out_ch, (3, 3), padding=1,
                       use_bias=self.use_bias,
                       kernel_init=kaiming_conv_init, name=name)
        if self.spectral:
            return apply_maybe_spectral(self, conv, x, train)
        return conv(x)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = self._conv(x, "conv1", train)
        x = TorchBatchNorm(scale_init=bn_scale_init, name="bn1")(
            x, use_running_average=not train)
        x = nn.relu(x)
        x = self._conv(x, "conv2", train)
        x = TorchBatchNorm(scale_init=bn_scale_init, name="bn2")(
            x, use_running_average=not train)
        return nn.relu(x)


class Down(nn.Module):
    """maxpool 2x2 then double conv (unet_parts.py down)."""
    out_ch: int
    dropout: Optional[float] = None
    spectral: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = max_pool_2x2(x)
        x = DoubleConv(self.out_ch, spectral=self.spectral,
                       name="conv")(x, train=train)
        if self.dropout is not None:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class Up(nn.Module):
    """bilinear x2 + pad + concat[skip, x] + double conv (unet_parts.py up)."""
    out_ch: int
    dropout: Optional[float] = None
    spectral: bool = False

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        x = upsample2x_align_corners(x)
        skip = _pad_or_crop_to(skip, x.shape[1], x.shape[2])
        x = jnp.concatenate([skip, x], axis=-1)
        if self.dropout is not None:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return DoubleConv(self.out_ch, spectral=self.spectral,
                          name="conv")(x, train=train)


class OutConv(nn.Module):
    """1x1 conv head (unet_parts.py outconv)."""
    num_classes: int

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.num_classes, (1, 1),
                       kernel_init=kaiming_conv_init, name="conv")(x)


class SelfAttn2d(nn.Module):
    """Spatial self-attention block (custom_layers.py:121-167)."""
    factor: int = 8

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        q = nn.Conv(c // self.factor, (1, 1), name="query_conv")(x)
        k = nn.Conv(c // self.factor, (1, 1), name="key_conv")(x)
        v = nn.Conv(c, (1, 1), name="value_conv")(x)
        qf = q.reshape(n, h * w, -1)
        kf = k.reshape(n, h * w, -1)
        vf = v.reshape(n, h * w, c)
        energy = jnp.einsum("npc,nqc->npq", qf, kf,
                            preferred_element_type=jnp.float32)
        attention = jax.nn.softmax(energy, axis=-1)
        out = jnp.einsum("npq,nqc->npc", attention, vf,
                         preferred_element_type=jnp.float32)
        out = out.reshape(n, h, w, c)
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        weighted = gamma * out
        return weighted + x, weighted, attention


class UNet(nn.Module):
    """Reference UNet (models/unet.py:39-237).  ``feature_scale=4`` is
    'UNet_16', ``feature_scale=1`` is 'UNet_64'.  ``spectral`` is the
    reference's ``if_SN`` ctor flag (models/unet.py:40-59): spectral norm
    on every inc/down/up conv (the outconv head is NOT wrapped there)."""
    input_channel: int = 1
    num_classes: int = 4
    feature_scale: int = 1
    encoder_dropout: Optional[float] = None
    decoder_dropout: Optional[float] = None
    self_attention: bool = False
    spectral: bool = False
    last_layer_act: Optional[str] = None  # 'softmax' | 'sigmoid' | None

    @nn.compact
    def __call__(self, x, train: bool = False):
        fs = self.feature_scale
        sn = self.spectral
        x = jnp.moveaxis(x, 1, -1)  # NCHW -> NHWC
        x1 = DoubleConv(64 // fs, spectral=sn, name="inc")(x, train=train)
        if self.encoder_dropout is not None:
            x1 = nn.Dropout(self.encoder_dropout,
                            deterministic=not train)(x1)
        x2 = Down(128 // fs, self.encoder_dropout, spectral=sn,
                  name="down1")(x1, train)
        x3 = Down(256 // fs, self.encoder_dropout, spectral=sn,
                  name="down2")(x2, train)
        x4 = Down(512 // fs, self.encoder_dropout, spectral=sn,
                  name="down3")(x3, train)
        x5 = Down(512 // fs, self.encoder_dropout, spectral=sn,
                  name="down4")(x4, train)
        self.sow("intermediates", "hidden_feature", x5)
        if self.self_attention:
            x5, _, attn = SelfAttn2d(name="self_atn")(x5)
            self.sow("intermediates", "attention_map", attn)
        y = Up(256 // fs, self.decoder_dropout, spectral=sn,
               name="up1")(x5, x4, train)
        y = Up(128 // fs, self.decoder_dropout, spectral=sn,
               name="up2")(y, x3, train)
        y = Up(64 // fs, self.decoder_dropout, spectral=sn,
               name="up3")(y, x2, train)
        y = Up(64 // fs, self.decoder_dropout, spectral=sn,
               name="up4")(y, x1, train)
        y = OutConv(self.num_classes, name="outc")(y)
        y = _apply_last_act(y, self.last_layer_act)
        return jnp.moveaxis(y, -1, 1)  # NHWC -> NCHW


class UNetv2(nn.Module):
    """Reference UNetv2 (models/unet.py:370-461): 1024-wide bottleneck."""
    input_channel: int = 1
    num_classes: int = 4
    feature_scale: int = 1
    encoder_dropout: Optional[float] = None
    decoder_dropout: Optional[float] = None
    self_attention: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        fs = self.feature_scale
        x = jnp.moveaxis(x, 1, -1)
        x1 = DoubleConv(64 // fs, name="inc")(x, train=train)
        if self.encoder_dropout is not None:
            x1 = nn.Dropout(self.encoder_dropout,
                            deterministic=not train)(x1)
        x2 = Down(128 // fs, self.encoder_dropout, name="down1")(x1, train)
        x3 = Down(256 // fs, self.encoder_dropout, name="down2")(x2, train)
        x4 = Down(512 // fs, self.encoder_dropout, name="down3")(x3, train)
        x5 = Down(1024 // fs, self.encoder_dropout, name="down4")(x4, train)
        if self.self_attention:
            x5, _, attn = SelfAttn2d(name="self_atn")(x5)
            self.sow("intermediates", "attention_map", attn)
        y = Up(256 // fs, self.decoder_dropout, name="up1")(x5, x4, train)
        y = Up(128 // fs, self.decoder_dropout, name="up2")(y, x3, train)
        y = Up(64 // fs, self.decoder_dropout, name="up3")(y, x2, train)
        y = Up(64 // fs, self.decoder_dropout, name="up4")(y, x1, train)
        y = OutConv(self.num_classes, name="outc")(y)
        return jnp.moveaxis(y, -1, 1)


class DeeplySupervisedUNet(nn.Module):
    """Reference DeeplySupervisedUNet (models/unet.py:240-367)."""
    input_channel: int = 1
    num_classes: int = 4
    base_n_filters: int = 64
    dropout: Optional[float] = None

    @nn.compact
    def __call__(self, x, train: bool = False, multi_out: bool = False):
        b = self.base_n_filters
        rate = self.dropout if self.dropout is not None else 0.0
        drop = nn.Dropout(rate, deterministic=(not train) or rate == 0.0)
        x = jnp.moveaxis(x, 1, -1)
        x1 = DoubleConv(b, name="inc")(x, train=train)
        x2 = Down(b * 2, name="down1")(x1, train)
        x3 = drop(Down(b * 4, name="down2")(x2, train))
        x4 = drop(Down(b * 8, name="down3")(x3, train))
        x5 = drop(Down(b * 8, name="down4")(x4, train))
        y = Up(b * 4, self.dropout, name="up1")(x5, x4, train)
        x_2 = Up(b * 2, self.dropout, name="up2")(y, x3, train)
        dsv_x_2 = OutConv(self.num_classes, name="up2_conv1")(x_2)
        dsv_x_2_up = upsample2x_align_corners(dsv_x_2)
        x_3 = Up(b, self.dropout, name="up3")(x_2, x2, train)
        dsv_x_3 = OutConv(self.num_classes, name="up3_conv1")(x_3)
        dsv_mixed = dsv_x_2_up + dsv_x_3
        dsv_mixed_up = upsample2x_align_corners(dsv_mixed)
        x_4 = Up(b, name="up4")(x_3, x1, train)
        out = OutConv(self.num_classes, name="outc")(x_4)
        final = out + dsv_mixed_up
        if multi_out:
            return tuple(jnp.moveaxis(v, -1, 1)
                         for v in (out, dsv_mixed_up, final))
        return jnp.moveaxis(final, -1, 1)


class ZDecomposedConv3d(nn.Module):
    """3x3x3 SAME conv on NDHWC, computed as a sum of three 2D convs over
    z-shifted plane stacks (D folded into the batch): mathematically
    identical to ``nn.Conv(features, (3, 3, 3), padding=1)`` with the same
    parameter names/shapes, but XLA's 2D NHWC conv lowering runs ~10x
    faster than its NCDHW 3D path on shallow volumes (round-4 device
    trace: a 382-MFLOP 3D conv took 16 ms)."""
    features: int

    @nn.compact
    def __call__(self, x):
        n, d, h, w, cin = x.shape
        kernel = self.param("kernel", kaiming_conv_init,
                            (3, 3, 3, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        out = None
        for dz in range(3):
            planes = xp[:, dz:dz + d].reshape(n * d, h, w, cin)
            y = jax.lax.conv_general_dilated(
                planes, kernel[dz], window_strides=(1, 1),
                padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=jax.lax.Precision.HIGHEST)
            out = y if out is None else out + y
        return out.reshape(n, d, h, w, self.features) + bias


class PseudoConv3dModel(nn.Module):
    """The reference's tiny 3D demo model (cardiac notebook cell 26):
    Conv3d(1->n_cls, 3, pad 1) -> BN3d -> dropout -> Conv3d head."""
    num_classes: int = 4
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        # NCDHW -> NDHWC
        x = jnp.moveaxis(x, 1, -1)
        x = ZDecomposedConv3d(8, name="conv1")(x)
        x = TorchBatchNorm(name="bn1")(x, use_running_average=not train)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = ZDecomposedConv3d(self.num_classes, name="conv2")(x)
        return jnp.moveaxis(x, -1, 1)
