"""MyRandAugment — RandAugment with parameter capture + replay, JAX-native.

Capability parity with reference common/my_rand_augment.py:92-194 (a
torchvision fork whose point is *reproducible paired augmentation*: the op
sequence, magnitudes, and randomness are captured on the first call and
re-applied with ``reuse_param=True``).  This implementation is pure
JAX/numpy — no torchvision dependency — using the standard torchvision
RandAugment magnitude space and op set on float NCHW images in [0, 1].

Documented divergence: the reference's replay branch only restores the
*last* op/magnitude of the sequence (my_rand_augment.py:169-193), so its
replay is only faithful for num_ops=1; here the FULL op sequence is
captured and replayed (the documented intent).
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from advchain_tpu.ops.grid_sample import grid_sample_2d
from advchain_tpu.ops.conv import conv_same

__all__ = ["MyRandAugment", "apply_op"]


def _affine_pixel_warp(img, matrix_fn, interp="nearest", fill=None):
    """Warp NCHW by a pixel-space inverse map (x_src, y_src) = f(x, y).

    ``fill`` (scalar or per-channel sequence, image scale) sets the value
    of out-of-view pixels, matching torchvision's ``fill=`` on the
    geometric functional ops (reference my_rand_augment.py:27-90,164-167).
    Implemented by the shift-to-zero-background trick (subtract fill,
    sample with zeros padding, add back — same device program shape as the
    default path; cf. augmentor/affine.py's 'lowest' padding)."""
    n, c, h, w = img.shape
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    sx, sy = matrix_fn(xs, ys)
    gx = 2.0 * sx / max(w - 1, 1) - 1.0
    gy = 2.0 * sy / max(h - 1, 1) - 1.0
    grid = jnp.broadcast_to(jnp.stack([gx, gy], axis=-1)[None],
                            (n, h, w, 2))
    fv = None
    if fill is not None:
        fv = jnp.asarray(fill, jnp.float32).reshape(1, -1, 1, 1)
        assert fv.shape[1] in (1, c), \
            f"fill must be scalar or {c}-channel, got {fv.shape[1]} values"
        img = img - fv
    out = grid_sample_2d(img, grid, mode=interp, padding_mode="zeros",
                         align_corners=True)
    if fv is not None:
        out = out + fv
    return out


def _blend(img1, img2, ratio):
    return jnp.clip(ratio * img1 + (1.0 - ratio) * img2, 0.0, 1.0)


def _grayscale(img):
    if img.shape[1] == 3:
        r, g, b = img[:, 0:1], img[:, 1:2], img[:, 2:3]
        return 0.2989 * r + 0.587 * g + 0.114 * b
    return jnp.mean(img, axis=1, keepdims=True)


def apply_op(img, op_name: str, magnitude: float, interp: str = "nearest",
             fill=None):
    """Apply one RandAugment op to a float NCHW image in [0, 1].

    ``fill`` affects only the geometric ops (shear/translate/rotate), as in
    torchvision (reference my_rand_augment.py:27-90)."""
    h, w = img.shape[2], img.shape[3]
    if op_name == "Identity":
        return img
    if op_name == "ShearX":
        # torchvision shears about center=[0,0] with tan(shear) = magnitude
        return _affine_pixel_warp(
            img, lambda x, y: (x + magnitude * y, y), interp, fill)
    if op_name == "ShearY":
        return _affine_pixel_warp(
            img, lambda x, y: (x, y + magnitude * x), interp, fill)
    if op_name == "TranslateX":
        t = float(int(magnitude))
        return _affine_pixel_warp(img, lambda x, y: (x - t, y), interp, fill)
    if op_name == "TranslateY":
        t = float(int(magnitude))
        return _affine_pixel_warp(img, lambda x, y: (x, y - t), interp, fill)
    if op_name == "Rotate":
        ang = math.radians(magnitude)
        cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
        cos, sin = math.cos(ang), math.sin(ang)

        def rot(x, y):
            dx, dy = x - cx, y - cy
            return cx + cos * dx - sin * dy, cy + sin * dx + cos * dy

        return _affine_pixel_warp(img, rot, interp, fill)
    if op_name == "Brightness":
        return _blend(img, jnp.zeros_like(img), 1.0 + magnitude)
    if op_name == "Color":
        return _blend(img, _grayscale(img), 1.0 + magnitude)
    if op_name == "Contrast":
        mean = jnp.mean(_grayscale(img), axis=(2, 3), keepdims=True)
        return _blend(img, mean, 1.0 + magnitude)
    if op_name == "Sharpness":
        k = jnp.asarray([[1, 1, 1], [1, 5, 1], [1, 1, 1]],
                        jnp.float32) / 13.0
        c = img.shape[1]
        wgt = jnp.broadcast_to(k, (c, 1, 3, 3))
        smooth = conv_same(img, wgt, groups=c)
        # torchvision keeps the 1-px border unchanged
        mask = jnp.zeros((1, 1, h, w)).at[:, :, 1:-1, 1:-1].set(1.0)
        smooth = img * (1 - mask) + smooth * mask
        return _blend(img, smooth, 1.0 + magnitude)
    if op_name == "Posterize":
        bits = int(magnitude)
        levels = float(1 << bits)
        q = jnp.floor(img * 255.0).astype(jnp.int32)
        keep = (q >> (8 - bits)) << (8 - bits)
        return keep.astype(jnp.float32) / 255.0
    if op_name == "Solarize":
        thresh = magnitude / 255.0
        return jnp.where(img >= thresh, 1.0 - img, img)
    if op_name == "AutoContrast":
        lo = jnp.min(img, axis=(2, 3), keepdims=True)
        hi = jnp.max(img, axis=(2, 3), keepdims=True)
        scale = jnp.where(hi > lo, 1.0 / (hi - lo + 1e-12),
                          jnp.ones_like(hi))
        return jnp.where(hi > lo, (img - lo) * scale, img)
    if op_name == "Equalize":
        q = jnp.clip(jnp.floor(img * 255.0), 0, 255).astype(jnp.int32)
        n, c = img.shape[:2]
        flat = q.reshape(n * c, -1)

        def eq_one(v):
            # torchvision _scale_channel: step = (N - count(last nonzero
            # bin)) // 255; lut = ((cumsum + step//2) // step) shifted right
            # one bin with lut[0] = 0; identity when step == 0
            hist = jnp.bincount(v, length=256)
            idx_last = jnp.argmax(jnp.where(hist > 0, jnp.arange(256), -1))
            step = (v.size - hist[idx_last]) // 255
            cum = jnp.cumsum(hist)
            lut = jnp.clip((cum + step // 2) // jnp.maximum(step, 1), 0, 255)
            lut = jnp.concatenate([jnp.zeros(1, lut.dtype), lut[:-1]])
            return jnp.where(step == 0, v, lut[v])

        out = jax.vmap(eq_one)(flat).reshape(img.shape)
        return out.astype(jnp.float32) / 255.0
    if op_name == "Invert":
        return 1.0 - img
    raise ValueError(f"The provided operator {op_name} is not recognized.")


class MyRandAugment:
    """RandAugment with capture/replay (reference my_rand_augment.py:92)."""

    def __init__(self, num_ops: int = 2, magnitude: int = 9,
                 num_magnitude_bins: int = 31,
                 interpolation: str = "nearest", fill=None, seed=None):
        self.num_ops = num_ops
        self.magnitude = magnitude
        self.num_magnitude_bins = num_magnitude_bins
        self.interpolation = interpolation
        self.fill = fill
        self._rng = np.random.RandomState(seed)
        # captured state for replay
        self.op_sequence: Optional[List[Tuple[str, float]]] = None
        self.op_name = None
        self.magnitude_state = None

    def _augmentation_space(self, num_bins: int, image_size):
        h, w = image_size
        lin = np.linspace
        return {
            "Identity": (np.array(0.0), False),
            "ShearX": (lin(0.0, 0.3, num_bins), True),
            "ShearY": (lin(0.0, 0.3, num_bins), True),
            "TranslateX": (lin(0.0, 150.0 / 331.0 * w, num_bins), True),
            "TranslateY": (lin(0.0, 150.0 / 331.0 * h, num_bins), True),
            "Rotate": (lin(0.0, 30.0, num_bins), True),
            "Brightness": (lin(0.0, 0.9, num_bins), True),
            "Color": (lin(0.0, 0.9, num_bins), True),
            "Contrast": (lin(0.0, 0.9, num_bins), True),
            "Sharpness": (lin(0.0, 0.9, num_bins), True),
            "Posterize": (8 - (np.arange(num_bins) / ((num_bins - 1) / 4))
                          .round(), False),
            "Solarize": (lin(255.0, 0.0, num_bins), False),
            "AutoContrast": (np.array(0.0), False),
            "Equalize": (np.array(0.0), False),
        }

    def forward(self, img, reuse_param: bool = False, interpolation=None):
        interp = interpolation or self.interpolation
        h, w = img.shape[2], img.shape[3]
        if reuse_param and self.op_sequence is not None:
            seq = self.op_sequence
        else:
            space = self._augmentation_space(self.num_magnitude_bins, (h, w))
            names = list(space.keys())
            seq = []
            for _ in range(self.num_ops):
                op_name = names[int(self._rng.randint(len(names)))]
                magnitudes, signed = space[op_name]
                magnitude = (float(magnitudes[self.magnitude])
                             if magnitudes.ndim > 0 else 0.0)
                if signed and self._rng.randint(2):
                    magnitude *= -1.0
                seq.append((op_name, magnitude))
            self.op_sequence = seq
            self.op_name = seq[-1][0]
            self.magnitude_state = seq[-1][1]
        for op_name, magnitude in seq:
            img = apply_op(img, op_name, magnitude, interp=interp,
                           fill=self.fill)
        return img

    __call__ = forward
