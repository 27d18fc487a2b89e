"""Segmentation consistency divergences (mse / kl / contour) + CE.

Parity with reference advchain/common/loss.py.  All functions take logits
(pre-softmax) unless ``is_gt`` — then ``reference`` is a one-hot/prob map.
Everything is pure jnp, so the whole divergence fuses into the PGD step's
XLA program (softmax + elementwise + small stencil convs are
bandwidth-bound; XLA fuses them into the surrounding graph).

Replicated quirks (documented in SURVEY.md section 7 "hard parts"):
  * mse normalisation: torch ``MSELoss(mean)`` over all elements, then an
    extra division by ``numel(mask)/C`` (loss.py:62-64).
  * the 3D contour kernels: the reference builds gy as a duplicate of gx and
    overwrites its first gz (loss.py:172-183); the *effective* kernels are
    replicated so loss values match.
  * kl ``is_gt`` path clamps the one-hot reference to [1e-8, 1-1e-8]
    elementwise via ``where(ref == 0, eps, 1-eps)`` (loss.py:242).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from advchain_tpu.ops.conv import conv_same

__all__ = [
    "calc_segmentation_consistency", "calc_segmentation_mse_consistency",
    "calc_segmentation_kl_consistency", "contour_loss", "kl_divergence",
    "one_hot", "cross_entropy_2d",
]


# ----------------------------------------------------------------- kernels
@functools.lru_cache(maxsize=8)
def _sobel_kernels_2d(object_classes: int):
    x_f = np.array([[1, 0, -1], [2, 0, -2], [1, 0, -1]], np.float32)
    x_f = x_f.reshape(1, 1, 3, 3)
    y_f = np.array([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], np.float32)
    y_f = y_f.reshape(1, 1, 3, 3)
    # reference uses FULL conv with the same kernel tiled across in/out
    # channels (loss.py:146-147), not depthwise
    x_w = np.tile(x_f, (object_classes, object_classes, 1, 1))
    y_w = np.tile(y_f, (object_classes, object_classes, 1, 1))
    return x_w, y_w


@functools.lru_cache(maxsize=8)
def _sobel_kernels_3d(object_classes: int):
    """Effective 3D kernels after the reference's gy/gz bugs (loss.py:169-183):
    gx[i,j,k] = hy[i]*hpx[j]*hz[k]; gy = gx; gz[i,j,k] = hy[i]*hx[j]*hpz[k]."""
    smooth = np.array([1, 2, 1], np.float64)
    diff = np.array([1, 0, -1], np.float64)
    gx = np.einsum("i,j,k->ijk", smooth, diff, smooth)
    gz = np.einsum("i,j,k->ijk", smooth, smooth, diff)
    gx = gx.reshape(1, 1, 3, 3, 3).astype(np.float32)
    gz = gz.reshape(1, 1, 3, 3, 3).astype(np.float32)
    gx_w = np.tile(gx, (object_classes, object_classes, 1, 1, 1))
    gy_w = gx_w
    gz_w = np.tile(gz, (object_classes, object_classes, 1, 1, 1))
    return gx_w, gy_w, gz_w


# ------------------------------------------------------------------ pieces
def one_hot(labels, depth: int):
    """Integer labelmap (N, *spatial) -> one-hot (N, depth, *spatial)
    (reference One_Hot module, loss.py:252-271)."""
    oh = jax.nn.one_hot(labels.astype(jnp.int32), depth, dtype=jnp.float32)
    return jnp.moveaxis(oh, -1, 1)


def kl_divergence(reference, pred, mask=None, is_gt: bool = False):
    """DKL(P||Q) = mean over batch+spatial of sum_c mask*(p log p - p log q)
    (reference loss.py:223-249)."""
    q = pred
    if mask is None:
        mask = jnp.ones_like(q)
    if not is_gt:
        p = jax.nn.softmax(reference, axis=1)
        log_p = jax.nn.log_softmax(reference, axis=1)
    else:
        p = jnp.where(reference == 0, 1e-8, 1 - 1e-8)
        log_p = jnp.log(p)
    log_q = jax.nn.log_softmax(q, axis=1)
    plogp = jnp.sum(mask * (p * log_p), axis=1)
    plogq = jnp.sum(mask * (p * log_q), axis=1)
    return jnp.mean(plogp - plogq)


def contour_loss(input, target, ignore_background: bool = True,
                 one_hot_target: bool = True, mask=None):
    """Sobel-gradient MSE across object boundaries (reference loss.py:102-220).

    input: probs (N, C, *spatial); target: labelmap (N, *spatial) if
    ``one_hot_target`` else probs/one-hot (N, C, *spatial).
    """
    num_classes = input.shape[1]
    spatial_dims = input.ndim - 2
    if one_hot_target:
        target = one_hot(target, num_classes).reshape(input.shape)
    assert target.shape == input.shape, (
        f"pred size: {input.shape} must match target size: {target.shape}")
    if mask is None:
        mask = jnp.ones_like(input)
    if ignore_background:
        object_classes = num_classes - 1
        target_maps = target[:, 1:]
        input = input[:, 1:]
    else:
        object_classes = num_classes
        target_maps = target
    m = mask[:, :object_classes]

    def mse(a, b):
        return jnp.mean((a - b) ** 2)

    if spatial_dims == 2:
        x_w, y_w = _sobel_kernels_2d(object_classes)
        x_w = jnp.asarray(x_w)
        y_w = jnp.asarray(y_w)
        gx_p = conv_same(input, x_w) * m
        gy_p = conv_same(input, y_w) * m
        gx_t = conv_same(target_maps, x_w) * m
        gy_t = conv_same(target_maps, y_w) * m
        return 0.5 * (mse(gx_p, gx_t) + mse(gy_p, gy_t))
    if spatial_dims == 3:
        gx_w, gy_w, gz_w = _sobel_kernels_3d(object_classes)
        gx_w = jnp.asarray(gx_w)
        gy_w = jnp.asarray(gy_w)
        gz_w = jnp.asarray(gz_w)
        gx_p = conv_same(input, gx_w) * m
        gy_p = conv_same(input, gy_w) * m
        gz_p = conv_same(input, gz_w) * m
        gx_t = conv_same(target_maps, gx_w) * m
        gy_t = conv_same(target_maps, gy_w) * m
        gz_t = conv_same(target_maps, gz_w) * m
        return (mse(gx_p, gx_t) + mse(gy_p, gy_t) + mse(gz_p, gz_t)) / 3.0
    raise NotImplementedError("only 2D/3D supported")


def _avg_pool(x, k: int):
    """torch AvgPool{2,3}d(kernel=k) equivalent (stride = k, no padding)."""
    ndim = x.ndim - 2
    window = (1, 1) + (k,) * ndim
    out = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, window, "VALID")
    return out / float(k ** ndim)


def calc_segmentation_consistency(output, reference,
                                  divergence_types=("kl", "contour"),
                                  divergence_weights=(1.0, 0.5),
                                  class_weights=None, scales=(0,),
                                  mask=None, is_gt: bool = False):
    """Weighted multi-scale divergence between two prediction tensors
    (reference loss.py:8-87)."""
    if class_weights is not None:
        raise NotImplementedError
    num_classes = reference.shape[1]
    spatial_dims = output.ndim - 2
    assert spatial_dims in (2, 3), "only support 2d or 3d segmentation"
    assert output.ndim == reference.ndim
    if mask is None:
        mask = jnp.ones_like(output)
    dist = 0.0
    for scale in scales:
        if scale > 0:
            ref_s = _avg_pool(reference, 2 ** scale)
            out_s = _avg_pool(output, 2 ** scale)
            # DIVERGENCE from reference (fixing a crash): loss.py:37-46 keeps
            # the mask at full resolution, which shape-mismatches the pooled
            # outputs for any scale > 0 (never exercised there — the solver
            # always uses scales=[0]).  We pool the mask alongside.
            mask_s = _avg_pool(mask, 2 ** scale)
        else:
            ref_s = reference
            out_s = output
            mask_s = mask
        for divergence_type, d_weight in zip(divergence_types,
                                             divergence_weights):
            if divergence_type == "kl":
                loss = kl_divergence(pred=out_s, reference=ref_s,
                                     mask=mask_s, is_gt=is_gt)
            elif divergence_type == "mse":
                target_pred = ref_s if is_gt else jax.nn.softmax(ref_s, axis=1)
                input_pred = jax.nn.softmax(out_s, axis=1)
                loss = jnp.mean((target_pred * mask_s
                                 - input_pred * mask_s) ** 2)
                # divisor: numel(mask)/C in the reference where the mask is
                # always full-channel; expressed via the output so masks may
                # be broadcast over channels (identical value either way)
                loss = loss / (out_s.size / num_classes)
            elif divergence_type == "contour":
                target_pred = ref_s if is_gt else jax.nn.softmax(ref_s, axis=1)
                input_pred = jax.nn.softmax(out_s, axis=1)
                loss = 0.0
                cnt = 0
                for i in range(1, num_classes):
                    cnt += 1
                    loss += contour_loss(
                        input=input_pred[:, i:i + 1],
                        target=target_pred[:, i:i + 1],
                        ignore_background=False, mask=mask_s,
                        one_hot_target=False)
                if cnt > 0:
                    loss = loss / cnt
            else:
                raise NotImplementedError(
                    f"divergence type {divergence_type!r}")
            dist = dist + 2 ** scale * (d_weight * loss)
    return dist / (1.0 * len(scales))


def calc_segmentation_mse_consistency(input, target):
    return calc_segmentation_consistency(
        output=input, reference=target, divergence_types=["mse"],
        divergence_weights=[1.0], class_weights=None, mask=None)


def calc_segmentation_kl_consistency(input, target):
    return calc_segmentation_consistency(
        output=input, reference=target, divergence_types=["kl"],
        divergence_weights=[1.0], class_weights=None, mask=None)


def cross_entropy_2d(input, target, weight=None, size_average: bool = True):
    """CE on 2D logits (N, C, H, W); target is a hard labelmap (N, H, W) or
    soft probs (N, C, H, W) (reference loss.py:274-327)."""
    n, c, h, w = input.shape
    log_p = jax.nn.log_softmax(input, axis=1)
    log_p_flat = jnp.moveaxis(log_p, 1, -1).reshape(-1, c)
    if target.ndim == 3:
        t = target.reshape(-1).astype(jnp.int32)
        picked = jnp.take_along_axis(log_p_flat, t[:, None], axis=1)[:, 0]
        if weight is not None:
            weight = jnp.asarray(weight, jnp.float32)
            weight = weight / jnp.sum(weight) * c
            picked = picked * weight[t]
        loss = -jnp.sum(picked)
        if size_average:
            loss = loss / (n * h * w)
        return loss
    if target.ndim == 4:
        ref_flat = jnp.moveaxis(target, 1, -1).reshape(-1, c)
        if weight is None:
            plogq = jnp.sum(ref_flat * log_p_flat)
            if size_average:
                plogq = plogq / (n * h * w)
        else:
            weight = np.asarray(weight, np.float64)
            weight = weight / weight.sum() * c
            plogq = 0.0
            for i in range(c):
                plogq += jnp.sum(ref_flat[:, i] * log_p_flat[:, i]
                                 * float(weight[i]))
            if size_average:
                plogq = plogq / (n * h * w)
        return -1.0 * plogq
    raise NotImplementedError("target must be 3-D labels or 4-D probs")


def cross_entropy(input, target, weight=None, size_average: bool = True):
    """Rank-generic cross-entropy: logits (N, C, *S) with hard labels
    (N, *S) or soft probs (N, C, *S) for any spatial rank.

    The reference only ships a 2D CE (loss.py:274-327); this flattens the
    trailing spatial dims and defers to ``cross_entropy_2d`` so the fused
    train steps work on 3D volumes too (framework extension, same math).
    """
    n, c = input.shape[:2]
    s = int(np.prod(input.shape[2:]))
    logits = input.reshape(n, c, s, 1)
    if target.ndim == input.ndim - 1:       # hard labelmap
        tgt = target.reshape(n, s, 1)
    elif target.ndim == input.ndim:         # soft probabilities
        tgt = target.reshape(n, c, s, 1)
    else:
        raise NotImplementedError(
            f"target rank {target.ndim} does not match logits rank "
            f"{input.ndim}")
    return cross_entropy_2d(logits, tgt, weight=weight,
                            size_average=size_average)
