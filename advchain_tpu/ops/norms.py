"""Batch-vector normalisation and intensity rescaling utilities.

Parity with reference AdvTransformBase.unit_normalize / rescale_intensity
(advchain/augmentor/adv_transformation_base.py:129-171) and the l2 renorm
projection (:185-189).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["unit_normalize", "rescale_intensity", "renorm_l2"]


def unit_normalize(d, p_type: str = "l2"):
    """Normalise each batch element (axis 0) of `d` as one flat vector.

    'l2': d / (||d||_2 + 1e-20); 'l1': d / ||d||_1 (no eps, like reference);
    'infinity': d / (1e-20 + max(d))  — note the reference uses max, NOT
    max(|d|) (adv_transformation_base.py:146-149); replicated faithfully.
    """
    n = d.shape[0]
    flat = d.reshape(n, -1)
    if p_type == "l2":
        norm = jnp.linalg.norm(flat, axis=1, keepdims=True)
        flat = flat / (norm + 1e-20)
    elif p_type == "l1":
        norm = jnp.sum(jnp.abs(flat), axis=1, keepdims=True)
        flat = flat / norm
    elif p_type == "infinity":
        d_max = jnp.max(flat, axis=1, keepdims=True)
        flat = flat / (1e-20 + d_max)
    else:
        raise ValueError(f"unknown p_type {p_type!r}")
    return flat.reshape(d.shape)


def rescale_intensity(data, new_min: float = 0.0, new_max: float = 1.0,
                      eps: float = 1e-20, per_channel: bool = True):
    """Min-max rescale per (batch, channel) slice — reference
    adv_transformation_base.py:158-171 (per N*C) and the solver variant
    (adv_compose_solver.py:407-421, per N when per_channel=False)."""
    shape = data.shape
    n = shape[0]
    lead = n * shape[1] if per_channel else n
    flat = data.reshape(lead, -1)
    old_max = jnp.max(flat, axis=1, keepdims=True)
    old_min = jnp.min(flat, axis=1, keepdims=True)
    if per_channel:
        new = (flat - old_min + eps) / (old_max - old_min + eps) \
            * (new_max - new_min) + new_min
    else:
        new = (flat - old_min + eps) / (old_max - old_min + eps) \
            * (new_max - new_min) + new_min
    return new.reshape(shape)


def renorm_l2(param, maxnorm: float):
    """torch ``Tensor.renorm(p=2, dim=0, maxnorm)``: scale each batch row so
    its l2 norm is at most `maxnorm` (reference base rescale_parameters,
    adv_transformation_base.py:185-189)."""
    n = param.shape[0]
    flat = param.reshape(n, -1)
    norms = jnp.linalg.norm(flat, axis=1, keepdims=True)
    scale = jnp.where(norms > maxnorm, maxnorm / (norms + 1e-7), 1.0)
    return (flat * scale).reshape(param.shape)
