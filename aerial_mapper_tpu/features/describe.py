"""Patch descriptors: normalized intensity patches sampled at corners.

A deliberately simple, MXU-friendly descriptor: a ``P x P`` bilinear patch
around each corner, mean/std normalized, flattened to a P^2 vector. With
normalized descriptors, matching similarity is one [K, D] @ [D, K] matmul —
exactly the systolic-array shape — and equals zero-mean NCC. For nadir
aerial surveys (small rotation between overlapping frames) this is robust
enough to feed BA; invariance upgrades (orientation, multi-scale) slot in
here without touching the matcher.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from aerial_mapper_tpu.image.sample import bilinear_sample


@partial(jax.jit, static_argnames=("patch_size", "stride"))
def describe_patches(
    image: jax.Array,
    uv: jax.Array,
    patch_size: int = 8,
    stride: float = 2.0,
):
    """[K, 2] corners -> [K, patch_size^2] L2-normalized descriptors.

    ``stride`` spaces the patch samples (patch spans patch_size * stride
    pixels — a little context beats pixel-level detail for matching).
    """
    p = patch_size
    offs = (jnp.arange(p, dtype=jnp.float32) - (p - 1) / 2.0) * stride
    du, dv = jnp.meshgrid(offs, offs, indexing="xy")

    def one(uv1):
        patch = bilinear_sample(
            image, uv1[0] + du, uv1[1] + dv, fill_value=0.0
        )
        mean = jnp.mean(patch)
        centered = patch - mean
        norm = jnp.sqrt(jnp.sum(centered**2) + 1e-6)
        return (centered / norm).reshape(-1)

    return jax.vmap(one)(uv)
