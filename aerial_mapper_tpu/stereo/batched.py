"""Batched virtual-stereo: process many pairs per dispatch.

The reference walks the sequence strictly serially — one OpenCV matcher call
per pair (stereo.cpp:91-110). On TPU the whole pair batch is one program:
rectification remaps, cost volumes, and triangulation are vmapped over a
[B] pair axis and chunked with ``lax.map`` so the [D, H, W] cost volumes
stay bounded. The pair axis is the data-parallel shard axis on a device
mesh (SURVEY.md §2.3: "shard stereo pairs across devices").

Host side prepares per-pair rectification operands in float64 once
(`prepare_pair_operands`); everything after is device code.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from aerial_mapper_tpu.camera.models import Camera
from aerial_mapper_tpu.config import BlockMatchingConfig, SgmConfig
from aerial_mapper_tpu.image.sample import point_in_quad
from aerial_mapper_tpu.stereo.matching import (
    block_matching_disparity,
    sgm_disparity,
)
from aerial_mapper_tpu.stereo.rectify import (
    _rectify_image as _rectify_one,
    rectification_transforms,
)
from aerial_mapper_tpu.stereo.triangulate import triangulate_disparity


class PairOperands(NamedTuple):
    """Per-pair device operands, batch-stackable ([B, ...] each)."""

    image1: jax.Array  # [B, H, W]
    image2: jax.Array
    T1_inv: jax.Array  # [B, 3, 3]
    T2_inv: jax.Array
    corners_rect: jax.Array  # [B, 4, 2]
    R_G_C_rect: jax.Array  # [B, 3, 3]
    t_G_C1: jax.Array  # [B, 3]
    baseline: jax.Array  # [B]


def prepare_pair_operands(
    K: np.ndarray,
    Rs: np.ndarray,  # [N, 3, 3] camera-to-world
    ts: np.ndarray,  # [N, 3]
    images,  # [N, H, W] array or list
    use_every_nth: int = 1,
    phase: int = None,
) -> PairOperands:
    """Host-side: consecutive (subsampled) frames -> stacked pair operands.

    ``phase`` selects which frames the stride keeps; the default matches
    the reference's pre-incremented skip counter (``++skip % n == 0``,
    stereo.cpp:91-93) and the sequential ``VirtualStereo`` driver: frames
    n-1, 2n-1, ... (the earlier 0-based selection was an undocumented
    phase offset between the batched and sequential drivers — round-4
    review). ``phase=0`` keeps that historical selection (bench.py uses
    it so the measured workload stays comparable across rounds)."""
    if phase is None:
        phase = use_every_nth - 1
    idx = list(range(phase, len(images), use_every_nth)) \
        if use_every_nth > 1 else list(range(len(images)))
    if len(idx) < 2:
        raise ValueError("Need at least two frames for a stereo pair")
    h, w = images[0].shape[-2], images[0].shape[-1]

    t1s, t2s, T1i, T2i, corners, rrect, bases = [], [], [], [], [], [], []
    i1s, i2s = [], []
    corner_px = np.array(
        [[0.0, 0.0, 1.0], [w - 1.0, 0.0, 1.0], [w - 1.0, h - 1.0, 1.0],
         [0.0, h - 1.0, 1.0]]
    ).T
    for a, b in zip(idx[:-1], idx[1:]):
        tf = rectification_transforms(K, Rs[a], Rs[b], ts[a], ts[b])
        warped = tf.T1 @ corner_px
        corners.append((warped[:2] / warped[2:3]).T)
        T1i.append(np.linalg.inv(tf.T1))
        T2i.append(np.linalg.inv(tf.T2))
        rrect.append(tf.R_G_C_rect)
        bases.append(tf.baseline)
        t1s.append(ts[a])
        t2s.append(ts[b])
        i1s.append(a)
        i2s.append(b)

    # keep device arrays on device: a single d2h readback flips the axon
    # TPU tunnel into a synchronous dispatch mode (~ms per call).
    # uint8 imagery (the native loader's output) stays uint8 so the
    # rectification remap gathers 1-byte texels (~11% faster per index);
    # bilinear interpolation upcasts after the fetch.
    def _as_image(x):
        x = jnp.asarray(x)
        return x if x.dtype == jnp.uint8 else x.astype(jnp.float32)

    stack_img = lambda ii: jnp.stack(  # noqa: E731
        [_as_image(images[i]) for i in ii]
    )
    return PairOperands(
        image1=stack_img(i1s),
        image2=stack_img(i2s),
        T1_inv=jnp.asarray(np.stack(T1i), jnp.float32),
        T2_inv=jnp.asarray(np.stack(T2i), jnp.float32),
        corners_rect=jnp.asarray(np.stack(corners), jnp.float32),
        R_G_C_rect=jnp.asarray(np.stack(rrect), jnp.float32),
        t_G_C1=jnp.asarray(np.stack(t1s), jnp.float32),
        baseline=jnp.asarray(np.asarray(bases), jnp.float32),
    )


def disparity_range_from_slab(
    K: np.ndarray,
    Rs: np.ndarray,  # [N, 3, 3] camera-to-world
    ts: np.ndarray,  # [N, 3]
    image_hw,
    z_min: float,
    z_max: float,
    use_every_nth: int = 1,
    phase: int = None,
    margin_px: float = 8.0,
    quantize: int = 16,
    outlier_factor: float = 3.0,
) -> tuple:
    """(min_disparity, num_disparities) bracketing a world-z slab.

    The tracked elevation slab bounds the disparity search (VERDICT r4
    #7): in the rectified frame, a pixel (u, v) seeing world elevation z
    has disparity

        d = b * a(u, v) / (z - t_z),   a(u, v) = R_rect[:, 2] . q(u, v)

    with q = [u - cx, (fx/fy)(v - cy), fx] (the Q-matrix triangulation
    inverted, triangulate.py:50-68: z_world = R^T p_rect + t and p_rect =
    (b/d) q). ``a`` is affine in (u, v), so its extremes over the image
    lie at the 4 corners; enumerating corners x slab ends bounds d for
    every pixel whose true elevation lies in [z_min, z_max]. The search
    window widens by ``margin_px`` (sub-pixel refinement and block
    aggregation need interior context) and quantizes — min down to a
    multiple of 8, count up to a multiple of ``quantize`` — so a slab
    drifting by a few meters reuses the compiled program.

    Outlier-baseline pairs are EXCLUDED from the window (a pair whose
    upper disparity bound exceeds ``outlier_factor`` x the median pair's
    — e.g. the cross-flight-line turn pair, whose ~60 m baseline needs
    ~240 px of disparity at survey scale): folding them in would widen
    the window 4x for pairs the reference's fixed 80-disparity window
    cannot match either; excluded pairs simply keep producing invalid
    pixels, exactly as they do at the fixed default.

    Host-side float64 over the same rectification transforms
    ``prepare_pair_operands`` builds; returns plain ints. Degenerate
    geometry (slab at/above the cameras, rays parallel to the slab)
    raises — fall back to the full search range there. Matcher cost
    scales ~linearly with num_disparities (docs/PERFORMANCE.md), so a
    +-20 m slab at survey scale typically needs ~1/3 of the reference's
    80-disparity default.
    """
    if phase is None:
        phase = use_every_nth - 1
    n = len(Rs)
    idx = list(range(phase, n, use_every_nth)) \
        if use_every_nth > 1 else list(range(n))
    if len(idx) < 2:
        raise ValueError("need at least two frames for a disparity range")
    h, w = image_hw
    fx, fy = float(K[0, 0]), float(K[1, 1])
    cx, cy = float(K[0, 2]), float(K[1, 2])
    corners = np.array(
        [[0.0, 0.0], [w - 1.0, 0.0], [0.0, h - 1.0], [w - 1.0, h - 1.0]]
    )
    q = np.stack([
        corners[:, 0] - cx,
        (fx / fy) * (corners[:, 1] - cy),
        np.full(4, fx),
    ], axis=0)  # [3, 4]
    pair_lo, pair_hi = [], []
    for a_i, b_i in zip(idx[:-1], idx[1:]):
        tf = rectification_transforms(K, Rs[a_i], Rs[b_i], ts[a_i], ts[b_i])
        a_vals = tf.R_G_C_rect[:, 2] @ q  # [4]
        denom = np.array([z_min, z_max]) - ts[a_i][2]
        if (denom >= 0).any():
            raise ValueError(
                f"slab [{z_min}, {z_max}] reaches camera altitude "
                f"{ts[a_i][2]:.1f} — disparity range undefined"
            )
        d = tf.baseline * a_vals[:, None] / denom[None, :]
        pair_lo.append(float(d.min()))
        pair_hi.append(float(d.max()))
    pair_lo, pair_hi = np.asarray(pair_lo), np.asarray(pair_hi)
    med_hi = float(np.median(pair_hi))
    keep = pair_hi <= outlier_factor * max(med_hi, 1e-9)
    if not keep.any():
        keep = np.ones_like(keep)
    dropped = int((~keep).sum())
    if dropped:
        import logging

        logging.getLogger("aerial_mapper_tpu").info(
            "disparity_range_from_slab: %d outlier-baseline pair(s) "
            "excluded from the window (max bound %.0f px vs median "
            "%.0f) — they stay unmatched, as at the fixed default",
            dropped, float(pair_hi.max()), med_hi,
        )
    d_lo = float(pair_lo[keep].min())
    d_hi = float(pair_hi[keep].max())
    if not np.isfinite(d_lo) or d_hi <= 0:
        raise ValueError(
            f"degenerate disparity range [{d_lo}, {d_hi}] for slab "
            f"[{z_min}, {z_max}]"
        )
    lo = max(0, int(np.floor((d_lo - margin_px) / 8.0)) * 8)
    hi = d_hi + margin_px
    num = max(quantize, int(np.ceil((hi - lo) / quantize)) * quantize)
    return lo, num


def filter_points_z(points, valid, z_min=None, z_max=None):
    """Opt-in world-z bounds on triangulated points (StereoConfig.z_min/
    z_max): gross disparity outliers triangulate far off the terrain and
    dominate the DSM's squared error; the reference applies the same
    filter to LOADED clouds (z > -100, aerial-mapper-io.cc:309-347).
    None bounds keep everything (reference parity for generated clouds).
    """
    if z_min is not None:
        valid = valid & (points[..., 2] >= z_min)
    if z_max is not None:
        valid = valid & (points[..., 2] <= z_max)
    return valid


def _process_one_pair(op, cam: Camera, matcher: str, bm_cfg, sgm_cfg):
    if matcher not in ("bm", "sgm"):
        # mirror VirtualStereo.process_pair: an unknown matcher must not
        # silently fall through to SGM (round-4 review)
        raise ValueError(f"matcher must be 'bm' or 'sgm', got {matcher!r}")
    (img1, img2, T1i, T2i, corners, R_rect, t1, baseline) = op
    h, w = img1.shape
    rect1 = _rectify_one(img1, T1i)
    rect2 = _rectify_one(img2, T2i)
    v = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    u = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    mask = point_in_quad(u, v, corners)
    if matcher == "bm":
        if bm_cfg.kernel == "pallas":
            from aerial_mapper_tpu.stereo.pallas_bm import (
                block_matching_disparity_pallas,
            )

            disp = block_matching_disparity_pallas(
                rect1, rect2, mask, bm_cfg,
                interpret=jax.default_backend() == "cpu",
            )
        elif bm_cfg.kernel == "xla":
            disp = block_matching_disparity(rect1, rect2, mask, bm_cfg)
        else:
            raise ValueError(
                f"bm kernel must be 'xla' or 'pallas', got {bm_cfg.kernel!r}"
            )
    elif sgm_cfg.kernel == "pallas":
        from aerial_mapper_tpu.stereo.pallas_sgm import sgm_disparity_pallas

        disp = sgm_disparity_pallas(
            rect1, rect2, mask, sgm_cfg,
            interpret=jax.default_backend() == "cpu",
        )
    else:
        disp = sgm_disparity(rect1, rect2, mask, sgm_cfg)
    return triangulate_disparity(
        disp, rect1, R_rect, t1, baseline,
        fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy,
    )


@partial(
    jax.jit,
    static_argnames=("cam", "matcher", "bm_cfg", "sgm_cfg", "batch_chunk"),
)
def process_pairs_batched(
    ops: PairOperands,
    cam: Camera,
    matcher: str = "bm",
    bm_cfg: BlockMatchingConfig = BlockMatchingConfig(),
    sgm_cfg: SgmConfig = SgmConfig(),
    batch_chunk: int = 1,
):
    """All pairs -> (points [B, H*W, 3], intensities [B, H*W], valid [B, H*W]).

    ``batch_chunk`` pairs are vmapped per ``lax.map`` step: memory scales
    with chunk * cost-volume size, wall-clock amortizes dispatch overhead.
    """
    b = ops.image1.shape[0]
    chunk = min(batch_chunk, b)
    num_chunks = -(-b // chunk)
    pad = num_chunks * chunk - b

    def pad0(x):
        cfgs = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfgs)

    padded = PairOperands(*(pad0(x) for x in ops))
    reshaped = PairOperands(
        *(x.reshape((num_chunks, chunk) + x.shape[1:]) for x in padded)
    )

    fn = partial(_process_one_pair, cam=cam, matcher=matcher,
                 bm_cfg=bm_cfg, sgm_cfg=sgm_cfg)

    def map_body(chunk_ops):
        return jax.vmap(lambda *xs: fn(xs))(*chunk_ops)

    points, intens, valid = jax.lax.map(map_body, reshaped)
    hw = points.shape[-2]
    points = points.reshape(num_chunks * chunk, hw, 3)[:b]
    intens = intens.reshape(num_chunks * chunk, hw)[:b]
    valid = valid.reshape(num_chunks * chunk, hw)[:b]
    return points, intens, valid
