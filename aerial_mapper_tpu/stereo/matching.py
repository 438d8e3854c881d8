"""Dense stereo correspondence on TPU: cost-volume BM and semi-global matching.

Replaces the reference's thin OpenCV wrappers
(``aerial_mapper_dense_pcl/src/block-matching-{bm,sgbm}.cpp``, parameter
defaults at ``common.h:81-110``). Instead of calling an opaque CPU matcher we
build the disparity cost volume as one dense gather + integral-image box
filter (VPU-friendly, static shapes) and aggregate:

- **BM**: x-Sobel prefilter, SAD winner-take-all + parabolic sub-pixel,
  texture threshold, uniqueness ratio, left-right consistency, windowed
  speckle suppression — the same post-filter suite cv::StereoBM applies.
- **SGM**: the Hirschmuller semi-global recurrence over 4 or 8 scan
  directions (``SgmConfig.num_directions``; the production default is 8 —
  cv full-8 parity — with diagonals via modular row-shears + restart
  flags), each expressed as a ``lax.scan`` along the direction with the
  full perpendicular axis and disparity axis vectorized (SURVEY.md §7.3
  "SGBM on TPU"). P1/P2 defaults follow common.h:85-96.

Disparity convention matches OpenCV: d = u_left - u_right >= 0; invalid
pixels get ``INVALID_DISPARITY`` (the reference masks invalid/out-of-mask
disparities to 1.0 = kMaxInvalidDisparity, block-matching-sgbm.cpp:29-37, and
triangulation keeps only d > 1, densifier.cpp:60).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from aerial_mapper_tpu.config import BlockMatchingConfig, SgmConfig

INVALID_DISPARITY = 1.0  # kMaxInvalidDisparity (common.h / densifier.cpp:60)
_BIG = 1.0e9


def use_integer_costs(cfg: BlockMatchingConfig) -> bool:
    """True when the cv-faithful quantized integer-cost path applies:
    window sums must fit int16 and the prefilter output must fit uint8.
    Shared by the XLA and Pallas matchers so their input quantization
    always agrees (a config that overflows falls back to float costs in
    BOTH paths)."""
    return bool(
        cfg.integer_costs
        and 2 * cfg.pre_filter_cap * cfg.block_size ** 2 < 32767
        and 2 * cfg.pre_filter_cap <= 255
    )


def _big_for(dtype):
    """Invalid-cost sentinel (Python scalar): dtype max for ints, 1e9 for
    floats. Every masked-cost site (border mask, uniqueness, LR shear
    fill) uses this so the int16 cost-volume path carries a representable
    sentinel."""
    if jnp.issubdtype(dtype, jnp.integer):
        return int(jnp.iinfo(dtype).max)
    return _BIG


def _box_filter(x: jax.Array, k: int, axes=(-2, -1)) -> jax.Array:
    """Sum over a k x k window (edge-padded), via integral images.

    O(1) per pixel independent of k — the reason we can afford block 15.
    Integer inputs run the whole integral in int16: the prefix sums along
    a full axis overflow int16 freely, but two's-complement arithmetic is
    exact mod 2^16, so ``upper - lower`` recovers the true window sum
    whenever THAT fits int16 — which is exactly the caller's INVARIANT:
    max|input| * k^2 < 32767 per filtered axis (the BM path enforces it
    via ``use_integer_costs``; larger window sums silently wrap — pass
    floats if the bound cannot be proven). Bit-identical to an int32
    integral truncated to int16, at half the integral's HBM traffic
    (the cumsum read+write is the matcher's dominant cost).
    """
    r = k // 2
    integer = jnp.issubdtype(x.dtype, jnp.integer)
    for ax in axes:
        pad = [(0, 0)] * x.ndim
        pad[ax] = (r + 1, r)
        xp = jnp.pad(x, pad, mode="edge")
        cs = jnp.cumsum(xp.astype(jnp.int16) if integer else xp, axis=ax)
        upper = jax.lax.slice_in_dim(cs, k, cs.shape[ax], axis=ax % x.ndim)
        lower = jax.lax.slice_in_dim(cs, 0, cs.shape[ax] - k, axis=ax % x.ndim)
        x = upper - lower
    return x


def _xsobel_prefilter(image: jax.Array, cap: float) -> jax.Array:
    """cv::StereoBM's PREFILTER_XSOBEL: horizontal Sobel clamped to [-cap, cap],
    shifted by +cap so values stay positive."""
    p = jnp.pad(image, ((1, 1), (1, 1)), mode="edge")
    gx = (
        (p[:-2, 2:] - p[:-2, :-2])
        + 2.0 * (p[1:-1, 2:] - p[1:-1, :-2])
        + (p[2:, 2:] - p[2:, :-2])
    )
    return jnp.clip(gx, -cap, cap) + cap


def _diag_shear(vol: jax.Array, sign: int, fill: float) -> jax.Array:
    """out[d, v, u] = vol[d, v, u + sign * d], out-of-range -> ``fill``.

    Implemented as pad + transpose + one strided reshape — a pure layout
    transform. The naive formulation (take_along_axis with per-element
    indices on the lane axis) costs ~340 ms for [64, 480, 752] on a v5e;
    this runs at memory speed.
    """
    d_, h, w = vol.shape
    if sign > 0:
        wp = w + d_ + 1
        padded = jnp.pad(vol, ((0, 1), (0, 0), (0, wp - w)),
                         constant_values=fill)
        flat = padded.transpose(1, 0, 2).reshape(h, (d_ + 1) * wp)
        out = flat[:, : d_ * (wp + 1)].reshape(h, d_, wp + 1)[:, :, :w]
    else:
        p = d_  # left pad = max shift
        wp = w + p + 1
        padded = jnp.pad(vol, ((0, 1), (0, 0), (p, wp - w - p)),
                         constant_values=fill)
        flat = padded.transpose(1, 0, 2).reshape(h, (d_ + 1) * wp)
        out = flat[:, : d_ * (wp - 1)].reshape(h, d_, wp - 1)[:, :, p: p + w]
    return out.transpose(1, 0, 2)


def _shifted_right(image: jax.Array, num_disp: int, min_disp: int) -> jax.Array:
    """[D, H, W] stack: out[d] = right image shifted right by (min_disp + d).

    out[d][v, u] = R[v, u - (min_disp + d)]; out-of-range pixels are 0 and
    later invalidated by the border mask.
    """
    h, w = image.shape
    base = (
        jnp.pad(image, ((0, 0), (min_disp, 0)))[:, :w] if min_disp else image
    )
    vol = jnp.broadcast_to(base[None], (num_disp, h, w))
    return _diag_shear(vol, sign=-1, fill=0.0)


def _cost_volume_sad(
    left: jax.Array, right: jax.Array, num_disp: int, min_disp: int, block: int
) -> jax.Array:
    """SAD cost volume [D, H, W] with k x k aggregation.

    uint8 inputs (the quantized cv-faithful path: prefilter output is in
    [0, 2*cap] <= 126) keep the shear and |diff| volumes at 1 byte/texel —
    absolute difference via max-min since unsigned subtraction wraps."""
    r_stack = _shifted_right(right, num_disp, min_disp)
    if jnp.issubdtype(left.dtype, jnp.unsignedinteger):
        lex = left[None, :, :]
        ad = jnp.maximum(lex, r_stack) - jnp.minimum(lex, r_stack)
    else:
        ad = jnp.abs(left[None, :, :] - r_stack)
    return _box_filter(ad, block)


def _bt_cost(left: jax.Array, right: jax.Array, num_disp: int,
             min_disp: int) -> jax.Array:
    """Birchfield-Tomasi sampling-insensitive pixel cost [D, H, W].

    BT compares each left pixel against the interval spanned by the
    half-sample interpolated right pixel (and symmetrically), which makes SGM
    robust to rectification phase error — the same per-pixel cost cv::SGBM
    uses before block aggregation.
    """
    def half_samples(img):
        # edge-REPLICATED neighbor shifts (cv clamps at the border; a
        # jnp.roll here would mix the opposite image edge into the BT
        # interval at the first/last columns — round-4 review)
        prev = jnp.concatenate([img[:, :1], img[:, :-1]], axis=-1)
        nxt = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=-1)
        l = 0.5 * (img + prev)
        r = 0.5 * (img + nxt)
        mn = jnp.minimum(jnp.minimum(l, r), img)
        mx = jnp.maximum(jnp.maximum(l, r), img)
        return mn, mx

    lmin, lmax = half_samples(left)
    rmin, rmax = half_samples(right)

    r_v = _shifted_right(right, num_disp, min_disp)
    rmin_v = _shifted_right(rmin, num_disp, min_disp)
    rmax_v = _shifted_right(rmax, num_disp, min_disp)

    d_lr = jnp.maximum(
        0.0, jnp.maximum(left[None] - rmax_v, rmin_v - left[None])
    )
    d_rl = jnp.maximum(
        0.0, jnp.maximum(r_v - lmax[None], lmin[None] - r_v)
    )
    return jnp.minimum(d_lr, d_rl)


def _border_mask(h: int, w: int, num_disp: int, min_disp: int) -> jax.Array:
    """[D, H, W] True where the shifted right pixel actually exists."""
    u = jax.lax.broadcasted_iota(jnp.int32, (num_disp, w), 1)
    d = jax.lax.broadcasted_iota(jnp.int32, (num_disp, w), 0) + min_disp
    ok = (u - d) >= 0  # [D, W]
    return jnp.broadcast_to(ok[:, None, :], (num_disp, h, w))


def _wta_subpixel(cost: jax.Array, min_disp: int):
    """Winner-take-all over D + parabolic sub-pixel refinement.

    Returns (disparity [H, W] float, min_cost [H, W], best_idx [H, W] int).

    NOTE (tried, REVERTED — axon backend miscompile): folding this and the
    uniqueness runner-up into two variadic ``lax.reduce`` traversals
    ((min, first-argmin) monoid, then (cm, cp, runner) with masked-where
    producers) is semantically identical — verified bit-equal standalone
    on BOTH CPU and the axon TPU, including on a real cost volume — but
    inside the full fused ``block_matching_disparity`` program the axon
    backend MISCOMPILES it: 13 409/361 k disparities differed from the CPU
    oracle (valid count 3 953 -> 17 357) while this argmin+masked-sum
    formulation differs by only 5 contraction-level pixels. The fusion win
    was ~3.5 ms/step e2e — not worth chasing a backend bug. A/B'd
    2026-08-20; see docs/PERFORMANCE.md.
    """
    num_disp = cost.shape[0]
    best = jnp.argmin(cost, axis=0)  # [H, W]
    c0 = jnp.min(cost, axis=0)
    d_idx = jax.lax.broadcasted_iota(jnp.int32, cost.shape, 0)
    zero = jnp.zeros((), cost.dtype)

    def sel(off):
        # cost at disparity best+off as a masked reduction — leading-axis
        # take_along_axis gathers cost ~15 ms on [64, 480, 752]; this is
        # two streaming passes. Exactly one plane is selected per pixel,
        # so an int16 volume cannot overflow the sum.
        idx = jnp.clip(best + off, 0, num_disp - 1)
        return jnp.sum(jnp.where(d_idx == idx[None], cost, zero), axis=0)

    cm = sel(-1).astype(jnp.float32)
    cp = sel(+1).astype(jnp.float32)
    c0f = c0.astype(jnp.float32)
    if jnp.issubdtype(cost.dtype, jnp.integer):
        # remap the int sentinel (dtype max at border-masked planes) to the
        # float _BIG so sub-pixel deltas at the disparity border match the
        # float path; real window sums never reach the sentinel (the
        # caller's overflow guard keeps them strictly below dtype max)
        big = float(_big_for(cost.dtype))
        cm = jnp.where(cm == big, _BIG, cm)
        cp = jnp.where(cp == big, _BIG, cp)
    denom = cm - 2.0 * c0f + cp
    delta = jnp.where(jnp.abs(denom) > 1e-9, (cm - cp) / (2.0 * denom), 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    interior = (best > 0) & (best < num_disp - 1)
    disp = best.astype(jnp.float32) + jnp.where(interior, delta, 0.0) \
        + min_disp
    del d_idx
    return disp, c0, best


def _uniqueness_mask(cost: jax.Array, best: jax.Array, c0: jax.Array,
                     ratio: int) -> jax.Array:
    """cv::StereoBM/SGBM uniqueness: invalidate when some d' with
    |d'-best|>1 has ``sad[d'] <= thresh`` where
    ``thresh = minsad + minsad*ratio/100`` in INTEGER arithmetic
    (truncating division) for the integer-cost path — equality REJECTS,
    exactly cv's ``sad <= thresh`` test (the earlier float
    ``runner >= c0*(1+ratio/100)`` accepted knife-edge ties cv rejects —
    round-4 review). The float-cost fallback uses the strict-> analogue
    with real division. ``ratio < 0`` disables the check."""
    if ratio < 0:
        return jnp.ones(cost.shape[1:], bool)
    d_idx = jax.lax.broadcasted_iota(jnp.int32, cost.shape, 0)
    away = jnp.abs(d_idx - best[None]) > 1
    big = _big_for(cost.dtype)
    runner = jnp.min(jnp.where(away, cost, big), axis=0)
    if jnp.issubdtype(cost.dtype, jnp.integer):
        runner_i = runner.astype(jnp.int32)
        # all-masked pixels carry the dtype-max sentinel, which can be
        # SMALLER than the int32 threshold — remap to int32 max first
        runner_i = jnp.where(runner_i == int(big), jnp.int32(2**31 - 1),
                             runner_i)
        thresh = c0.astype(jnp.int32) * (100 + ratio) // 100
        return runner_i > thresh
    runner_f = runner.astype(jnp.float32)
    runner_f = jnp.where(runner_f == float(big), _BIG, runner_f)
    return runner_f > c0.astype(jnp.float32) * (1.0 + ratio / 100.0)


def _lr_consistency_mask(cost: jax.Array, best: jax.Array,
                         min_disp: int, max_diff: int = 1) -> jax.Array:
    """Left-right check by reusing the left cost volume — no second matching
    pass and no per-pixel gathers.

    Right-view cost is the diagonal of the left volume:
    ``cost_R[d, v, u_r] = cost_L[d, v, u_r + min_disp + d]`` (gather-free
    ``_diag_shear``). A left pixel whose winner index is ``dL`` passes when
    the right winner ``d_r`` at its match column ``u - min_disp - dL``
    satisfies ``|d_r - dL| <= 1`` (index-level, like cv::validateDisparity
    with disp12MaxDiff=1). Sampling ``d_r`` at ``u - dL`` is a [H, W]
    arbitrary gather (~3.6 ms at this hardware's per-index gather cost,
    CLAUDE.md); instead mark right winners in LEFT coordinates by equality
    against the sheared right-column minima:

        aligned[d, v, u] = (cost_L[d, v, u] == m_r[v, u - min_disp - d])

    since ``cost_R[d, v, u_r] == cost_L[d, v, u]`` identically for
    ``u = u_r + min_disp + d``. Then

        pass[v, u] = OR over off in [-max_diff, max_diff] of
                     aligned[dL+off, v, u+off]

    covers every |d_r - dL| <= max_diff case (a right winner d_r = dL+off
    at match column u - min_disp - dL appears in left coordinates at
    column u + off, shear index dL + off) — one masked any-reduction over
    d, all shears layout-level. ``max_diff`` is cv's disp12MaxDiff
    (validateDisparity semantics: 0 = exact index agreement required, the
    reference SGBM default, common.h:91). Deviation from the previous
    subpixel-valued compare: ties in m_r accept any tied winner (argmin
    keeps the first); measured identical masks on the synthetic set to
    within the post-filter tolerance.
    """
    num_disp, h, w = cost.shape
    big = _big_for(cost.dtype)
    shifted = (
        jnp.pad(cost, ((0, 0), (0, 0), (0, min_disp)),
                constant_values=big)[:, :, min_disp:]
        if min_disp else cost
    )
    # right-view volume + its per-column minima; winner marks computed in
    # right coordinates (bool, 1/4 the bytes of the float volume), then
    # sheared BACK to left coordinates — both shears are layout-level
    cost_r = _diag_shear(shifted, sign=+1, fill=big)
    m_r = jnp.min(cost_r, axis=0)  # [H, W]
    win_r = cost_r == m_r[None]  # [D, H, W] marks in right coords
    aligned = _diag_shear(win_r, sign=-1, fill=False)
    if min_disp:
        aligned = jnp.pad(
            aligned, ((0, 0), (0, 0), (min_disp, 0))
        )[:, :, :w]
    near = aligned
    for off in range(1, max_diff + 1):
        # off > 0: aligned[dL+off, v, u+off]; off < 0 symmetric
        near = near | jnp.pad(
            aligned, ((0, off), (0, 0), (0, off))
        )[off:, :, off:]
        near = near | jnp.pad(
            aligned, ((off, 0), (0, 0), (off, 0))
        )[:-off, :, :w]
    d_idx = jax.lax.broadcasted_iota(jnp.int32, cost.shape, 0)
    return jnp.any(near & (d_idx == best[None]), axis=0)


def _speckle_mask(disp: jax.Array, valid: jax.Array, window_size: int,
                  speckle_range: float) -> jax.Array:
    """Windowed approximation of cv::filterSpeckles: keep a pixel if enough
    neighbors in a w x w window agree within speckle_range.

    The reference relies on OpenCV's connected-component speckle filter;
    an exact CC labeling is irregular on TPU, so we use local support counts
    (window area matched to speckle_window_size) — same intent: kill small
    isolated disparity islands. Documented deviation.
    """
    if window_size <= 0:
        return valid
    k = max(3, int(round(window_size ** 0.5)) | 1)
    mean = _box_filter(jnp.where(valid, disp, 0.0), k) / jnp.maximum(
        _box_filter(valid.astype(disp.dtype), k), 1.0
    )
    density = _box_filter(valid.astype(disp.dtype), k) / float(k * k)
    coherent = jnp.abs(disp - mean) <= speckle_range
    return valid & coherent & (density > 0.25)


def _speckle_mask_cc(disp: jax.Array, valid: jax.Array, max_size: int,
                     speckle_range: float, num_iters: int = 0) -> jax.Array:
    """Connected-component speckle filter — cv::filterSpeckles parity mode.

    cv semantics (what the reference relies on through StereoBM/SGBM's
    compute post-pass): pixels are 4-connected when BOTH are valid and
    their disparities differ by <= speckle_range; every connected region
    with <= max_size pixels is invalidated. Exact CC labeling on TPU via
    Shiloach-Vishkin-style hooking: each iteration (1) takes the min label
    over allowed edges (4 shifted compares), (2) scatter-mins that onto
    each pixel's ROOT slot — hooking whole trees, not pixels, so adjacent
    components merge per iteration and the component count along any path
    at least halves — then (3) flattens with two pointer jumps. Converges
    in O(log n) iterations even on width-1 serpentine regions (the naive
    propagate+jump variant measured ~diameter/13 iterations there); the
    default runs ceil(log2(H*W)) + 4 with a serpentine worst-case test
    guarding the bound. Labels are linear indices, so the result is
    deterministic (region min index). Region sizes come from one
    scatter-add + gather.

    ~2 gathers + 1 scatter per iteration x ~22 iterations at 752x480 makes
    this several times the cost of the windowed approximation
    (`_speckle_mask`) — use ``speckle_mode='cc'`` for reference parity,
    'windowed' for speed.
    """
    if max_size <= 0:
        return valid
    import math as _math

    h, w = disp.shape
    n = h * w
    if num_iters <= 0:
        num_iters = max(1, int(_math.ceil(_math.log2(max(n, 2))))) + 4
    idx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w + \
        jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)

    shifts = ((0, 1), (0, -1), (1, 0), (-1, 0))

    def shifted(a, di, dj, fill):
        pad = ((max(di, 0), max(-di, 0)), (max(dj, 0), max(-dj, 0)))
        ap = jnp.pad(a, pad, constant_values=fill)
        return ap[pad[0][1]: pad[0][1] + h, pad[1][1]: pad[1][1] + w]

    # static edge masks: neighbor exists, both valid, |dd| <= range
    edges = []
    for di, dj in shifts:
        nd = shifted(disp, di, dj, jnp.float32(_BIG))
        nv = shifted(valid, di, dj, False)
        edges.append(valid & nv & (jnp.abs(disp - nd) <= speckle_range))

    def hook(lab):
        labg = lab.reshape(h, w)
        best = labg
        for (di, dj), ok in zip(shifts, edges):
            nl = shifted(labg, di, dj, n - 1)
            best = jnp.minimum(best, jnp.where(ok, nl, n - 1))
        # hook: the min neighbor label seen at p flows to p's root slot
        # (values are <= the target index, keeping label[q] <= q)
        new = lab.at[lab].min(best.reshape(-1))
        new = new[new]  # flatten the (depth <= 3) forest
        return new[new]

    # fixed-point early exit: labels monotonically decrease, so reaching a
    # fixed point means every later iteration is a no-op and stopping is
    # bit-identical to running the full worst-case bound. Typical
    # disparity maps converge in far fewer than the serpentine bound's
    # ~23 iterations (the per-iteration gather+scatter cost dominates;
    # the convergence compare-reduce is cheap VPU work).
    def cond(state):
        i, _, changed = state
        return (i < num_iters) & changed

    def body(state):
        i, lab, _ = state
        new = hook(lab)
        return i + 1, new, jnp.any(new != lab)

    _, label, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), idx.reshape(-1), jnp.bool_(True))
    )
    flat = label
    counts = jnp.zeros(n, jnp.int32).at[flat].add(
        valid.reshape(-1).astype(jnp.int32)
    )
    region_size = counts[flat].reshape(h, w)
    return valid & (region_size > max_size)


def apply_speckle_filter(disp: jax.Array, valid: jax.Array,
                         cfg) -> jax.Array:
    """Dispatch on ``cfg.speckle_mode``: 'windowed' (fast approximation)
    or 'cc' (cv::filterSpeckles-parity connected components). Shared by
    the XLA and Pallas matchers."""
    if getattr(cfg, "speckle_mode", "windowed") == "cc":
        return _speckle_mask_cc(disp, valid, cfg.speckle_window_size,
                                cfg.speckle_range)
    return _speckle_mask(disp, valid, cfg.speckle_window_size,
                         cfg.speckle_range)


@partial(jax.jit, static_argnames=("cfg",))
def block_matching_disparity(
    left: jax.Array,
    right: jax.Array,
    mask: jax.Array,
    cfg: BlockMatchingConfig,
) -> jax.Array:
    """cv::StereoBM-equivalent disparity from a rectified pair.

    ``mask``: bool [H, W] valid-rectification region (Rectifier mask); pixels
    outside get INVALID_DISPARITY like block-matching-bm.cpp:29-37.

    With ``cfg.integer_costs`` (default) the rectified images are rounded
    to integers — exactly what cv::StereoBM sees (its rectified inputs are
    CV_8U and its prefilter output is uint8, so its SAD costs are ints) —
    and the [D, H, W] cost volume is carried in int16: every cost-volume
    pass (shear, box sums, WTA, uniqueness, LR shears) moves half the HBM
    bytes of the float32 formulation. The int16 window-sum bound
    2*pre_filter_cap*block_size^2 is checked statically; configs that
    could overflow fall back to float32.
    """
    h, w = left.shape
    use_int = use_integer_costs(cfg)
    left_f = left.astype(jnp.float32)
    right_f = right.astype(jnp.float32)
    if use_int:
        left_f = jnp.round(left_f)
        right_f = jnp.round(right_f)
    lf = _xsobel_prefilter(left_f, cfg.pre_filter_cap)
    rf = _xsobel_prefilter(right_f, cfg.pre_filter_cap)
    # prefilter output is in [0, 2*cap] <= 126: uint8, like cv::StereoBM's
    lfq = lf.astype(jnp.uint8) if use_int else lf
    rfq = rf.astype(jnp.uint8) if use_int else rf

    cost = _cost_volume_sad(
        lfq, rfq, cfg.num_disparities, cfg.min_disparity, cfg.block_size
    )
    border = _border_mask(h, w, cfg.num_disparities, cfg.min_disparity)
    cost = jnp.where(border, cost, _big_for(cost.dtype))

    disp, c0, best = _wta_subpixel(cost, cfg.min_disparity)

    # Texture threshold: cv::StereoBM invalidates when the RAW window sum
    # of |sobel - ftzero| responses is below textureThreshold (no scaling;
    # the earlier `* block_size` factor was an undocumented 15x-stricter
    # deviation, round-4 review)
    texture = _box_filter(jnp.abs(lf - cfg.pre_filter_cap), cfg.block_size)
    valid = texture >= cfg.texture_threshold

    valid &= _uniqueness_mask(cost, best, c0, cfg.uniqueness_ratio)
    if cfg.disp_12_max_diff >= 0:
        valid &= _lr_consistency_mask(cost, best, cfg.min_disparity,
                                      cfg.disp_12_max_diff)
    valid &= mask
    valid &= jnp.any(border, axis=0)
    valid = apply_speckle_filter(disp, valid, cfg)
    return jnp.where(valid, disp, INVALID_DISPARITY)


def _sgm_scan_1d(cost: jax.Array, p1: float, p2: float,
                 reverse: bool, unroll: int = 1,
                 restart=None) -> jax.Array:
    """Aggregate along the [..., L, D] scan axis with the SGM recurrence,
    vectorized over everything but the scan axis.

    ``restart`` (optional bool [..., L]): True where a position begins a
    new DP segment in FORWARD order — the recurrence resets there
    (out = raw cost, no carry), exactly cv's per-path restart at the image
    border. Used by the sheared diagonal scans, whose modular shear maps
    several border-wrapped diagonals onto one scan column. For
    ``reverse=True`` the flags are re-derived automatically: a segment's
    first element in reverse order is its last in forward order.
    """
    if restart is not None:
        if reverse:
            # last element of a forward segment == element whose successor
            # starts a new segment (the final position is a scan init)
            restart = jnp.concatenate(
                [restart[..., 1:],
                 jnp.ones_like(restart[..., :1])], axis=-1,
            )
        restart = jnp.flip(restart, axis=-1) if reverse else restart
    if reverse:
        cost = jnp.flip(cost, axis=-2)

    def step(carry, xs):
        if restart is None:
            c = xs
        else:
            c, r = xs
        # carry: [..., D] previous aggregated costs
        m = jnp.min(carry, axis=-1, keepdims=True)
        up = jnp.concatenate([carry[..., :1] + p1 + _BIG * 0,
                              carry[..., :-1] + p1], axis=-1)
        down = jnp.concatenate([carry[..., 1:] + p1,
                                carry[..., -1:] + p1 + _BIG * 0], axis=-1)
        # boundary: shifting in from outside should not win; use +P1 on the
        # clamped copy is harmless since the clamped value >= true neighbor.
        best = jnp.minimum(jnp.minimum(carry, up), jnp.minimum(down, m + p2))
        out = c + best - m
        if restart is not None:
            out = jnp.where(r[..., None], c, out)
        return out, out

    cost_t = jnp.moveaxis(cost, -2, 0)  # [L, ..., D]
    init = cost_t[0]
    xs = cost_t[1:] if restart is None else (
        cost_t[1:], jnp.moveaxis(restart, -1, 0)[1:]
    )
    _, agg = jax.lax.scan(step, init, xs, unroll=unroll)
    agg = jnp.concatenate([init[None], agg], axis=0)
    agg = jnp.moveaxis(agg, 0, -2)
    if reverse:
        agg = jnp.flip(agg, axis=-2)
    return agg


def sgm_aggregate(cdhw: jax.Array, cfg: SgmConfig) -> jax.Array:
    """Directional SGM aggregation of a [H, W, D] cost volume (4 or 8
    directions per ``cfg.num_directions``); the sum of per-direction DP
    passes. Exact per-path semantics (parity oracle:
    ``testing.numpy_ref.sgm_aggregate_reference``): every path starts
    fresh at the image border — the diagonal passes run on the modular
    row-shear (a pure layout transform) with restart flags at each wrap.
    """
    h, w, _ = cdhw.shape
    ur = cfg.scan_unroll
    agg = _sgm_scan_1d(cdhw, cfg.p1, cfg.p2, reverse=False,
                       unroll=ur)  # left->right
    agg = agg + _sgm_scan_1d(cdhw, cfg.p1, cfg.p2, reverse=True,
                             unroll=ur)  # right->left
    cthw = jnp.swapaxes(cdhw, 0, 1)  # [W, H, D]
    agg_v = _sgm_scan_1d(cthw, cfg.p1, cfg.p2, reverse=False, unroll=ur)
    agg_v = agg_v + _sgm_scan_1d(cthw, cfg.p1, cfg.p2, reverse=True,
                                 unroll=ur)
    agg = agg + jnp.swapaxes(agg_v, 0, 1)

    if cfg.num_directions >= 8:
        # Diagonal directions via row-shear: shift row i by +/- i columns
        # so diagonals become columns, scan vertically, unshear. The
        # modular shear maps a diagonal that exits the right edge back in
        # on the left, stacking several border-wrapped diagonals into one
        # scan column — restart flags at each wrap make the DP recurrence
        # begin fresh there, exactly cv::StereoSGBM's per-path border
        # restart (tested against the non-wrapping numpy oracle).
        def shear(x, sign):
            idx = (
                jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
                + sign * jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
            ) % w
            return jnp.take_along_axis(x, idx[..., None], axis=1)

        for sign in (+1, -1):
            sheared = shear(cdhw, sign)
            # source column of sheared[i, j] is (j + sign*i) mod w; a new
            # diagonal segment begins where it wraps around the border
            src_col = (
                jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
                + sign * jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
            ) % w
            restart = src_col == (0 if sign > 0 else w - 1)  # [H, W]
            restart_t = jnp.swapaxes(restart, 0, 1)  # [W, H] scan layout
            a = _sgm_scan_1d(
                jnp.swapaxes(sheared, 0, 1), cfg.p1, cfg.p2, reverse=False,
                unroll=ur, restart=restart_t,
            ) + _sgm_scan_1d(
                jnp.swapaxes(sheared, 0, 1), cfg.p1, cfg.p2, reverse=True,
                unroll=ur, restart=restart_t,
            )
            agg = agg + shear(jnp.swapaxes(a, 0, 1), -sign)
    return agg


@partial(jax.jit, static_argnames=("cfg",))
def sgm_disparity(
    left: jax.Array,
    right: jax.Array,
    mask: jax.Array,
    cfg: SgmConfig,
) -> jax.Array:
    """Semi-global matching disparity (cv::StereoSGBM-equivalent).

    BT pixel cost on x-Sobel prefiltered images, block-summed
    (block_size), aggregated along ``cfg.num_directions`` (4 or 8; the
    production default is 8) scan directions, WTA + sub-pixel +
    uniqueness + mask.
    """
    h, w = left.shape
    lf = _xsobel_prefilter(left.astype(jnp.float32),
                           float(cfg.pre_filter_cap))
    rf = _xsobel_prefilter(right.astype(jnp.float32),
                           float(cfg.pre_filter_cap))

    cost = _bt_cost(lf, rf, cfg.num_disparities, cfg.min_disparity)
    if cfg.block_size > 1:
        cost = _box_filter(cost, cfg.block_size) / float(cfg.block_size**2)
    border = _border_mask(h, w, cfg.num_disparities, cfg.min_disparity)
    cost = jnp.where(border, cost, 1e4)

    cdhw = jnp.moveaxis(cost, 0, -1)  # [H, W, D]
    agg = sgm_aggregate(cdhw, cfg)
    cost_agg = jnp.moveaxis(agg, -1, 0)  # [D, H, W]
    disp, c0, best = _wta_subpixel(cost_agg, cfg.min_disparity)
    valid = _uniqueness_mask(cost_agg, best, c0, cfg.uniqueness_ratio)
    if cfg.texture_threshold > 0:
        # opt-in BM-style texture gate (cv::StereoSGBM has none; see
        # SgmConfig.texture_threshold): raw block sum of |sobel - cap|
        texture = _box_filter(jnp.abs(lf - float(cfg.pre_filter_cap)),
                              cfg.block_size)
        valid &= texture >= cfg.texture_threshold
    if cfg.disp_12_max_diff >= 0:
        # cv::StereoSGBM runs validateDisparity whenever
        # disp12MaxDiff >= 0 (the reference passes 0, common.h:91): the
        # right-view winner of the AGGREGATED volume must agree with the
        # left winner to within max_diff indices.
        valid &= _lr_consistency_mask(cost_agg, best, cfg.min_disparity,
                                      cfg.disp_12_max_diff)
    valid &= mask & jnp.any(border, axis=0)
    valid = apply_speckle_filter(disp, valid, cfg)
    return jnp.where(valid, disp, INVALID_DISPARITY)
