"""Dense stereo depth: census + cost volume + semi-global matching (SGM).

Replaces the OAK camera's on-ASIC StereoDepth block (reference
luxonis.py:513-536: HIGH_DETAIL preset, left-right check, subpixel) — this
is the producer of the RGB-D stream nvblox consumes (reference
run_pipeline.py:166-292).

TPU shaping:

* census transform and the XOR-popcount cost volume are dense VPU work;
* path aggregation runs as `lax.scan` along image axes with the whole
  cross-section (rows x disparities) updated per step — the recurrence is
  inherently sequential per direction, but each step is a wide vector op;
* left-right consistency reuses the same cost volume re-indexed for the
  right view (no second aggregation);
* subpixel refinement is a parabola fit on the aggregated costs.

Everything is fixed-shape; invalid pixels carry disparity 0 and a False
mask bit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from thor_slam_tpu.ops.match import popcount_u32
from thor_slam_tpu.utils.platform import pallas_backend

# Python scalar, NOT jnp.float32: module-level device arrays captured in
# executables poison h2d throughput on hosted TPUs (see ops/match.py).
_BIG = 1e9


def census_transform(image: jnp.ndarray, window: int = 5) -> jnp.ndarray:
    """Census transform: each pixel -> bitstring of (neighbor < center).

    Args:
        image: (H, W) float32.
        window: Odd window side; window*window - 1 must be <= 32.

    Returns:
        (H, W) uint32 census codes (border uses edge-replicated neighbors).
    """
    r = window // 2
    assert window * window - 1 <= 32, "census window too large for uint32"
    h, w = image.shape
    padded = jnp.pad(image, r, mode="edge")
    code = jnp.zeros((h, w), dtype=jnp.uint32)
    bit = 0
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            if dy == 0 and dx == 0:
                continue
            neighbor = padded[r + dy : r + dy + h, r + dx : r + dx + w]
            code = code | (neighbor < image).astype(jnp.uint32) << jnp.uint32(bit)
            bit += 1
    return code


def census_cost_volume(census_l: jnp.ndarray, census_r: jnp.ndarray, num_disparities: int) -> jnp.ndarray:
    """(D, H, W) float32 Hamming costs; cost[d, y, x] = ham(L[y,x], R[y,x-d]).

    Out-of-frame comparisons (x < d) get the worst-case cost so they never
    win, but remain finite for SGM smoothing.
    """
    h, w = census_l.shape
    costs = []
    max_cost = jnp.float32(32.0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    for d in range(num_disparities):
        shifted = jnp.pad(census_r, ((0, 0), (d, 0)), mode="edge")[:, :w]
        c = popcount_u32(census_l ^ shifted).astype(jnp.float32)
        costs.append(jnp.where(xs >= d, c, max_cost))
    return jnp.stack(costs)


def _sgm_scan_one_direction(
    cost_dhw: jnp.ndarray,
    p1: float,
    p2: float,
    axis: int,
    reverse: bool,
    block: int = 64,
    halo: int = 16,
) -> jnp.ndarray:
    """Aggregate SGM costs along one image axis (overlapped-block parallel).

    The exact SGM recurrence is sequential along the path, which makes the
    naive `lax.scan` latency-bound on TPU (one tiny step per pixel column).
    SGM's normalization (subtracting the running min) saturates path
    influence within ~P2/P1 pixels, so the standard accelerator trick
    applies: split the path into blocks scanned IN PARALLEL, each warmed up
    with a `halo` of preceding pixels whose outputs are discarded. With
    halo >= ~16 the result is indistinguishable from the exact scan (the
    test suite checks disparity agreement), and sequential depth drops from
    the image dimension to ``halo + block``.

    Args:
        cost_dhw: (D, H, W) matching costs.
        p1: Small-jump penalty (|dd| = 1).
        p2: Large-jump penalty (|dd| > 1).
        axis: 1 to sweep down rows (vertical paths), 2 to sweep columns.
        reverse: Sweep in the decreasing-index direction.
        block: Pixels per parallel block (static).
        halo: Warm-up pixels per block (static).

    Returns:
        (D, H, W) aggregated path costs L_r.
    """
    # Move the swept axis to the scan dimension: (steps, D, cross).
    if axis == 2:
        seq = jnp.moveaxis(cost_dhw, 2, 0)  # (W, D, H)
    else:
        seq = jnp.moveaxis(cost_dhw, 1, 0)  # (H, D, W)
    if reverse:
        seq = seq[::-1]

    steps, d, cross = seq.shape
    # Penalties/sentinel follow the cost dtype so the scan carry stays in it
    # (bf16 aggregation halves the dominant HBM traffic; see sgm_disparity).
    dt = cost_dhw.dtype
    p1 = jnp.asarray(p1, dt)
    p2 = jnp.asarray(p2, dt)
    big = jnp.asarray(_BIG, dt)

    nb = -(-steps // block)
    pad_back = nb * block - steps
    # Front edge-padding warms up block 0 exactly like a path start; back
    # padding is sliced away.
    padded = jnp.concatenate(
        [jnp.repeat(seq[:1], halo, axis=0), seq, jnp.repeat(seq[-1:], pad_back, axis=0)],
        axis=0,
    )  # (halo + nb*block + ?, D, cross)

    # blocks[i, b] = padded[b*block + i] for i in [0, halo+block).
    idx = (jnp.arange(nb) * block)[None, :] + jnp.arange(halo + block)[:, None]
    blocked = padded[idx.reshape(-1)].reshape(halo + block, nb, d, cross)

    def step(prev_l, c):
        # prev_l: (nb, D, cross) running costs for every block in parallel.
        prev_min = jnp.min(prev_l, axis=1, keepdims=True)
        up = jnp.concatenate([prev_l[:, 1:], jnp.full_like(prev_l[:, :1], big)], axis=1)
        down = jnp.concatenate([jnp.full_like(prev_l[:, :1], big), prev_l[:, :-1]], axis=1)
        best = jnp.minimum(jnp.minimum(prev_l, jnp.minimum(up, down) + p1), prev_min + p2)
        l = (c + best - prev_min).astype(dt)
        return l, l

    _, out = jax.lax.scan(step, blocked[0], blocked[1:])
    out = jnp.concatenate([blocked[:1], out], axis=0)  # (halo+block, nb, D, cross)

    # Keep each block's non-halo outputs, reassemble, trim the back padding.
    out = out[halo:].transpose(1, 0, 2, 3).reshape(nb * block, d, cross)[:steps]

    if reverse:
        out = out[::-1]
    if axis == 2:
        return jnp.moveaxis(out, 0, 2)
    return jnp.moveaxis(out, 0, 1)


@partial(jax.jit, static_argnames=("num_disparities", "num_paths", "p1", "p2"))
def sgm_disparity(
    left: jnp.ndarray,
    right: jnp.ndarray,
    num_disparities: int = 64,
    p1: float = 6.0,
    p2: float = 96.0,
    num_paths: int = 4,
    lr_threshold: float = 1.25,
    uniqueness: float = 0.95,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Semi-global matching disparity for a rectified pair.

    Args:
        left: (H, W) float32 rectified left image in [0, 1].
        right: (H, W) float32 rectified right image.
        num_disparities: Disparity search range D (static).
        p1: SGM small-change penalty (census-cost units).
        p2: SGM discontinuity penalty.
        num_paths: 2 (horizontal) or 4 (+vertical) aggregation directions.
        lr_threshold: Max |d_L(x) - d_R(x - d_L)| for the consistency check.
        uniqueness: Reject if best cost > uniqueness * second-best.

    Returns:
        (disparity, valid): (H, W) float32 subpixel disparities (0 where
        invalid) and the (H, W) bool validity mask.
    """
    cl = census_transform(left)
    cr = census_transform(right)
    cost = census_cost_volume(cl, cr, num_disparities)  # (D, H, W)

    # Path aggregation runs in bfloat16: census costs are integers <= 24 and
    # the per-path running cost is bounded by max(cost) + p2 (~120), well
    # inside bf16's exact-integer range (256) — so for integral penalties the
    # bf16 scans are EXACT, at half the HBM traffic of f32 (the dominant cost
    # at 720p: measured 69 -> 43 ms at D=96). Only the 4-direction sum can
    # exceed 256, so directions accumulate in f32. Exactness needs integral
    # penalties and the running-cost bound inside 256; otherwise (custom
    # penalties) stay in f32 — p1/p2 are trace-time constants, so this
    # branch costs nothing.
    exact_in_bf16 = p1 == int(p1) and p2 == int(p2) and 24 + p2 < 250
    cost16 = cost.astype(jnp.bfloat16) if exact_in_bf16 else cost

    # On TPU the aggregation runs as the Pallas streaming scan (exact
    # recurrence, one HBM pass per direction; measured 29 -> 9 ms for all
    # four directions at 720p/96). The XLA blocked-halo scan remains the
    # CPU / odd-geometry / f32 fallback.
    use_pallas = exact_in_bf16 and pallas_backend()
    if use_pallas:
        from thor_slam_tpu.ops import sgm_pallas

        use_pallas = sgm_pallas.supported_for(num_disparities, *left.shape)
    if use_pallas:
        from thor_slam_tpu.ops import sgm_pallas

        agg = sgm_pallas.sgm_aggregate_4dir(cost16, p1, p2, num_paths=num_paths)
    else:
        agg = _sgm_scan_one_direction(cost16, p1, p2, axis=2, reverse=False).astype(jnp.float32)
        agg = agg + _sgm_scan_one_direction(cost16, p1, p2, axis=2, reverse=True).astype(jnp.float32)
        if num_paths >= 4:
            agg = agg + _sgm_scan_one_direction(cost16, p1, p2, axis=1, reverse=False).astype(
                jnp.float32
            )
            agg = agg + _sgm_scan_one_direction(cost16, p1, p2, axis=1, reverse=True).astype(
                jnp.float32
            )

    h, w = left.shape
    use_winner = use_pallas and h % 16 == 0 and num_disparities <= 128
    if use_winner:
        from thor_slam_tpu.ops import sgm_pallas

        # One fused volume pass: winner, at_disp-clipped parabola
        # neighbors, second-best outside +/-1, and the right-view winner at
        # each left match (the XLA tail below spreads this over ~8 volume
        # passes plus two (D, H, W) materializations).
        d_best, c0, cm, cp, second, d_r_at = sgm_pallas.winner_lr(agg, num_disparities)
    else:
        d_best = jnp.argmin(agg, axis=0)  # (H, W)

        # Per-pixel volume reads as one-hot reductions over D (XLA gathers
        # are scalar-bound on TPU; a D-wide masked min/sum is pure VPU
        # bandwidth).
        d_idx = jax.lax.broadcasted_iota(jnp.int32, agg.shape, 0)

        def at_disp(vol, d):
            dc = jnp.clip(d, 0, num_disparities - 1)
            onehot = d_idx == dc[None]
            return jnp.sum(jnp.where(onehot, vol, 0.0), axis=0)

        c0 = at_disp(agg, d_best)
        cm = at_disp(agg, d_best - 1)
        cp = at_disp(agg, d_best + 1)

        # Uniqueness: best must beat the second-best (outside +/-1) clearly.
        masked = jnp.where(jnp.abs(d_idx - d_best[None]) <= 1, _BIG, agg)
        second = jnp.min(masked, axis=0)

        # Left-right check from the same volume: cost_R[d, y, x] =
        # cost_L[d, y, x + d] — a per-disparity SHIFT, expressed as D static
        # slices (a take_along_axis here is a whole-volume gather: measured
        # ~160 ms).
        agg_r = jnp.stack(
            [
                jnp.concatenate([agg[dd, :, dd:], jnp.full((h, dd), _BIG)], axis=1)
                for dd in range(num_disparities)
            ]
        )
        d_best_r = jnp.argmin(agg_r, axis=0)  # (H, W) right-image disparities
        # For each left pixel: right-view disparity at (x - d_L). Shift each
        # candidate disparity's map right by d and select (static slices).
        d_r_shifted = jnp.stack(
            [
                jnp.concatenate(
                    [jnp.zeros((h, dd), d_best_r.dtype), d_best_r[:, : w - dd]], axis=1
                )
                for dd in range(num_disparities)
            ]
        )  # (D, H, W): d_r_shifted[d, y, x] = d_best_r[y, x - d]
        onehot_best = d_idx == d_best[None]
        d_r_at = jnp.sum(jnp.where(onehot_best, d_r_shifted, 0), axis=0)

    # Subpixel parabola: offset = (cm - cp) / (2*(cm - 2c0 + cp)).
    denom = cm - 2.0 * c0 + cp
    offset = jnp.where(jnp.abs(denom) > 1e-6, 0.5 * (cm - cp) / jnp.maximum(denom, 1e-6), 0.0)
    offset = jnp.clip(offset, -0.5, 0.5)
    disp = d_best.astype(jnp.float32) + jnp.where(
        (d_best > 0) & (d_best < num_disparities - 1), offset, 0.0
    )

    unique_ok = c0 <= uniqueness * second
    lr_ok = jnp.abs(d_best - d_r_at) <= lr_threshold
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    in_range = xs >= d_best  # matched pixel inside the right image
    valid = unique_ok & lr_ok & in_range & (d_best > 0)
    return jnp.where(valid, disp, 0.0), valid


def refine_disparity_photometric(
    left: jnp.ndarray,
    right: jnp.ndarray,
    xy_left: jnp.ndarray,
    disparity: jnp.ndarray,
    valid: jnp.ndarray,
    patch_radius: int = 3,
) -> jnp.ndarray:
    """Subpixel disparity via parabola on patch SAD along the epipolar line.

    For each keypoint, compares the left patch against right patches at
    integer disparities d-1, d, d+1 and fits a parabola — lifting
    feature-match disparities (integer-ish) to ~0.1 px precision.

    Args:
        left: (H, W) rectified left image.
        right: (H, W) rectified right image.
        xy_left: (N, 2) left keypoint positions.
        disparity: (N,) coarse disparities.
        valid: (N,) mask.

    Returns:
        (N,) refined disparities (coarse value kept where refinement is
        ill-conditioned or the slot is invalid).
    """
    from thor_slam_tpu.ops.image import extract_patches_mxu

    h, w = left.shape
    r = patch_radius
    x0 = jnp.clip(jnp.round(xy_left[:, 0]).astype(jnp.int32), r + 1, w - r - 2)
    y0 = jnp.clip(jnp.round(xy_left[:, 1]).astype(jnp.int32), r, h - r - 1)
    d0 = jnp.round(disparity).astype(jnp.int32)

    lpatch = extract_patches_mxu(left, jnp.stack([x0, y0], -1), 2 * r + 1)

    def sad_at(offset):
        xr = jnp.clip(x0 - d0 + offset, r, w - r - 1)
        rp = extract_patches_mxu(right, jnp.stack([xr, y0], -1), 2 * r + 1)
        return jnp.sum(jnp.abs(lpatch - rp), axis=(1, 2))

    s_m = sad_at(-1)  # disparity d0 + 1 (right sample shifted left)
    s_0 = sad_at(0)
    s_p = sad_at(1)  # disparity d0 - 1
    denom = s_m - 2.0 * s_0 + s_p
    # Minimum of the parabola through (d0+1, s_m), (d0, s_0), (d0-1, s_p):
    # offset in +disparity direction = 0.5 * (s_p - s_m) / denom.
    off = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (s_p - s_m) / jnp.where(jnp.abs(denom) > 1e-9, denom, 1.0), 0.0)
    off = jnp.clip(off, -1.0, 1.0)
    refined = d0.astype(jnp.float32) + off
    ok = valid & (s_0 <= s_m) & (s_0 <= s_p)
    return jnp.where(ok, refined, disparity)


def disparity_to_depth(disparity: jnp.ndarray, valid: jnp.ndarray, fx: float, baseline_m: float) -> jnp.ndarray:
    """Depth map (meters) from disparity; invalid pixels get 0."""
    z = fx * baseline_m / jnp.maximum(disparity, 1e-6)
    return jnp.where(valid, z, 0.0)


def depth_to_millimeters_u16(depth_m: jnp.ndarray) -> jnp.ndarray:
    """Depth (m) -> 16UC1 millimeters, the nvblox feed encoding
    (reference run_pipeline.py:247-252)."""
    return jnp.clip(jnp.round(depth_m * 1000.0), 0.0, 65535.0).astype(jnp.uint16)
