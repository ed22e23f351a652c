"""SGM path aggregation as a Pallas streaming scan.

The SGM recurrence
    L[x] = c[x] + min(L[x-1], L[x-1] +/- 1 disparity + P1, min L[x-1] + P2)
            - min(L[x-1])
is sequential along each image path. The XLA formulation
(:func:`thor_slam_tpu.ops.stereo._sgm_scan_one_direction`) makes it wide
enough for the VPU by scanning overlapped blocks in parallel, but pays for
it three ways: a halo warm-up re-computes ~25% of the volume, every
`lax.scan` step is a separate fused kernel over the whole cross-section
(HBM round trip per step), and the block gather/reassembly moves the
volume twice more. Measured at 720p/96 disparities: ~7.4 ms per direction,
~29 ms for all four.

The hardware-native answer: keep the running cost column L (one
(D, cross-tile) register tile) resident in VMEM and STREAM the cost volume
through it — one HBM read of the volume, one HBM write of the aggregated
volume, exact recurrence, no halo. The kernel walks chunks of steps with
the carry in VMEM scratch (the TPU grid is sequential, so scratch persists
across chunks); Pallas double-buffers the chunk DMAs automatically.

Layout: the volume arrives STEP-MAJOR, ``(S, D, X)`` — S = path length
(W for horizontal paths, H for vertical), X = the cross-section tiled over
lanes, D = disparities on sublanes. The caller transposes (one XLA
transpose each for the horizontal and vertical pair — sub-ms at 720p) and
transposes the output back.

Everything runs in bfloat16: census costs and the integral penalties keep
the normalized running cost an exact small integer (< 250, inside bf16's
exact-integer range — see sgm_disparity), at half the HBM traffic.

Replaces the path-aggregation stage of the OAK StereoDepth ASIC's SGM
(reference luxonis.py:513-536) on the TPU hot path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
# A value strictly above any reachable running cost (<= max census cost 32
# + P2 after normalization) but small enough that bf16 arithmetic with it
# stays finite. Python float, not a device array (see ops/match.py).
_BIG = 1024.0


def supports(num_disparities: int, steps: int, cross: int, step_block: int) -> bool:
    """True when the streaming kernel can handle this geometry."""
    return (
        num_disparities % 16 == 0  # bf16 sublane tiling of the (D, X) carry
        and steps % step_block == 0
        and cross >= 1
    )


def _scan_kernel(cost_ref, out_ref, carry, *, step_block, reverse, p1, p2):
    """One (steps-chunk, D, X-tile) block: run the recurrence over steps.

    carry: (D, TX) VMEM scratch — the running path cost L for this X tile,
    persisted across the (sequential) steps-chunk grid dimension.
    """
    first_chunk = pl.program_id(1) == 0

    # A UNIFORM carry makes the first step exact: best - min == 0, so
    # L[0] == c[0] without a special case.
    @pl.when(first_chunk)
    def _():
        carry[:] = jnp.zeros_like(carry)

    p1 = jnp.bfloat16(p1)
    p2 = jnp.bfloat16(p2)
    big = jnp.full((1, carry.shape[1]), _BIG, carry.dtype)

    def body(i, _):
        xi = step_block - 1 - i if reverse else i
        c = cost_ref[xi]  # (D, TX)
        prev = carry[:]
        prev_min = jnp.min(prev, axis=0, keepdims=True)
        up = jnp.concatenate([prev[1:], big], axis=0)
        down = jnp.concatenate([big, prev[:-1]], axis=0)
        best = jnp.minimum(jnp.minimum(prev, jnp.minimum(up, down) + p1), prev_min + p2)
        l = c + (best - prev_min)
        carry[:] = l
        out_ref[xi] = l
        return 0

    jax.lax.fori_loop(0, step_block, body, 0)


def _scan_add_kernel(cost_ref, add_ref, out_ref, carry, *, step_block, reverse, p1, p2):
    """:func:`_scan_kernel` that also adds a same-layout volume into the
    output — fuses the opposite direction's result into this pass, so a
    forward/backward pair costs no separate sum round trip. The pair sum of
    two <=128 integral costs stays exact in bf16 (<= 256)."""
    first_chunk = pl.program_id(1) == 0

    @pl.when(first_chunk)
    def _():
        carry[:] = jnp.zeros_like(carry)

    p1 = jnp.bfloat16(p1)
    p2 = jnp.bfloat16(p2)
    big = jnp.full((1, carry.shape[1]), _BIG, carry.dtype)

    def body(i, _):
        xi = step_block - 1 - i if reverse else i
        c = cost_ref[xi]
        prev = carry[:]
        prev_min = jnp.min(prev, axis=0, keepdims=True)
        up = jnp.concatenate([prev[1:], big], axis=0)
        down = jnp.concatenate([big, prev[:-1]], axis=0)
        best = jnp.minimum(jnp.minimum(prev, jnp.minimum(up, down) + p1), prev_min + p2)
        l = c + (best - prev_min)
        carry[:] = l
        out_ref[xi] = l + add_ref[xi]
        return 0

    jax.lax.fori_loop(0, step_block, body, 0)


@partial(jax.jit, static_argnames=("p1", "p2", "reverse", "step_block", "interpret"))
def sgm_aggregate_dir(
    cost_sdx: jnp.ndarray,
    p1: float,
    p2: float,
    reverse: bool,
    step_block: int = 128,
    interpret: bool = False,
    add_to: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Exact SGM path aggregation along axis 0 of a (S, D, X) bf16 volume.

    Args:
        cost_sdx: (S, D, X) bfloat16 matching costs, step-major.
        p1: Small-jump penalty (|dd| = 1); must be integral for exactness.
        p2: Large-jump penalty.
        reverse: Aggregate along decreasing step index.
        step_block: Steps per grid chunk (static; must divide S).
        interpret: Run in interpreter mode (tests).
        add_to: Optional same-shape bf16 volume summed into the output
            in-kernel (the opposite direction's result) — saves the
            separate pair-sum round trip over HBM.

    Returns:
        (S, D, X) bfloat16 aggregated path costs L_r (+ ``add_to``).
    """
    s, d, x = cost_sdx.shape
    assert cost_sdx.dtype == jnp.bfloat16
    if not supports(d, s, x, step_block):
        raise ValueError(f"unsupported SGM geometry: S={s}, D={d}, X={x}, block={step_block}")
    nx = pl.cdiv(x, _LANES)
    nc = s // step_block

    def idx(i, j):
        # X tiles on the outer (parallel) axis; step chunks sequential on
        # the inner axis so the carry walks the path. Reverse walks the
        # chunks back-to-front (and the kernel its steps).
        jj = nc - 1 - j if reverse else j
        return (jj, 0, i)

    spec = pl.BlockSpec((step_block, d, _LANES), idx, memory_space=pltpu.VMEM)
    if add_to is None:
        kernel = partial(_scan_kernel, step_block=step_block, reverse=reverse, p1=p1, p2=p2)
        in_specs = [spec]
        args = (cost_sdx,)
    else:
        kernel = partial(_scan_add_kernel, step_block=step_block, reverse=reverse, p1=p1, p2=p2)
        in_specs = [spec, spec]
        args = (cost_sdx, add_to)
    return pl.pallas_call(
        kernel,
        grid=(nx, nc),
        in_specs=in_specs,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((s, d, x), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((d, _LANES), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)


def sgm_aggregate_4dir(
    cost_dhw: jnp.ndarray,
    p1: float,
    p2: float,
    num_paths: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    """All-direction aggregation of a (D, H, W) bf16 volume; f32 sum.

    The horizontal pair shares one (W, D, H) transpose, the vertical pair
    one (H, D, W) transpose. Exact (unlike the blocked-halo XLA fallback).
    """
    d, h, w = cost_dhw.shape
    cost_wdh = cost_dhw.transpose(2, 0, 1)
    # Each direction pair sums IN the reverse kernel (bf16-exact: two
    # <=128 integral costs), so only the two pair volumes cross HBM.
    fwd = sgm_aggregate_dir(cost_wdh, p1, p2, False, _pick_block(w, d, 2), interpret)
    pair_h = sgm_aggregate_dir(
        cost_wdh, p1, p2, True, _pick_block(w, d, 3), interpret, add_to=fwd
    )
    agg = pair_h.transpose(1, 2, 0).astype(jnp.float32)  # (W, D, H) -> (D, H, W)
    if num_paths >= 4:
        cost_hdw = cost_dhw.transpose(1, 0, 2)
        vf = sgm_aggregate_dir(cost_hdw, p1, p2, False, _pick_block(h, d, 2), interpret)
        pair_v = sgm_aggregate_dir(
            cost_hdw, p1, p2, True, _pick_block(h, d, 3), interpret, add_to=vf
        )
        agg = agg + pair_v.transpose(1, 0, 2).astype(jnp.float32)  # (H, D, W) -> (D, H, W)
    return agg


def _pick_block(steps: int, d: int, streams: int) -> int:
    """Largest chunk dividing the path length that fits VMEM.

    ``streams`` = distinct (block, D, 128) bf16 buffers the call keeps in
    flight (in/out [+ add], each double-buffered by the pipeline); budget
    ~14 MB of the 16 MB VMEM.
    """
    cap = int(14e6 // (2 * streams * d * _LANES * 2))
    for b in range(min(steps, cap, 256), 0, -1):
        if steps % b == 0:
            return b
    return 1


def supported_for(num_disparities: int, height: int, width: int) -> bool:
    """Geometry gate used by :func:`thor_slam_tpu.ops.stereo.sgm_disparity`."""
    return (
        num_disparities % 16 == 0
        and _pick_block(width, num_disparities, 3) >= 16
        and _pick_block(height, num_disparities, 3) >= 16
    )


# ---------------------------------------------------------------- winner/LR

_TH = 16  # rows per winner-kernel program
_WIN = 3 * _LANES  # DMA window width: covers TW + 2*(D-1) for D <= 128


def _winner_kernel(
    agg_hbm, db_ref, c0_ref, cm_ref, cp_ref, sec_ref, dra_ref, blk, sem, *, d
):
    """Fused disparity selection from one (D, TH, WIN) aggregated window.

    For the TW output columns of this program, one VMEM-resident window
    yields: the winning disparity, the parabola neighbors (clipped like
    ``at_disp``), the second-best outside +/-1 (uniqueness), AND the
    right-view winner at each left pixel's match (the left-right check) —
    work the XLA formulation spreads over ~8 full-volume passes and two
    extra (D, H, W) materializations.

    The input is the aggregated volume PADDED along W with D-1 leading and
    trailing _BIG columns, so every windowed read is in-bounds and the
    pad's argmin (0) reproduces the XLA fallback's zero-padded
    right-disparity semantics exactly.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    pltpu.make_async_copy(
        agg_hbm.at[:, pl.ds(i * _TH, _TH), pl.ds(j * _LANES, _WIN)], blk, sem
    ).start()
    pltpu.make_async_copy(
        agg_hbm.at[:, pl.ds(i * _TH, _TH), pl.ds(j * _LANES, _WIN)], blk, sem
    ).wait()

    tw = _LANES
    big = jnp.float32(_BIG * 8.0)

    # Pass A: winning disparity over the central TW columns.
    vb = jnp.full((_TH, tw), big, jnp.float32)
    db = jnp.zeros((_TH, tw), jnp.int32)
    for dd in range(d):
        v = blk[dd, :, d - 1 : d - 1 + tw]
        take = v < vb
        vb = jnp.where(take, v, vb)
        db = jnp.where(take, dd, db)

    # Pass B: parabola neighbors (at_disp-clipped) + second-best outside
    # +/-1 of the winner.
    dbm = jnp.maximum(db - 1, 0)
    dbp = jnp.minimum(db + 1, d - 1)
    c0 = jnp.zeros((_TH, tw), jnp.float32)
    cm = jnp.zeros((_TH, tw), jnp.float32)
    cp = jnp.zeros((_TH, tw), jnp.float32)
    sec = jnp.full((_TH, tw), big, jnp.float32)
    for dd in range(d):
        v = blk[dd, :, d - 1 : d - 1 + tw]
        c0 = jnp.where(db == dd, v, c0)
        cm = jnp.where(dbm == dd, v, cm)
        cp = jnp.where(dbp == dd, v, cp)
        sec = jnp.where(jnp.abs(db - dd) > 1, jnp.minimum(sec, v), sec)

    # Right-view winners for every column a left pixel can match:
    # dbr[w] = argmin_dd blk[dd, :, w + dd], local w in [0, D-1+TW).
    wr = d - 1 + tw
    vbr = jnp.full((_TH, wr), big, jnp.float32)
    dbr = jnp.zeros((_TH, wr), jnp.int32)
    for dd in range(d):
        v = blk[dd, :, dd : dd + wr]
        take = v < vbr
        vbr = jnp.where(take, v, vbr)
        dbr = jnp.where(take, dd, dbr)
    # Columns left of the image (x_r < 0) read the left pad, where larger
    # disparities still reach real data — but the XLA tail defines the
    # right-view disparity there as 0 (its zero-pad). Match it exactly;
    # these pixels are invalidated by in_range regardless.
    xr_global = j * tw - (d - 1) + jax.lax.broadcasted_iota(jnp.int32, (_TH, wr), 1)
    dbr = jnp.where(xr_global >= 0, dbr, 0)

    # d_r_at[y, x] = dbr[y, (D-1) + x - db[y, x]].
    dra = jnp.zeros((_TH, tw), jnp.int32)
    for dd in range(d):
        dra = jnp.where(db == dd, dbr[:, d - 1 - dd : d - 1 - dd + tw], dra)

    db_ref[:] = db
    c0_ref[:] = c0
    cm_ref[:] = cm
    cp_ref[:] = cp
    sec_ref[:] = sec
    dra_ref[:] = dra


@partial(jax.jit, static_argnames=("num_disparities", "interpret"))
def winner_lr(
    agg: jnp.ndarray, num_disparities: int, interpret: bool = False
) -> tuple[jnp.ndarray, ...]:
    """Disparity winners + LR-check data from a (D, H, W) f32 volume.

    Returns (d_best i32, c0, c_minus, c_plus, second f32, d_r_at i32), all
    (H, W) — everything :func:`thor_slam_tpu.ops.stereo.sgm_disparity`
    needs after aggregation, in one pass over the volume.
    """
    d, h, w = agg.shape
    if not (d == num_disparities and d % 8 == 0 and d <= 128 and h % _TH == 0):
        raise ValueError(f"unsupported winner geometry: D={d}, H={h}, W={w}")
    nw = pl.cdiv(w, _LANES)
    # Pad W so every (3*LANES)-wide window is in-bounds; _BIG columns never
    # win and reproduce the fallback's zero-pad LR semantics.
    w_ext = (nw - 1) * _LANES + _WIN
    agg_pad = jnp.pad(
        agg, ((0, 0), (0, 0), (d - 1, w_ext - w - (d - 1))), constant_values=_BIG * 8.0
    )

    out_shapes = [
        jax.ShapeDtypeStruct((h, w), jnp.int32),
        jax.ShapeDtypeStruct((h, w), jnp.float32),
        jax.ShapeDtypeStruct((h, w), jnp.float32),
        jax.ShapeDtypeStruct((h, w), jnp.float32),
        jax.ShapeDtypeStruct((h, w), jnp.float32),
        jax.ShapeDtypeStruct((h, w), jnp.int32),
    ]
    out_spec = pl.BlockSpec((_TH, _LANES), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_winner_kernel, d=d),
        grid=(h // _TH, nw),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[out_spec] * 6,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((d, _TH, _WIN), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(agg_pad)
