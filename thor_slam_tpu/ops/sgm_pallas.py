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


@partial(jax.jit, static_argnames=("p1", "p2", "reverse", "step_block", "interpret"))
def sgm_aggregate_dir(
    cost_sdx: jnp.ndarray,
    p1: float,
    p2: float,
    reverse: bool,
    step_block: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Exact SGM path aggregation along axis 0 of a (S, D, X) bf16 volume.

    Args:
        cost_sdx: (S, D, X) bfloat16 matching costs, step-major.
        p1: Small-jump penalty (|dd| = 1); must be integral for exactness.
        p2: Large-jump penalty.
        reverse: Aggregate along decreasing step index.
        step_block: Steps per grid chunk (static; must divide S).
        interpret: Run in interpreter mode (tests).

    Returns:
        (S, D, X) bfloat16 aggregated path costs L_r.
    """
    s, d, x = cost_sdx.shape
    assert cost_sdx.dtype == jnp.bfloat16
    if not supports(d, s, x, step_block):
        raise ValueError(f"unsupported SGM geometry: S={s}, D={d}, X={x}, block={step_block}")
    nx = pl.cdiv(x, _LANES)
    nc = s // step_block

    kernel = partial(_scan_kernel, step_block=step_block, reverse=reverse, p1=p1, p2=p2)

    def idx(i, j):
        # X tiles on the outer (parallel) axis; step chunks sequential on
        # the inner axis so the carry walks the path. Reverse walks the
        # chunks back-to-front (and the kernel its steps).
        jj = nc - 1 - j if reverse else j
        return (jj, 0, i)

    return pl.pallas_call(
        kernel,
        grid=(nx, nc),
        in_specs=[
            pl.BlockSpec((step_block, d, _LANES), idx, memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((step_block, d, _LANES), idx, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s, d, x), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((d, _LANES), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(cost_sdx)


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
    fb = _pick_block(w)
    agg = sgm_aggregate_dir(cost_wdh, p1, p2, False, fb, interpret).astype(jnp.float32)
    agg = agg + sgm_aggregate_dir(cost_wdh, p1, p2, True, fb, interpret).astype(jnp.float32)
    agg = agg.transpose(1, 2, 0)  # (W, D, H) -> (D, H, W)
    if num_paths >= 4:
        cost_hdw = cost_dhw.transpose(1, 0, 2)
        vb = _pick_block(h)
        v = sgm_aggregate_dir(cost_hdw, p1, p2, False, vb, interpret).astype(jnp.float32)
        v = v + sgm_aggregate_dir(cost_hdw, p1, p2, True, vb, interpret).astype(jnp.float32)
        agg = agg + v.transpose(1, 0, 2)  # (H, D, W) -> (D, H, W)
    return agg


def _pick_block(steps: int) -> int:
    """Largest chunk <= 160 dividing the path length (VMEM-bounded)."""
    for b in range(min(steps, 160), 0, -1):
        if steps % b == 0:
            return b
    return 1


def supported_for(num_disparities: int, height: int, width: int) -> bool:
    """Geometry gate used by :func:`thor_slam_tpu.ops.stereo.sgm_disparity`."""
    return (
        num_disparities % 16 == 0
        and _pick_block(width) >= 32
        and _pick_block(height) >= 32
    )
