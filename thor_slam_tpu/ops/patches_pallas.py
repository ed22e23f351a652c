"""Per-keypoint patch extraction as Pallas DMA gathers.

The descriptor front-end needs an (N, S, S) patch tensor at keypoint
centers. XLA offers two bad options on TPU: `gather` (scalar-unit bound,
~1e8 elem/s) or the one-hot-matmul trick in
:func:`thor_slam_tpu.ops.image.extract_patches_mxu` — exact and MXU-fast,
but it burns ``2*N*S*H*W`` MACs to move ``N*S*S`` floats (~280 GFLOP per
keyframe tick at 4x720p/256 kp). The hardware-native answer is the DMA
engine: each patch is a small strided HBM->VMEM copy at a runtime offset,
exactly what `PrefetchScalarGridSpec` scalar prefetch + `make_async_copy`
express. This kernel issues a block of patch DMAs per program (latency
overlapped), then aligns each patch with two on-chip rolls.

Alignment strategy (Mosaic requires provably tiled slice offsets):

* rows: DMA from the 8-aligned row below the patch start and roll the
  extra rows off (``R - S >= 8`` slack);
* lanes: DMA a 128-aligned 256-lane window containing the patch columns
  and roll the intra-window offset off.

Output is (C, N, ROWS_OUT, 128) with the patch at ``[:, :, :S, :S]`` —
callers slice; the padding keeps every tile shape aligned.

Replaces the patch-gather stage of cuVSLAM's descriptor pipeline (closed
CUDA; reference launch/thor_visual_slam.launch.py:30-64) on the TPU hot
path; :func:`extract_patches_mxu` remains the CPU/odd-shape fallback.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_KP_BLOCK = 8  # patches gathered per grid program (DMAs issued together)
_LANES = 256  # DMA window width: any <=128-col patch fits at any offset


def _read_rows(size: int) -> int:
    """DMA window height: 8-aligned with >= 8 rows of alignment slack."""
    return ((size + 8) + 7) // 8 * 8


def rows_out(size: int) -> int:
    """Output sublane count (8-aligned padding above ``size``)."""
    return (size + 7) // 8 * 8


def supports(height: int, width: int, num_keypoints: int) -> bool:
    """True when the Pallas gather kernel can handle this geometry."""
    return (
        height % 8 == 0
        and height >= _read_rows(37)
        and width % 128 == 0
        and width >= _LANES
        and num_keypoints % _KP_BLOCK == 0
    )


def _gather_kernel(
    ry_al_ref, ry_off_ref, cx_al_ref, cx_off_ref, img_hbm, out_ref, blk, sem, *,
    size, read_rows, out_rows, num_kp,
):
    cam = pl.program_id(0)
    g = pl.program_id(1)
    base = cam * num_kp + g * _KP_BLOCK

    def dma(k):
        ry = pl.multiple_of(ry_al_ref[base + k], 8)
        cx = pl.multiple_of(cx_al_ref[base + k], 128)
        return pltpu.make_async_copy(
            img_hbm.at[cam, pl.ds(ry, read_rows), pl.ds(cx, _LANES)],
            blk.at[k],
            sem.at[k],
        )

    for k in range(_KP_BLOCK):
        dma(k).start()
    for k in range(_KP_BLOCK):
        dma(k).wait()
        v = blk[k]
        v = pltpu.roll(v, shift=(read_rows - ry_off_ref[base + k]) % read_rows, axis=0)
        v = pltpu.roll(v, shift=(_LANES - cx_off_ref[base + k]) % _LANES, axis=1)
        out_ref[0, k] = v[:out_rows, :128]


@partial(jax.jit, static_argnames=("size", "interpret"))
def extract_patches_batched(
    images: jnp.ndarray,
    centers: jnp.ndarray,
    size: int = 37,
    interpret: bool = False,
) -> jnp.ndarray:
    """(C, H, W) images + (C, N, 2) integer (x, y) centers -> patches.

    Returns (C, N, S, S) float32, S = ``size`` (odd). Matches
    :func:`thor_slam_tpu.ops.image.extract_patches_mxu` semantics exactly:
    centers are clipped so patches lie fully inside the image.
    """
    c, height, width = images.shape
    n = centers.shape[1]
    if not supports(height, width, n):
        raise ValueError(f"unsupported geometry for Pallas patch gather: {images.shape}, N={n}")
    r = size // 2
    read = _read_rows(size)
    out_r = rows_out(size)

    cx = jnp.clip(centers[:, :, 0], r, width - r - 1).astype(jnp.int32)
    cy = jnp.clip(centers[:, :, 1], r, height - r - 1).astype(jnp.int32)
    ry = cy - r  # top row, in [0, H - S]
    ry_al = jnp.minimum((ry >> 3) << 3, height - read)  # H % 8 == 0 keeps this 8-aligned
    cx0 = cx - r  # left col, in [0, W - S]
    cx_al = jnp.clip((cx0 >> 7) << 7, 0, width - _LANES)

    kernel = partial(
        _gather_kernel, size=size, read_rows=read, out_rows=out_r, num_kp=n
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(c, n // _KP_BLOCK),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, _KP_BLOCK, out_r, 128),
            lambda cam, g, *_: (cam, g, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((_KP_BLOCK, read, _LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((_KP_BLOCK,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c, n, out_r, 128), jnp.float32),
        interpret=interpret,
    )(
        ry_al.reshape(-1),
        (ry - ry_al).reshape(-1),
        cx_al.reshape(-1),
        (cx0 - cx_al).reshape(-1),
        images.astype(jnp.float32),
    )
    return out[:, :, :size, :size]
