"""Per-keypoint patch extraction as Pallas DMA gathers.

The descriptor/KLT front-ends need (N, S, S) patch tensors at keypoint
centers. XLA offers two bad options on TPU: `gather` (scalar-unit bound,
~1e8 elem/s) or the one-hot-matmul trick in
:func:`thor_slam_tpu.ops.image.extract_patches_mxu` — exact and MXU-fast,
but it burns ``2*N*S*H*W`` MACs to move ``N*S*S`` floats (~280 GFLOP per
keyframe tick at 4x720p/256 kp, and the KLT window extraction repeats it
every tick at 3 pyramid levels x 2 frames). The hardware-native answer is
the DMA engine: each patch is a small strided HBM->VMEM copy at a runtime
offset, exactly what `PrefetchScalarGridSpec` scalar prefetch +
`make_async_copy` express. This kernel issues a block of patch DMAs per
program (latency overlapped), then aligns each patch with two on-chip
rolls.

The flat entry point takes a per-patch CAMERA INDEX, so a multi-camera
rig extracts all C*N patches in one `pallas_call` — no vmap-of-pallas,
and camera batching costs nothing.

Alignment strategy (Mosaic requires provably tiled slice offsets):

* rows: DMA from the 8-aligned row below the patch start and roll the
  extra rows off (``R - S >= 8`` slack);
* lanes: DMA a 128-aligned 256-lane window containing the patch columns
  and roll the intra-window offset off.

Replaces the patch-gather stages of cuVSLAM's descriptor + patch-tracking
pipeline (closed CUDA; reference launch/thor_visual_slam.launch.py:30-64)
on the TPU hot path; :func:`extract_patches_mxu` remains the CPU/
odd-shape fallback.
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


def supports(height: int, width: int, num_patches: int, size: int = 37) -> bool:
    """True when the Pallas gather kernel can handle this geometry."""
    return (
        height % 8 == 0
        and height >= _read_rows(size)
        and width % 128 == 0
        and width >= _LANES
        and num_patches % _KP_BLOCK == 0
        and size <= 128
    )


def _gather_kernel(
    cam_ref, ry_al_ref, ry_off_ref, cx_al_ref, cx_off_ref, img_hbm,
    out_ref, blk, sem, *, read_rows, out_rows,
):
    g = pl.program_id(0)
    base = g * _KP_BLOCK

    def dma(k):
        ry = pl.multiple_of(ry_al_ref[base + k], 8)
        cx = pl.multiple_of(cx_al_ref[base + k], 128)
        return pltpu.make_async_copy(
            img_hbm.at[cam_ref[base + k], pl.ds(ry, read_rows), pl.ds(cx, _LANES)],
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
def extract_patches_flat(
    images: jnp.ndarray,
    cam: jnp.ndarray,
    centers: jnp.ndarray,
    size: int = 37,
    interpret: bool = False,
) -> jnp.ndarray:
    """Gather (M, S, S) patches from (C, H, W) images at per-patch cameras.

    Args:
        images: (C, H, W) float32 source stack.
        cam: (M,) int32 camera index per patch.
        centers: (M, 2) integer (x, y) patch centers; clipped so patches lie
            fully inside the image (matching ``extract_patches_mxu``).
        size: Odd patch side length (static, <= 128).
        interpret: Run the kernel in interpreter mode (tests).

    Returns:
        (M, S, S) float32 patches.
    """
    _, height, width = images.shape
    m = centers.shape[0]
    if not supports(height, width, m, size):
        raise ValueError(
            f"unsupported geometry for Pallas patch gather: {images.shape}, M={m}, S={size}"
        )
    r = size // 2
    read = _read_rows(size)
    out_r = rows_out(size)

    cx = jnp.clip(centers[:, 0], r, width - r - 1).astype(jnp.int32)
    cy = jnp.clip(centers[:, 1], r, height - r - 1).astype(jnp.int32)
    ry = cy - r  # top row, in [0, H - S]
    ry_al = jnp.minimum((ry >> 3) << 3, height - read)  # H % 8 == 0 keeps this 8-aligned
    cx0 = cx - r  # left col, in [0, W - S]
    cx_al = jnp.clip((cx0 >> 7) << 7, 0, width - _LANES)

    kernel = partial(_gather_kernel, read_rows=read, out_rows=out_r)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(m // _KP_BLOCK,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, _KP_BLOCK, out_r, 128),
            lambda g, *_: (g, 0, 0, 0),
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
        out_shape=jax.ShapeDtypeStruct((m // _KP_BLOCK, _KP_BLOCK, out_r, 128), jnp.float32),
        interpret=interpret,
    )(
        cam.astype(jnp.int32),
        ry_al,
        ry - ry_al,
        cx_al,
        cx0 - cx_al,
        images.astype(jnp.float32),
    )
    return out.reshape(m, out_r, 128)[:, :size, :size]


@partial(jax.jit, static_argnames=("size", "interpret"))
def extract_patches_batched(
    images: jnp.ndarray,
    centers: jnp.ndarray,
    size: int = 37,
    interpret: bool = False,
) -> jnp.ndarray:
    """(C, H, W) images + (C, N, 2) centers -> (C, N, S, S) patches."""
    c, n = centers.shape[0], centers.shape[1]
    cam = jnp.repeat(jnp.arange(c, dtype=jnp.int32), n)
    flat = extract_patches_flat(
        images, cam, centers.reshape(c * n, 2), size=size, interpret=interpret
    )
    return flat.reshape(c, n, size, size)
