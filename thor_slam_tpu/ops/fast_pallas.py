"""Fused FAST-9 corner response + 3x3 NMS as a Pallas TPU kernel.

The XLA formulation in :mod:`thor_slam_tpu.ops.fast` materializes the 16
shifted circle views (16 x H x W f32) plus bright/dark masks — ~50 MB of
HBM traffic per 720p image for what is a single-pass stencil. This kernel
streams row tiles HBM -> VMEM once and keeps everything else in registers/
VMEM:

* the 16 circle comparisons accumulate into ONE packed int32 bitmask per
  pixel (bright bits 0-15, dark bits 16-31) — no mask tensors;
* the FAST-9 contiguous-arc test runs as 4 rounds of bitwise rotate-AND
  (log-doubling over run lengths) instead of 128 boolean ANDs;
* the corner score and its 3x3 NMS are fused into the same pass, so the
  dense response never round-trips to HBM between detection stages.

Replaces the detection stage of cuVSLAM (closed CUDA; reference
launch/thor_visual_slam.launch.py:30-64) on the TPU hot path. The XLA
implementation remains the reference/CPU fallback; equivalence is asserted
in tests/test_fast_pallas.py (interpret mode) and on hardware by
scripts/profile_stages.py.

Semantics vs the XLA reference: scores within :data:`BORDER` (4 px) of the
image edge are zero (the tile halo does not extend past the image; the
detector masks a >= 20 px border anyway), and the circle reads wrap at the
left/right image edge inside that same zeroed border. Interior pixels are
bit-exact.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from thor_slam_tpu.ops.fast import ARC_LENGTH, CIRCLE_OFFSETS

BORDER = 4  # zeroed frame: circle radius 3 + 1 row of NMS context
_HALO = 8  # row halo; 8 (not 4) so the tile offset stays sublane-aligned


def pick_tile_h(height: int) -> int | None:
    """Row-tile size for ``height``, or None if the kernel can't run.

    Single tile for small images; otherwise a divisor of ``height`` so the
    clamped halo only ever bites at the (zeroed) image border. Multiples of
    8 keep f32 sublane tiling aligned.
    """
    if height % 8 != 0:
        return None
    if height <= 272:
        return height
    for tile in range(160, 63, -8):
        if height % tile == 0:
            return tile
    return None


def supports(height: int, width: int) -> bool:
    """True when the Pallas kernel can handle this image shape."""
    # Lane-axis rolls require a 128-multiple width (VPU register layout);
    # non-conforming shapes fall back to the XLA path.
    return width % 128 == 0 and pick_tile_h(height) is not None


def _rot16(v: jnp.ndarray, k: int) -> jnp.ndarray:
    """Circular rotate of the low 16 bits: result bit i = v bit (i+k)%16."""
    mask = jnp.int32(0xFFFF)
    return ((v >> jnp.int32(k)) | (v << jnp.int32(16 - k))) & mask


def _has_arc16(m: jnp.ndarray) -> jnp.ndarray:
    """FAST-9 arc test on a packed 16-bit circle mask via log-doubling.

    r_k bit i == "run of >= k set bits starting at circle point i";
    9 = 8 + 1 composes from doublings of the base mask.
    """
    assert ARC_LENGTH == 9
    r2 = m & _rot16(m, 1)
    r4 = r2 & _rot16(r2, 2)
    r8 = r4 & _rot16(r4, 4)
    r9 = r8 & _rot16(m, 8)
    return r9 != 0


def _roll2(v: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """out[y, x] = v[(y+dy) % H, (x+dx) % W] with non-negative pltpu shifts."""
    h, w = v.shape
    if dy:
        v = pltpu.roll(v, shift=(h - dy) % h, axis=0)
    if dx:
        v = pltpu.roll(v, shift=(w - dx) % w, axis=1)
    return v


def _fast_kernel(
    thr_ref, img_hbm, raw_ref, nms_ref, blk, raw_s, nms_s, sem, *, tile_h, height, width
):
    cam = pl.program_id(0)
    i = pl.program_id(1)
    bh = tile_h + 2 * _HALO if pl.num_programs(1) > 1 else tile_h

    if pl.num_programs(1) > 1:
        start = pl.multiple_of(jnp.clip(i * tile_h - _HALO, 0, height - bh), 8)
    else:
        start = 0
    # 0 (first tile), _HALO (interior), 2*_HALO (last) — all sublane-aligned.
    off = pl.multiple_of(i * tile_h - start, 8)

    copy = pltpu.make_async_copy(
        img_hbm.at[cam, pl.ds(start, bh), :], blk.at[pl.ds(0, bh)], sem
    )
    copy.start()
    copy.wait()

    img = blk[pl.ds(0, bh)]
    thr = thr_ref[0]

    pack = jnp.zeros(img.shape, dtype=jnp.int32)
    excess_b = jnp.zeros(img.shape, dtype=jnp.float32)
    excess_d = jnp.zeros(img.shape, dtype=jnp.float32)
    def _bit(b: int) -> jnp.ndarray:  # signed-wrapped int32 constant 1 << b
        return jnp.int32((1 << b) - (1 << 32) if b == 31 else 1 << b)

    for idx, (dy, dx) in enumerate(CIRCLE_OFFSETS):
        d = _roll2(img, dy, dx) - img
        pack = pack | jnp.where(d > thr, _bit(idx), jnp.int32(0))
        pack = pack | jnp.where(d < -thr, _bit(idx + 16), jnp.int32(0))
        excess_b = excess_b + jnp.maximum(d - thr, 0.0)
        excess_d = excess_d + jnp.maximum(-d - thr, 0.0)

    mask16 = jnp.int32(0xFFFF)
    corner = _has_arc16(pack & mask16) | _has_arc16((pack >> jnp.int32(16)) & mask16)
    raw = jnp.where(corner, jnp.maximum(excess_b, excess_d), 0.0)

    local_max = raw
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy or dx:
                local_max = jnp.maximum(local_max, _roll2(raw, dy, dx))
    nms = jnp.where(raw >= local_max, raw, 0.0)

    # Zero the image-border frame (halo wrap / missing context lives there).
    gy = start + jax.lax.broadcasted_iota(jnp.int32, img.shape, 0)
    gx = jax.lax.broadcasted_iota(jnp.int32, img.shape, 1)
    interior = (
        (gy >= BORDER) & (gy < height - BORDER) & (gx >= BORDER) & (gx < width - BORDER)
    )
    # Mosaic has no value-level dynamic_slice; stage through VMEM scratch
    # refs and use pl.ds ref indexing for the halo-offset extraction.
    raw_s[pl.ds(0, bh)] = jnp.where(interior, raw, 0.0)
    nms_s[pl.ds(0, bh)] = jnp.where(interior, nms, 0.0)
    raw_ref[0] = raw_s[pl.ds(off, tile_h)]
    nms_ref[0] = nms_s[pl.ds(off, tile_h)]


@partial(jax.jit, static_argnames=("interpret",))
def fast_scores_batched(
    images: jnp.ndarray, threshold: jnp.ndarray | float, interpret: bool = False
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(C, H, W) images -> (raw, nms) dense FAST-9 response maps.

    Requires :func:`supports`(H, W); callers fall back to the XLA path
    otherwise (see :func:`thor_slam_tpu.ops.fast.detect_keypoints_batched`).
    """
    c, height, width = images.shape
    tile_h = pick_tile_h(height)
    if tile_h is None or width % 128 != 0:
        raise ValueError(f"unsupported shape for the Pallas FAST kernel: {images.shape}")
    n_tiles = height // tile_h
    bh = tile_h + 2 * _HALO if n_tiles > 1 else tile_h

    thr = jnp.asarray(threshold, jnp.float32).reshape(1)
    kernel = partial(_fast_kernel, tile_h=tile_h, height=height, width=width)
    # Index maps receive the scalar-prefetch refs as trailing args.
    out_spec = pl.BlockSpec(
        (1, tile_h, width), lambda cam, i, *_: (cam, i, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(out_spec, out_spec),
        scratch_shapes=[
            pltpu.VMEM((bh, width), jnp.float32),
            pltpu.VMEM((bh, width), jnp.float32),
            pltpu.VMEM((bh, width), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    shape = jax.ShapeDtypeStruct(images.shape, jnp.float32)
    raw, nms = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(shape, shape),
        interpret=interpret,
    )(thr, images.astype(jnp.float32))
    return raw, nms
