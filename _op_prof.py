"""Honest per-op TPU costs via dependent scan chains (one dispatch)."""
import time, sys
import jax, jax.numpy as jnp, numpy as np
from thor_slam_tpu.utils.platform import enable_compilation_cache
enable_compilation_cache()
from thor_slam_tpu.ops import brief, fast, klt, match
from thor_slam_tpu.ops.image import extract_patches_mxu, gaussian_blur, downsample2

C, N, H, W = 4, 512, 720, 1280
K = 50  # chain length
rng = np.random.default_rng(0)
img = jnp.asarray(rng.uniform(0, 1, (C, H, W)).astype(np.float32))
pts0 = jnp.asarray(rng.uniform(40, 360, (C, N, 2)).astype(np.float32))

def chain(name, body, carry0, reps=K):
    @jax.jit
    def run(carry):
        return jax.lax.scan(lambda c, _: (body(c), 0.0), carry, None, length=reps)
    out, _ = run(carry0)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    out, _ = run(carry0)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    ms = (time.perf_counter() - t0) / reps * 1000
    print(f"{name:36s} {ms:8.3f} ms", flush=True)

# extraction S=19 (KLT window), all 4 cams
def b_ext19(pts):
    pat = jax.vmap(lambda i, c: extract_patches_mxu(i, c.astype(jnp.int32), 19))(img, pts)
    return jnp.clip(pts + jnp.mean(pat, axis=(2, 3))[..., None] * 1e-3, 40, 360)
chain("extract S=19 N=512 (4 cams)", b_ext19, pts0)

def b_ext37(pts):
    pat = jax.vmap(lambda i, c: extract_patches_mxu(i, c.astype(jnp.int32), 37))(img, pts)
    return jnp.clip(pts + jnp.mean(pat, axis=(2, 3))[..., None] * 1e-3, 40, 360)
chain("extract S=37 N=512 (4 cams)", b_ext37, pts0)

def b_blur(im):
    out = jax.vmap(lambda x: gaussian_blur(x, 2.0, radius=4))(im)
    return jnp.clip(out + 1e-6, 0, 1)
chain("gaussian blur (4 imgs)", b_blur, img)

def b_fast(im):
    kp = jax.vmap(lambda x: fast.detect_keypoints(x, max_keypoints=N))(im)
    return jnp.clip(im + jnp.mean(kp.xy) * 1e-9, 0, 1)
chain("FAST detect (4 imgs)", b_fast, img)

desc0 = jax.vmap(lambda i, x: brief.compute_descriptors(i, x, jnp.ones(N, bool), oriented=False))(img, pts0)
def b_brief(pts):
    d = jax.vmap(lambda i, x: brief.compute_descriptors(i, x, jnp.ones(N, bool), oriented=False))(img, pts)
    return jnp.clip(pts + d.angle[..., None] * 1e-6 + jnp.mean(d.bits.astype(jnp.float32)) * 1e-9, 40, 360)
chain("BRIEF describe (4 imgs, upright)", b_brief, pts0)

def b_brief_or(pts):
    d = jax.vmap(lambda i, x: brief.compute_descriptors(i, x, jnp.ones(N, bool), oriented=True))(img, pts)
    return jnp.clip(pts + d.angle[..., None] * 1e-6 + jnp.mean(d.bits.astype(jnp.float32)) * 1e-9, 40, 360)
chain("BRIEF describe (4 imgs, oriented)", b_brief_or, pts0)

bits0 = desc0.bits
def b_match(bits):
    m = jax.vmap(lambda a, b: match.match_descriptors(a, jnp.ones(N, bool), b, jnp.ones(N, bool)))(bits, bits)
    return bits ^ m.idx[..., None].astype(jnp.uint32)
chain("Hamming match NxN (4 pairs)", b_match, bits0)

pyr1 = jax.vmap(downsample2)(img); pyr2 = jax.vmap(downsample2)(pyr1)
def b_klt(pts):
    tr = jax.vmap(lambda p0, p1, p2, xy: klt.track_points((p0, p1, p2), (p0, p1, p2), xy, xy, jnp.ones(N, bool)))(img, pyr1, pyr2, pts)
    return jnp.clip(tr.xy + 1e-3, 40, 360)
chain("KLT track (4 cams, 3 lvl, 8 it)", b_klt, pts0)

def b_mint(pts):
    d2 = jnp.sum((pts[:, :, None, :] - pts[:, None, :, :]) ** 2, axis=-1)
    nearest = jnp.argmin(d2, axis=-1)
    inh = jnp.take_along_axis(pts, nearest[..., None], axis=1)
    return jnp.clip(pts + inh * 1e-6, 40, 360)
chain("mint d2+argmin+gather (4 cams)", b_mint, pts0)
