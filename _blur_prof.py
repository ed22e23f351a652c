import time
import jax, jax.numpy as jnp, numpy as np
from thor_slam_tpu.utils.platform import enable_compilation_cache
enable_compilation_cache()
from thor_slam_tpu.ops.image import gaussian_blur, _gaussian_kernel1d

C, H, W = 4, 720, 1280
rng = np.random.default_rng(0)
img = jnp.asarray(rng.uniform(0, 1, (C, H, W)).astype(np.float32))

def chain(name, body, carry0, reps=50):
    @jax.jit
    def run(carry):
        return jax.lax.scan(lambda c, _: (body(c), 0.0), carry, None, length=reps)
    out, _ = run(carry0)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    out, _ = run(carry0)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    ms = (time.perf_counter() - t0) / reps * 1000
    print(f"{name:40s} {ms:8.3f} ms", flush=True)

chain("elementwise baseline (4 imgs)", lambda im: im * 0.999 + 1e-4, img)

chain("blur current (4 imgs)", lambda im: jnp.clip(jax.vmap(lambda x: gaussian_blur(x, 2.0, radius=4))(im) + 1e-6, 0, 1), img)

def blur_roll(x, k):
    out = jnp.zeros_like(x)
    for i, kv in enumerate(k):
        out = out + kv * jnp.roll(x, i - (len(k) // 2), axis=0)
    out2 = jnp.zeros_like(x)
    for i, kv in enumerate(k):
        out2 = out2 + kv * jnp.roll(out, i - (len(k) // 2), axis=1)
    return out2
k = _gaussian_kernel1d(2.0, 4)
chain("blur roll-based (4 imgs)", lambda im: jnp.clip(jax.vmap(lambda x: blur_roll(x, k))(im) + 1e-6, 0, 1), img)

def blur_conv(x, k):
    # single conv2d over the batch: (C,1,H,W) with separable passes as 2 convs
    y = jax.lax.conv_general_dilated(x[:, None], k[None, None, :, None], (1, 1), [(4, 4), (0, 0)])
    y = jax.lax.conv_general_dilated(y, k[None, None, None, :], (1, 1), [(0, 0), (4, 4)])
    return y[:, 0]
chain("blur conv-based (4 imgs, batched)", lambda im: jnp.clip(blur_conv(im, k) + 1e-6, 0, 1), img)

# FAST subparts
from thor_slam_tpu.ops import fast
chain("FAST score_map only (4)", lambda im: jnp.clip(jax.vmap(fast.fast_score_map)(im) * 0.99 + im * 1e-3, 0, 1), img)
chain("FAST score+nms (4)", lambda im: jnp.clip(jax.vmap(lambda x: fast.nms3x3(fast.fast_score_map(x)))(im) * 0.99 + im * 1e-3, 0, 1), img)
def full_fast(im):
    kp = jax.vmap(lambda x: fast.detect_keypoints(x, max_keypoints=512))(im)
    return jnp.clip(im + jnp.mean(kp.xy) * 1e-9, 0, 1)
chain("FAST full detect (4)", full_fast, img)
