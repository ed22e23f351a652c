import time, sys
import jax, jax.numpy as jnp, numpy as np
from thor_slam_tpu.utils.platform import enable_compilation_cache
enable_compilation_cache()
from thor_slam_tpu.engine import tracker as trk
from thor_slam_tpu.ops import klt
from thor_slam_tpu.ops import image as image_mod
from thor_slam_tpu.utils.flagship import flagship_rig, render_sequence

def _palindrome(i, n):
    j = i % (2 * n - 2)
    return j if j < n else 2 * n - 2 - j

def time_step(step, state, seq, reps=30):
    n = seq.shape[0]
    for i in range(4):
        state, out = step(state, seq[_palindrome(i, n)])
    jax.device_get(out.world_t_body)
    t0 = time.perf_counter()
    for i in range(4, 4 + reps):
        state, out = step(state, seq[_palindrome(i, n)])
    jax.device_get(out.world_t_body)
    return (time.perf_counter() - t0) / reps * 1000.0

res = sys.argv[1] if len(sys.argv) > 1 else "1280x720"
w, h = (int(v) for v in res.split("x"))
params, setup, _, sources, _, _ = flagship_rig(num_cams=4, width=w, height=h, max_keypoints=512)
seq = render_sequence(sources, 12, xp=jnp)
seq = jax.block_until_ready(seq.astype(jnp.float32))

def run(label):
    step = trk.make_track_step(params, setup)
    ms = time_step(step, trk.init_state(params), seq)
    print(f"{label:36s} {ms:8.2f} ms", flush=True)

run("FULL")

# (a) stub window extraction: cheap, depends on image+centers (not foldable)
orig_ext = image_mod.extract_patches_mxu
def fake_extract(image, centers, size):
    n = centers.shape[0]
    base = image[:size, :size][None] + centers[:, 0, None, None] * 1e-6
    return base + centers[:, 1, None, None] * 1e-6
image_mod.extract_patches_mxu = fake_extract
klt_ext = getattr(klt, "extract_patches_mxu", None)
klt.extract_patches_mxu = fake_extract
run("no window extraction")
image_mod.extract_patches_mxu = orig_ext
klt.extract_patches_mxu = orig_ext

# (b) stub shifted views (im2col)
orig_views = klt._shifted_views
def fake_views(win, radius, m):
    n, s, _ = win.shape
    p = 2 * radius + 1
    k = 2 * m + 2
    v = jnp.mean(win, axis=(1, 2))
    return jnp.broadcast_to(v[:, None, None], (n, k * k, p * p)) + 0.0
klt._shifted_views = fake_views
run("no shifted views (im2col)")
klt._shifted_views = orig_views

# (c) 1 LK iteration instead of 8
orig_track = klt.track_points
def track1(pp, cp, a, b, v, **kw):
    kw["iters"] = 1
    return orig_track(pp, cp, a, b, v, **kw)
klt.track_points = track1
run("iters=1")
klt.track_points = orig_track

# (d) 1 pyramid level
def track_l1(pp, cp, a, b, v, **kw):
    kw["num_levels"] = 1
    return orig_track(pp, cp, a, b, v, **kw)
klt.track_points = track_l1
run("levels=1")
klt.track_points = orig_track
