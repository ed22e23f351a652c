import time, jax, jax.numpy as jnp
from thor_slam_tpu.utils.platform import enable_compilation_cache
enable_compilation_cache()
from thor_slam_tpu.engine import tracker as trk
from thor_slam_tpu.utils.flagship import flagship_rig, render_sequence

def _palindrome(i, n):
    j = i % (2 * n - 2)
    return j if j < n else 2 * n - 2 - j

params, setup, _, sources, _, _ = flagship_rig(num_cams=4, width=1280, height=720, max_keypoints=512)
seq = render_sequence(sources, 12, xp=jnp)
seq = jax.block_until_ready(seq.astype(jnp.float32))
step = trk.make_track_step(params, setup)
state = trk.init_state(params)
flags, inls = [], []
for i in range(34):
    state, out = step(state, seq[_palindrome(i, 12)])
    r, n = jax.device_get((out.refreshed, out.num_inliers))
    flags.append(int(r)); inls.append(int(n))
print("refreshed:", "".join(str(f) for f in flags))
print("inliers:", inls[:12], "...")
print(f"refresh rate: {sum(flags[4:])}/{len(flags)-4}")
