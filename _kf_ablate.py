import time, sys
import jax, jax.numpy as jnp
from thor_slam_tpu.utils.platform import enable_compilation_cache
enable_compilation_cache()
from thor_slam_tpu.engine import tracker as trk
from thor_slam_tpu.ops import brief, fast, match
from thor_slam_tpu.ops import image as image_mod
from thor_slam_tpu.ops import stereo as stereo_ops
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
import dataclasses
kf_params = dataclasses.replace(params, keyframe_min_inliers=10**6)  # refresh EVERY tick
seq = render_sequence(sources, 12, xp=jnp)
seq = jax.block_until_ready(seq.astype(jnp.float32))

def run(label, p):
    step = trk.make_track_step(p, setup)
    ms = time_step(step, trk.init_state(p), seq)
    print(f"{label:36s} {ms:8.2f} ms", flush=True)

run("every-tick keyframe FULL", kf_params)

orig_blur = image_mod.gaussian_blur
gb = trk.gaussian_blur
trk.gaussian_blur = lambda im, s, radius=4: im
run("  no blur", kf_params)
trk.gaussian_blur = gb

orig_detect = fast.detect_keypoints
def fake_detect(im, threshold=0.0, max_keypoints=512, **kw):
    n = max_keypoints
    xs = (jnp.arange(n) * 37 % (im.shape[1] - 60) + 30).astype(jnp.float32) + im[0, 0]
    ys = (jnp.arange(n) * 23 % (im.shape[0] - 60) + 30).astype(jnp.float32) + im[0, 1]
    return fast.Keypoints(xy=jnp.stack([xs, ys], -1), score=jnp.ones(n), valid=jnp.ones(n, bool))
fast.detect_keypoints = fake_detect
run("  no FAST", kf_params)
fast.detect_keypoints = orig_detect

orig_desc = brief.compute_descriptors
def fake_desc(im, xy, valid, oriented=True):
    n = xy.shape[0]
    b = (xy[:, 0:1] * 7 + xy[:, 1:2] + im[0, 0]).astype(jnp.uint32)
    return brief.Descriptors(bits=jnp.broadcast_to(b, (n, 8)), angle=jnp.zeros(n), valid=valid)
brief.compute_descriptors = fake_desc
run("  no BRIEF", kf_params)
brief.compute_descriptors = orig_desc

orig_match = match.match_descriptors
def fake_match(da, va, db, vb, **kw):
    n = da.shape[0]
    return match.Matches(idx=jnp.arange(n, dtype=jnp.int32), distance=jnp.zeros(n) + da[0, 0], valid=va & vb)
match.match_descriptors = fake_match
run("  no stereo match", kf_params)
match.match_descriptors = orig_match

orig_ref = stereo_ops.refine_disparity_photometric
stereo_ops.refine_disparity_photometric = lambda l, r, xy, d, v, **kw: d
run("  no disparity refine", kf_params)
stereo_ops.refine_disparity_photometric = orig_ref

orig_mint = trk.mint_bank
def fake_mint(p, setup, world_t_body, kf, anchor_ok, cand_tracks_xy, cand_pos_w, cand_id, fresh_ids, cam_active):
    lm_pos = jnp.einsum("cij,cnj->cni", jnp.broadcast_to(world_t_body[:3, :3][None], (p.num_cams, 3, 3)), kf.pts_cam)
    return (lm_pos, kf.desc_bits, kf.tri_valid, kf.kp_xy, kf.kp_xy, kf.right_obs_px, kf.tri_valid, fresh_ids)
trk.mint_bank = fake_mint
run("  no mint (inheritance d2)", kf_params)
trk.mint_bank = orig_mint

run("baseline (normal kf policy)", params)
