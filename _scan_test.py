import time, sys
from thor_slam_tpu.utils.platform import enable_compilation_cache
enable_compilation_cache()
from thor_slam_tpu.utils.flagship import flagship_rig
import bench

w, h = (int(v) for v in sys.argv[1].split("x"))
params, setup, _, sources, _, _ = flagship_rig(num_cams=4, width=w, height=h, max_keypoints=256)
t0 = time.time()
fps, inl = bench._bench_device_scan(params, setup, sources, 60, 12)
print(f"{w}x{h}: scan {fps:.1f} fps, inliers_last={inl} (total {time.time()-t0:.0f}s)")
