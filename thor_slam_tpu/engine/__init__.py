"""The TPU SLAM engine: the from-scratch replacement for cuVSLAM.

Implements visual odometry, IMU preintegration, sliding-window bundle
adjustment, keyframing, loop closure and pose-graph optimization as
jit-compiled JAX — everything the reference delegates to the closed-source
``isaac_ros_visual_slam`` CUDA node (reference
launch/thor_visual_slam.launch.py:30-64).
"""
