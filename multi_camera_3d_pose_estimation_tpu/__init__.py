"""TPU-native multi-camera 3D human pose estimation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
sashapersonxyz/Multi-camera_3D_Pose_Estimation (see /root/repo/SURVEY.md):

- ``ops``       — pure-jnp camera geometry (projection, distortion, undistort,
                  Rodrigues, batched DLT triangulation) and fused decode kernels.
- ``models``    — flax 2D pose models (HRNet heatmap path, RTMPose SimCC path)
                  plus person detection / full-frame fallback.
- ``refine``    — trajectory refinement: vectorized outlier-filtered linear
                  interpolation and a jitted optax Adam MLE refiner with
                  smoothness / body-length / extrinsic-sample costs.
- ``calib``     — Zhang-style intrinsic calibration, stereo extrinsics, PnP —
                  all jitted Gauss-Newton/LM instead of OpenCV C++.
- ``parallel``  — jax.sharding meshes and pjit-sharded batch pipelines.
- ``io``        — artifact-compatible readers/writers (.dat, camera_names.pkl,
                  recording_log.yaml, .npy shapes) and frame IO.
- ``sync``      — audio-peak video synchronization (host glue).
- ``viz``       — matplotlib animations (3D pose, heatmap ellipses, 2D).
- ``cli``       — record_and_estimate_pose / pose_refinement / plot_utils
                  entry points with the reference's flag + YAML surface.

Everything numeric runs as statically-shaped, vmappable jnp under ``jax.jit``;
the time/camera/joint loops of the reference become batch axes.
"""

# Single source of truth for the package version: pyproject.toml declares
# version as dynamic and setuptools reads this literal statically.
__version__ = "0.4.0"
