from signerf_tpu.cameras.cameras import CameraType, Cameras, RayBundle
from signerf_tpu.cameras.poses import circle_poses, look_at_poses, random_sphere_poses

__all__ = [
    "CameraType",
    "Cameras",
    "RayBundle",
    "circle_poses",
    "look_at_poses",
    "random_sphere_poses",
]
