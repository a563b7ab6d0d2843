"""Optional DROID-SLAM pose tracker (gated).

Reference: models/SLAM/droid_wrapper.py:17-77 — an optional learned pose
tracker behind `tracking.with_droid` (false in every shipped config).  The
droid_slam package and its pretrained weights are unavailable offline; the
wrapper keeps the call surface so configs with `with_droid: true` fail
loudly with guidance instead of silently degrading.
"""
from __future__ import annotations

try:
    import droid_slam  # type: ignore
    DROID_AVAILABLE = True
except Exception:  # pragma: no cover - optional dependency
    droid_slam = None
    DROID_AVAILABLE = False


class DroidWrapper:
    def __init__(self, weights: str | None = None, image_size=(256, 256)):
        if not DROID_AVAILABLE:
            raise ImportError(
                "droid_slam is not installed; set tracking.with_droid: false "
                "(the reference ships with it disabled everywhere) or install "
                "DROID-SLAM and its pretrained weights")
        self.net = droid_slam.Droid(weights=weights, image_size=image_size)

    def track(self, t, image, depth=None, intrinsics=None):
        return self.net.track(t, image, depth=depth, intrinsics=intrinsics)

    def terminate(self):
        return self.net.terminate()
