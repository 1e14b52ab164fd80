"""Device management: the reference's DeviceManager contract
(config/device_manager.py:16-67) mapped onto JAX platforms.

'auto' prefers an accelerator (TPU) and falls back to CPU with a warning;
device info reports platform, chip count, and per-device memory stats where
available.
"""

from __future__ import annotations

from typing import Dict, List

import jax


class DeviceManager:
    """Resolve and describe compute devices (device_manager.py:16-67)."""

    @staticmethod
    def get_device(requested: str = "auto") -> str:
        requested = (requested or "auto").lower()
        platforms = {d.platform for d in jax.devices()}
        if requested == "auto":
            for p in ("tpu", "gpu", "axon"):
                if p in platforms:
                    return p
            return "cpu"
        if requested in ("tpu", "gpu", "axon") and requested not in platforms:
            print(f"Warning: {requested} requested but not available, using CPU")
            return "cpu"
        if requested == "cuda":
            # Accept the reference's CUDA spelling; map to whatever
            # accelerator exists.
            return DeviceManager.get_device("auto")
        return requested

    @staticmethod
    def devices(platform: str = None) -> List[jax.Device]:
        if platform in (None, "auto"):
            return jax.devices()
        try:
            return jax.devices(platform)
        except RuntimeError:
            return jax.devices()

    @staticmethod
    def get_device_info(requested: str = "auto") -> Dict:
        platform = DeviceManager.get_device(requested)
        devs = DeviceManager.devices(platform if platform != "cpu" else None)
        info: Dict = {
            "device": platform,
            "device_count": len(devs),
            "devices": [str(d) for d in devs],
        }
        stats = []
        for d in devs:
            try:
                s = d.memory_stats()
                if s:
                    stats.append(
                        {
                            "bytes_in_use": s.get("bytes_in_use"),
                            "bytes_limit": s.get("bytes_limit"),
                        }
                    )
            except Exception:
                pass
        if stats:
            info["memory"] = stats
        return info

    @staticmethod
    def print_device_info(requested: str = "auto") -> None:
        info = DeviceManager.get_device_info(requested)
        print(f"Device: {info['device']} x{info['device_count']}")
        for d in info["devices"]:
            print(f"  {d}")
        for m in info.get("memory", []):
            if m.get("bytes_limit"):
                used = (m.get("bytes_in_use") or 0) / 1024**2
                limit = m["bytes_limit"] / 1024**2
                print(f"  memory: {used:.0f} / {limit:.0f} MB")
