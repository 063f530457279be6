"""Datasets: TUM / Replica / EuRoC / Kubric / DAVIS / RealSense / synthetic.

Factory (parity: reference utils/dataset.py:823-837).
"""

from __future__ import annotations


def load_dataset(config: dict):
    from .base import maybe_preload

    return maybe_preload(_make_dataset(config), config)


def _make_dataset(config: dict):
    typ = config["Dataset"]["type"]
    if typ == "tum":
        from .tum import TUMDataset

        return TUMDataset(config)
    if typ == "replica":
        from .replica import ReplicaDataset

        return ReplicaDataset(config)
    if typ == "euroc":
        from .euroc import EurocDataset

        return EurocDataset(config)
    if typ == "kubric":
        from .kubric import KubricDataset

        return KubricDataset(config)
    if typ == "davis":
        from .davis import DavisDataset

        return DavisDataset(config)
    if typ == "realsense":
        from .realsense import RealsenseDataset

        return RealsenseDataset(config)
    if typ == "synthetic":
        if config["Dataset"].get("sensor_type") == "stereo":
            from .synthetic import SyntheticStereoDataset

            return SyntheticStereoDataset(config)
        from .synthetic import SyntheticDataset

        return SyntheticDataset(config)
    raise ValueError(f"Unknown dataset type: {typ}")
