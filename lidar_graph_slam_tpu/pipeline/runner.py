"""End-to-end SLAM pipeline driver.

Replaces the reference's three-process ROS 2 launch graph (`lidar_graph_slam/launch/
lidar_graph_slam.launch.xml:6-14` wiring points_prefiltering -> lidar_scan_matcher ->
graph_based_slam over DDS topics) with single-process function composition per host:
prefilter (jit) -> scan matcher (jit stages) -> back end (jit factor graph). The DDS topic
surface becomes the returned `PipelineResult`; per-stage wall-clock metrics are collected
first-class (the observability the reference lacked, SURVEY.md §5.1).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Iterable, Optional

import numpy as np

from lidar_graph_slam_tpu.core.config import PipelineConfig
from lidar_graph_slam_tpu.core.pointcloud import PointCloud
from lidar_graph_slam_tpu.filters.prefilter import make_prefilter
from lidar_graph_slam_tpu.graph.slam import GraphBasedSLAM
from lidar_graph_slam_tpu.odometry.scan_matcher import ScanMatcher


@dataclass
class PipelineResult:
    odometry_poses: np.ndarray          # [F, 4, 4] per-frame front-end poses (scan_matcher_path)
    keyframe_poses: np.ndarray          # [K, 4, 4] optimized keyframe poses (modified_path)
    keyframe_frame_indices: np.ndarray  # [K] which frame each keyframe came from
    num_loop_closures: int
    loop_log: list
    metrics: dict = field(default_factory=dict)


class SlamPipeline:
    """Host driver: feed raw scans, get trajectories, map, and metrics."""

    def __init__(self, cfg: PipelineConfig, metrics_path: Optional[str] = None):
        from lidar_graph_slam_tpu.utils.telemetry import MetricsWriter

        self.metrics_writer = MetricsWriter(metrics_path)
        self.cfg = cfg
        cap = cfg.capacity
        # The voxel stage's output capacity bounds the SOR kNN working set; twice the
        # final budget is enough headroom (overflow is flagged in telemetry) and keeps the
        # [Q, 27*bucket] candidate tensors far smaller than sizing by raw_points would.
        self.prefilter = make_prefilter(
            cfg.prefilter, capacity_out=cap.filtered_points,
            voxel_capacity=min(cap.raw_points, 2 * cap.filtered_points),
        )
        self.front = ScanMatcher(
            cfg.scan_matcher, scan_capacity=cap.filtered_points,
            map_voxel_capacity=cap.voxel_capacity,
        )
        self.back = GraphBasedSLAM(cfg.graph_slam, cap)
        self._kf_consumed = 0
        self.timings: dict[str, list] = {"prefilter": [], "register": [], "backend": []}
        self.odometry_poses: list[np.ndarray] = []
        self.kf_frame_indices: list[int] = []

    def process_scan(self, scan: np.ndarray) -> dict:
        """Feed one raw sensor-frame scan [n, 3]."""
        t0 = time.perf_counter()
        raw = PointCloud.from_array(scan, capacity=self.cfg.capacity.raw_points)
        filtered = self.prefilter(raw.points, raw.mask)
        filtered.points.block_until_ready()
        t1 = time.perf_counter()

        out = self.front.process(filtered)
        t2 = time.perf_counter()

        # Ship any new keyframes to the back end (the /key_frame topic, now a queue).
        while self._kf_consumed < len(self.front.keyframe_log):
            kf = self.front.keyframe_log[self._kf_consumed]
            self.back.add_keyframe(kf)
            self.kf_frame_indices.append(kf["frame_index"])
            self._kf_consumed += 1
        if self.cfg.enable_loop_closure:
            self.back.on_frame()
        t3 = time.perf_counter()

        self.timings["prefilter"].append(t1 - t0)
        self.timings["register"].append(t2 - t1)
        self.timings["backend"].append(t3 - t2)
        self.odometry_poses.append(out["pose"])
        self.metrics_writer.emit(
            {
                "frame": len(self.odometry_poses) - 1,
                "converged": out["converged"],
                "fitness": out["fitness"],
                "iterations": out["iterations"],
                "is_keyframe": out["is_keyframe"],
                "n_keyframes": self.front.n_keyframes,
                "loops_accepted": sum(1 for l in self.back.loop_log if l["accepted"]),
                "prefilter_ms": 1000 * (t1 - t0),
                "register_ms": 1000 * (t2 - t1),
                "backend_ms": 1000 * (t3 - t2),
            }
        )
        return out

    def run(self, scans: Iterable, progress_every: int = 0) -> PipelineResult:
        for i, item in enumerate(scans):
            scan = item[0] if isinstance(item, tuple) else item
            self.process_scan(np.asarray(scan))
            if progress_every and (i + 1) % progress_every == 0:
                print(f"[tpu-slam] frame {i + 1}, keyframes={self.front.n_keyframes}, "
                      f"loops={sum(1 for l in self.back.loop_log if l['accepted'])}")
        return self.result()

    def result(self) -> PipelineResult:
        metrics = {
            name: {
                "mean_ms": 1000 * float(np.mean(ts)) if ts else 0.0,
                "p50_ms": 1000 * float(np.median(ts)) if ts else 0.0,
                "max_ms": 1000 * float(np.max(ts)) if ts else 0.0,
            }
            for name, ts in self.timings.items()
        }
        return PipelineResult(
            odometry_poses=np.stack(self.odometry_poses) if self.odometry_poses else np.zeros((0, 4, 4)),
            keyframe_poses=self.back.optimized_poses(),
            keyframe_frame_indices=np.asarray(self.kf_frame_indices, dtype=np.int64),
            num_loop_closures=sum(1 for l in self.back.loop_log if l["accepted"]),
            loop_log=self.back.loop_log,
            metrics=metrics,
        )

    def save_map(self, path: str, resolution: float = 0.0) -> bool:
        return self.back.save_map(path, resolution)
