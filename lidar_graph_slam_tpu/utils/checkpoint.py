"""Checkpoint / exact resume for the SLAM pipeline.

The reference has no persistence beyond the final PCD export (`/save_map`,
`graph_based_slam/src/graph_based_slam.cpp:469-501`); all state lives in process RAM
(`key_frame_array_`, `graph_based_slam.hpp:122-123`) and a crash loses the session
(SURVEY.md §5.4). Here the full SLAM state — keyframe store (poses + clouds + accumulated
distances), factor list, front-end pose/ring/motion — serializes to one compressed .npz,
and `load_pipeline` reconstructs a pipeline that continues exactly where it stopped.
"""

from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np

from lidar_graph_slam_tpu.core import config as config_mod
from lidar_graph_slam_tpu.pipeline.runner import SlamPipeline


def save_pipeline(pipe: SlamPipeline, path: str) -> None:
    pipe.flush()  # drain in-flight frames (fused driver)
    back = pipe.back
    if getattr(back, "cloud_store", None) is not None:
        raise NotImplementedError(
            "checkpointing a multi-host pipeline (sharded keyframe store) is not "
            "supported: each host holds only its cloud shard — save the map via "
            "save_map() (allgathers) or checkpoint from a single-host run"
        )
    g = back.graph
    n_kf = back.n_keyframes

    # Keyframe clouds are ragged host-side; store concatenated + offsets
    # (back._cloud materializes any still-lazy device-side clouds).
    if n_kf:
        clouds = [back._cloud(k) for k in range(n_kf)]
        cloud_cat = np.concatenate(clouds)
        cloud_offsets = np.cumsum([0] + [c.shape[0] for c in clouds])
    else:
        cloud_cat = np.zeros((0, 3), np.float32)
        cloud_offsets = np.zeros((1,), np.int64)

    cfg_json = json.dumps(_config_to_dict(pipe.cfg))
    np.savez_compressed(
        path,
        config_json=np.frombuffer(cfg_json.encode(), dtype=np.uint8),
        # back end graph
        graph_poses=np.asarray(g.poses),
        graph_pose_mask=np.asarray(g.pose_mask),
        graph_odom_meas=np.asarray(g.odom_meas),
        graph_prior_pose=np.asarray(g.prior_pose),
        graph_loop_i=np.asarray(g.loop_i),
        graph_loop_j=np.asarray(g.loop_j),
        graph_loop_meas=np.asarray(g.loop_meas),
        graph_loop_info=np.asarray(g.loop_info),
        graph_loop_mask=np.asarray(g.loop_mask),
        graph_num_poses=int(g.num_poses),
        graph_num_loops=int(g.num_loops),
        # keyframe store
        kf_cloud_cat=cloud_cat,
        kf_cloud_offsets=np.asarray(cloud_offsets, np.int64),
        kf_accum_dist=np.asarray(back.kf_accum_dist, np.float64),
        kf_front_poses=(np.stack(back.kf_front_poses) if n_kf else np.zeros((0, 4, 4), np.float32)),
        kf_frame_indices=np.asarray(pipe.kf_frame_indices, np.int64),
        loop_log=np.frombuffer(json.dumps(back.loop_log).encode(), dtype=np.uint8),
        # front end (both drivers serialize the same logical state)
        **_front_state_arrays(pipe),
        odometry_poses=(np.stack(pipe.odometry_poses) if pipe.odometry_poses else np.zeros((0, 4, 4), np.float32)),
    )


def _front_state_arrays(pipe: SlamPipeline) -> dict:
    if pipe.fused:
        st, ring = pipe._state, pipe._ring
        return dict(
            front_pose=np.asarray(st.pose),
            front_last_motion=np.asarray(st.last_motion),
            front_last_kf_pose=np.asarray(st.last_kf_pose),
            front_accum=np.asarray(st.accum_distance),
            front_n_keyframes=np.asarray(st.n_keyframes),
            front_n_frames=len(pipe.odometry_poses),
            ring_clouds=np.asarray(ring.clouds),
            ring_masks=np.asarray(ring.masks),
            ring_poses=np.asarray(ring.poses),
            ring_used=np.asarray(ring.used),
        )
    front = pipe.front
    return dict(
        front_pose=front.pose,
        front_last_motion=front.last_motion,
        front_last_kf_pose=front.last_kf_pose,
        front_accum=front.accum_distance,
        front_n_keyframes=front.n_keyframes,
        front_n_frames=front.n_frames,
        ring_clouds=np.asarray(front.ring.clouds),
        ring_masks=np.asarray(front.ring.masks),
        ring_poses=np.asarray(front.ring.poses),
        ring_used=np.asarray(front.ring.used),
    )


def load_pipeline(path: str) -> SlamPipeline:
    z = np.load(path)
    cfg = _config_from_dict(json.loads(bytes(z["config_json"]).decode()))
    pipe = SlamPipeline(cfg)

    # Back end.
    back = pipe.back
    back.graph = back.graph.replace(
        poses=jnp.asarray(z["graph_poses"]),
        pose_mask=jnp.asarray(z["graph_pose_mask"]),
        odom_meas=jnp.asarray(z["graph_odom_meas"]),
        prior_pose=jnp.asarray(z["graph_prior_pose"]),
        loop_i=jnp.asarray(z["graph_loop_i"]),
        loop_j=jnp.asarray(z["graph_loop_j"]),
        loop_meas=jnp.asarray(z["graph_loop_meas"]),
        loop_info=jnp.asarray(z["graph_loop_info"]),
        loop_mask=jnp.asarray(z["graph_loop_mask"]),
        num_poses=jnp.asarray(int(z["graph_num_poses"]), jnp.int32),
        num_loops=jnp.asarray(int(z["graph_num_loops"]), jnp.int32),
    )
    offsets = z["kf_cloud_offsets"]
    cat = z["kf_cloud_cat"]
    back.kf_clouds = [cat[offsets[i]:offsets[i + 1]] for i in range(len(offsets) - 1)]
    back.kf_accum_dist = [float(v) for v in z["kf_accum_dist"]]
    back.kf_front_poses = [p for p in z["kf_front_poses"]]
    back.loop_log = json.loads(bytes(z["loop_log"]).decode())
    back.n_keyframes = int(z["graph_num_poses"])
    back.is_loop_closed = any(l.get("accepted") for l in back.loop_log)

    # Back end's host mirrors (fast path: zero device reads per frame / per solve).
    back._poses_host = [np.asarray(p, np.float32) for p in z["graph_poses"][: back.n_keyframes]]
    back._host_odoms = [
        np.asarray(o, np.float64) for o in z["graph_odom_meas"][: back.n_keyframes]]
    back._host_prior = np.asarray(z["graph_prior_pose"], np.float64)
    n_loops = int(z["graph_num_loops"])
    back.n_loops = n_loops
    back._host_loops = [
        (int(z["graph_loop_i"][l]), int(z["graph_loop_j"][l]),
         np.asarray(z["graph_loop_meas"][l], np.float64),
         np.asarray(z["graph_loop_info"][l], np.float64))
        for l in range(n_loops) if bool(z["graph_loop_mask"][l])
    ]

    # Front end.
    ring_arrays = dict(
        clouds=jnp.asarray(z["ring_clouds"]),
        masks=jnp.asarray(z["ring_masks"]),
        poses=jnp.asarray(z["ring_poses"]),
        used=jnp.asarray(z["ring_used"]),
    )
    if pipe.fused:
        pipe._state = pipe._state.replace(
            pose=jnp.asarray(z["front_pose"]),
            last_motion=jnp.asarray(z["front_last_motion"]),
            last_kf_pose=jnp.asarray(z["front_last_kf_pose"]),
            accum_distance=jnp.asarray(z["front_accum"], jnp.float32),
            n_keyframes=jnp.asarray(int(z["front_n_keyframes"]), jnp.int32),
        )
        pipe._ring = pipe._ring.replace(**ring_arrays)
        pipe._target = pipe._rebuild(pipe._ring)
    else:
        front = pipe.front
        front.pose = z["front_pose"]
        front.last_motion = z["front_last_motion"]
        front.last_kf_pose = z["front_last_kf_pose"]
        front.accum_distance = float(z["front_accum"])
        front.n_keyframes = int(z["front_n_keyframes"])
        front.n_frames = int(z["front_n_frames"])
        front.ring = front.ring.replace(**ring_arrays)
        if front.n_keyframes > 0:
            front._rebuild_target()
        # Historical keyframes live in the back end; the front-end log restarts empty, so
        # the runner's consumption cursor restarts at 0 alongside it.
        front.keyframe_log = []
        pipe._kf_consumed = 0
    pipe.kf_frame_indices = [int(v) for v in z["kf_frame_indices"]]
    pipe.odometry_poses = [p for p in z["odometry_poses"]]
    return pipe


def _config_to_dict(cfg) -> dict:
    import dataclasses

    def conv(obj):
        if dataclasses.is_dataclass(obj):
            return {f.name: conv(getattr(obj, f.name)) for f in dataclasses.fields(obj)}
        if isinstance(obj, tuple):
            return list(obj)
        return obj

    return conv(cfg)


def _config_from_dict(d: dict):
    return config_mod._update_dataclass(config_mod.PipelineConfig(), d)
