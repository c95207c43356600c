"""End-to-end test of the real-sequence path: YAML -> encoded video -> mask
-> decode -> SLAM -> artifacts.

The reference's entire purpose is `./slam okayama.yaml` with an mp4 + static
mask (src/main.cpp:42-111, assets/okayama.yaml + okayama-mask.png). The
benchmark videos are absent from the snapshot (.MISSING_LARGE_BLOBS), so this
test synthesizes one: the sprite world rendered to H.264/mp4v via cv2
VideoWriter, a hood-style static mask, and a sequence YAML — then drives the
full CLI and asserts trajectory accuracy on the decoded (lossy) footage.
Covers BASELINE.json configs 1-4's plumbing end to end.
"""

import subprocess
import sys

import numpy as np
import pytest

from racing_slam_tpu.ops.camera import Camera
from racing_slam_tpu.slam.config import SlamConfig, load_sequence_yaml
from racing_slam_tpu.slam.pipeline import Slam
from racing_slam_tpu.utils.metrics import ate_rmse, camera_centers
from racing_slam_tpu.utils.synthetic import make_sequence
from racing_slam_tpu.utils.video import VideoLoader, load_mask, open_video

cv2 = pytest.importorskip("cv2")

W, H = 320, 240
MASK_ROWS = 24  # bottom rows masked out (okayama-mask.png hides the car hood)


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    """Synthetic sequence encoded to mp4 + mask PNG + sequence YAML."""
    root = tmp_path_factory.mktemp("video_e2e")
    cam = Camera(fx=240.0, fy=240.0, cx=160.0, cy=120.0, width=W, height=H)
    rng = np.random.default_rng(11)
    seq = make_sequence(
        rng, n_frames=18, cam=cam, n_sprites=140,
        step_t=np.array([0.10, 0.01, 0.16], np.float32),
    )

    video_path = root / "seq.mp4"
    wr = cv2.VideoWriter(
        str(video_path), cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (W, H)
    )
    assert wr.isOpened(), "cv2 VideoWriter failed to open (no mp4v codec?)"
    for f in seq.frames:
        u8 = np.clip(f * 255.0, 0, 255).astype(np.uint8)
        wr.write(cv2.cvtColor(u8, cv2.COLOR_GRAY2BGR))
    wr.release()

    mask = np.full((H, W), 255, np.uint8)
    mask[H - MASK_ROWS:] = 0
    mask_path = root / "mask.png"
    cv2.imwrite(str(mask_path), mask)

    yaml_path = root / "seq.yaml"
    yaml_path.write_text(
        f"video: {video_path.name}\nmask: {mask_path.name}\n"
        f"fx: 240.0\nfy: 240.0\n"
    )
    return dict(root=root, yaml=yaml_path, video=video_path, mask=mask_path,
                seq=seq, cam=cam)


def test_sequence_yaml_loading(assets):
    """YAML schema parity with the reference loader (src/main.cpp:11-40)."""
    sc = load_sequence_yaml(assets["yaml"])
    assert sc.video.endswith("seq.mp4")
    assert sc.mask.endswith("mask.png")
    assert sc.fx == 240.0 and sc.fy == 240.0
    assert sc.cx is None and sc.cy is None  # defaults to image center


def test_encoded_video_roundtrip(assets):
    """Decode returns every frame at the right shape; lossy but close."""
    loader = VideoLoader(str(assets["video"]))
    frames = loader.get_all_frames()
    assert len(frames) == 18
    assert frames[0].shape == (H, W)
    src = np.asarray(assets["seq"].frames[0], np.float32)
    assert np.abs(frames[0] - src).mean() < 0.02  # codec noise only


def test_encoded_video_masked_slam_ate(assets):
    """Full engine on DECODED frames with the static mask: tracking holds and
    ATE stays within the same bound as the lossless pipeline test."""
    seq = assets["seq"]
    cfg = SlamConfig(
        triangulate_points=True, bundle_adjust=True, optimize_pose=True,
        cull_points=True, max_keyframes=16, map_capacity=2048,
    )
    mask = load_mask(str(assets["mask"]))
    assert mask.shape == (H, W) and mask[-1].max() == 0.0
    slam = Slam(
        assets["cam"], open_video(str(assets["video"])), cfg, static_mask=mask
    )
    assert slam.initialize()
    slam.run()
    kf_idx = slam.keyframe_indices()
    assert len(kf_idx) >= 4
    est = slam.poses()
    gt = seq.poses[kf_idx]
    ate = ate_rmse(est, gt)
    length = np.linalg.norm(camera_centers(gt)[-1] - camera_centers(gt)[0])
    # Looser than the lossless pipeline bound (5 %): mp4v quantization noise
    # plus the masked band's lost features cost ~0.5 % ATE on this short run.
    assert ate < 0.08 * length, f"ATE {ate} vs trajectory length {length}"

    # The mask is respected: no keyframe keypoint in the masked band
    # (mirrors the GFTT mask arg, src/features/OrbFeatureExtractor.cpp:14-16).
    kfs = slam.state.kfs
    ys = np.asarray(kfs.kp_xy)[..., 1][np.asarray(kfs.kp_valid)]
    assert (ys < H - MASK_ROWS + 1).all()


def test_cli_on_encoded_sequence(assets, tmp_path):
    """The CLI path: python -m racing_slam_tpu <yaml> --out ... writes the
    artifact set (reference app loop, src/main.cpp:42-114)."""
    import os

    out = tmp_path / "artifacts"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # Keep the CLI off the TPU tunnel: without the pool IP the container's
    # sitecustomize skips axon registration and the cpu platform wins.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    proc = subprocess.run(
        [
            sys.executable, "-m", "racing_slam_tpu", str(assets["yaml"]),
            "--out", str(out), "--quiet",
            "--max-keyframes", "16", "--map-capacity", "2048",
        ],
        capture_output=True, text=True, timeout=1200, env=env,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    for name in ["trajectory.png", "map.ply", "trajectory.tum", "state.npz",
                 "metrics.jsonl"]:
        assert (out / name).exists(), f"missing artifact {name}"
    assert "reprojection error" in proc.stdout
