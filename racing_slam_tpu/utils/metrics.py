"""Trajectory evaluation: Sim(3) alignment + ATE.

The reference prints only a per-frame mean reprojection error
(src/Slam.cpp:245-260); for monocular SLAM the standard accuracy metric is
absolute trajectory error after Sim(3) (scale-included) alignment, since the
reference fixes gauge only once at init by rescaling to unit baseline
(src/Slam.cpp:70-80). BASELINE.json's north star is ATE on the benchmark
sequences, so the evaluator lives here.
"""

from __future__ import annotations

import numpy as np


def camera_centers(poses: np.ndarray) -> np.ndarray:
    """[N, 4, 4] world->camera poses -> [N, 3] camera centers (-R^T t)."""
    R = poses[:, :3, :3]
    t = poses[:, :3, 3]
    return -np.einsum("nji,nj->ni", R, t)


def umeyama_sim3(src: np.ndarray, dst: np.ndarray) -> tuple[float, np.ndarray, np.ndarray]:
    """Least-squares similarity transform s,R,t minimizing ||dst-(sR src+t)||.

    Umeyama (1991). src, dst: [N, 3].
    """
    mu_s = src.mean(0)
    mu_d = dst.mean(0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / len(src)
    U, S, Vt = np.linalg.svd(cov)
    d = np.sign(np.linalg.det(U @ Vt))
    D = np.diag([1.0, 1.0, d])
    R = U @ D @ Vt
    var_s = (xs**2).sum() / len(src)
    s = np.trace(np.diag(S) @ D) / (var_s + 1e-12)
    t = mu_d - s * R @ mu_s
    return float(s), R, t


def ate_rmse(
    est_poses: np.ndarray, gt_poses: np.ndarray, align: bool = True
) -> float:
    """RMSE of camera-center error after optional Sim(3) alignment.

    est_poses, gt_poses: [N, 4, 4] world->camera, same frame correspondence.
    """
    c_est = camera_centers(est_poses)
    c_gt = camera_centers(gt_poses)
    if align:
        s, R, t = umeyama_sim3(c_est, c_gt)
        c_est = (s * (R @ c_est.T)).T + t
    err = np.linalg.norm(c_est - c_gt, axis=-1)
    return float(np.sqrt((err**2).mean()))


def rotation_errors_deg(est_poses: np.ndarray, gt_poses: np.ndarray) -> np.ndarray:
    """Per-frame relative rotation error in degrees (gauge-free up to a global
    rotation; uses the alignment-free pairwise relative form)."""
    R_est = est_poses[:, :3, :3]
    R_gt = gt_poses[:, :3, :3]
    # Align with the first frame to remove the global gauge rotation.
    A = R_est[0].T
    B = R_gt[0].T
    errs = []
    for i in range(len(R_est)):
        Re = R_est[i] @ A
        Rg = R_gt[i] @ B
        dR = Re @ Rg.T
        c = np.clip((np.trace(dR) - 1.0) / 2.0, -1.0, 1.0)
        errs.append(np.degrees(np.arccos(c)))
    return np.asarray(errs)
