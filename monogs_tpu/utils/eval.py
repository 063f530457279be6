"""Trajectory and rendering evaluation.

Counterpart of /root/reference/utils/eval_utils.py (evo + torchmetrics based)
without external metric deps: ATE via closed-form Umeyama alignment + APE
translation RMSE, rendering metrics via the in-repo PSNR/SSIM. The reference
discards its alignment result (eval_utils.py:92, effectively unaligned APE);
both modes are provided and the unaligned one is the parity default.

Artifacts mirror the reference layout: plot/trj_{final|_<idx>}.json and
plot/stats_*.json under the run's save_dir (eval_utils.py:69-107).
"""

from __future__ import annotations

import json
import os

import numpy as np


def pose_w2c_to_c2w(R, t):
    R = np.asarray(R, np.float64)
    t = np.asarray(t, np.float64)
    T = np.eye(4)
    T[:3, :3] = R.T
    T[:3, 3] = -R.T @ t
    return T


def umeyama_alignment(src: np.ndarray, dst: np.ndarray, with_scale: bool = False):
    """Least-squares similarity transform aligning src -> dst, both (N,3).

    Returns (s, R, t) with dst ≈ s * R @ src + t (Umeyama 1991 closed form).
    """
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / src.shape[0]
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if with_scale:
        var_s = (xs ** 2).sum() / src.shape[0]
        s = float(np.trace(np.diag(D) @ S) / var_s)
    else:
        s = 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def ate_rmse(
    est_c2w: list, gt_c2w: list, align: bool = False, align_scale: bool = False
) -> float:
    """APE translation RMSE between trajectories of (4,4) c2w matrices
    (eval_utils.py:80-107 semantics; align=False matches the reference's
    discarded-alignment behavior)."""
    est = np.stack([T[:3, 3] for T in est_c2w])
    gt = np.stack([T[:3, 3] for T in gt_c2w])
    if align and est.shape[0] >= 3:
        s, R, t = umeyama_alignment(est, gt, with_scale=align_scale)
        est = (s * (R @ est.T)).T + t
    err = np.linalg.norm(est - gt, axis=1)
    return float(np.sqrt(np.mean(err ** 2)))


def eval_traj_ate(
    est_poses: dict,        # frame_idx -> (R, t) w2c
    gt_poses: dict,         # frame_idx -> (R, t) w2c
    save_dir: str | None = None,
    label: str = "final",
    kf_indices: list | None = None,
    align: bool = False,
    align_scale: bool = False,
) -> float:
    """eval_utils.py:26-128: ATE over all frames (or keyframes only), with
    trajectory + stats JSON artifacts."""
    idxs = sorted(est_poses.keys()) if kf_indices is None else sorted(kf_indices)
    est = [pose_w2c_to_c2w(*est_poses[i]) for i in idxs]
    gt = [pose_w2c_to_c2w(*gt_poses[i]) for i in idxs]
    rmse = ate_rmse(est, gt, align=align, align_scale=align_scale)

    if save_dir is not None:
        plot_dir = os.path.join(save_dir, "plot")
        os.makedirs(plot_dir, exist_ok=True)
        with open(os.path.join(plot_dir, f"trj_{label}.json"), "w") as f:
            json.dump(
                {
                    "trj_id": idxs,
                    "trj_est": [T.tolist() for T in est],
                    "trj_gt": [T.tolist() for T in gt],
                },
                f,
            )
        with open(os.path.join(plot_dir, f"stats_{label}.json"), "w") as f:
            json.dump({"rmse": rmse, "aligned": align, "n_frames": len(idxs)}, f)
        _plot_trajectory(
            est, gt, rmse, os.path.join(plot_dir, f"trj_{label}.png")
        )
    return rmse


def _plot_trajectory(est_c2w, gt_c2w, rmse, path):
    """Top-down trajectory plot (the evo-plot analogue,
    eval_utils.py:109-126). Best effort — skipped without matplotlib."""
    try:  # pragma: no cover - plotting side effect
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        est = np.stack([T[:3, 3] for T in est_c2w])
        gt = np.stack([T[:3, 3] for T in gt_c2w])
        fig, ax = plt.subplots(figsize=(6, 6))
        ax.plot(gt[:, 0], gt[:, 2], "k--", label="ground truth")
        ax.plot(est[:, 0], est[:, 2], "c-", label="estimate")
        ax.scatter(est[0, 0], est[0, 2], c="g", marker="^", label="start")
        ax.set_xlabel("x [m]")
        ax.set_ylabel("z [m]")
        ax.set_title(f"ATE RMSE {rmse:.4f} m")
        ax.legend()
        ax.set_aspect("equal", adjustable="datalim")
        fig.tight_layout()
        fig.savefig(path, dpi=90)
        plt.close(fig)
    except Exception:
        pass


def eval_rendering(
    render_fn,              # frame_idx -> (H,W,3) rendered rgb (est pose)
    gt_fn,                  # frame_idx -> ((H,W,3) rgb, (H,W) depth or None)
    frame_indices,
    save_dir: str | None = None,
    label: str = "final",
    extra: dict | None = None,
):
    """eval_utils.py:131-208: PSNR/SSIM (masked to gt-present pixels) over
    the given frames. LPIPS is reported when torchmetrics is importable
    (the reference's lpips-alex); otherwise omitted."""
    import jax.numpy as jnp

    from ..ops.losses import ssim as ssim_fn

    lpips_model = None
    try:  # pragma: no cover - optional heavy dep
        import torch
        from torchmetrics.image.lpip import (
            LearnedPerceptualImagePatchSimilarity,
        )

        lpips_model = LearnedPerceptualImagePatchSimilarity(
            net_type="alex", normalize=True
        )
    except Exception:
        pass

    psnrs, ssims, lpips_vals = [], [], []
    for idx in frame_indices:
        out = np.asarray(render_fn(idx))
        gt_rgb, _ = gt_fn(idx)
        gt_rgb = np.asarray(gt_rgb)
        # Reference masking semantics (eval_utils.py:181-184): PSNR over the
        # gt>0 ELEMENTS only (per-channel mask, masked elements excluded from
        # the mean); SSIM and LPIPS on the FULL frames, unmasked.
        mask = gt_rgb > 0
        n_sel = int(mask.sum())
        if n_sel:
            mse = float(((out - gt_rgb)[mask] ** 2).mean())
            psnrs.append(20.0 * np.log10(1.0 / np.sqrt(max(mse, 1e-12))))
        else:
            psnrs.append(0.0)
        ssims.append(float(ssim_fn(jnp.asarray(out), jnp.asarray(gt_rgb))))
        if lpips_model is not None:  # pragma: no cover
            import torch

            a = torch.from_numpy(np.clip(out, 0, 1).transpose(2, 0, 1))[None]
            b = torch.from_numpy(
                np.clip(gt_rgb, 0, 1).transpose(2, 0, 1))[None]
            lpips_vals.append(float(lpips_model(a.float(), b.float())))

    result = {
        "mean_psnr": float(np.mean(psnrs)) if psnrs else 0.0,
        "mean_ssim": float(np.mean(ssims)) if ssims else 0.0,
        "mean_lpips": float(np.mean(lpips_vals)) if lpips_vals else None,
        "n_frames": len(psnrs),
    }
    if extra:
        result.update(extra)
    if save_dir is not None:
        out_dir = os.path.join(save_dir, "psnr", label)
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "final_result.json"), "w") as f:
            json.dump(result, f)
    return result
