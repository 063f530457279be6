"""Generate a production-scale TUM-layout fixture from the synthetic room.

VERDICT r4 task 6 (real-dataset dress rehearsal): the real TUM/Replica
hosts are unreachable from the zero-egress rig, so this writes the room
scene (640x480, 200 frames — the same GT frames as the committed protocol
runs, reusing their disk cache) in the EXACT on-disk layout TUMDataset
parses (/root/reference/utils/dataset.py:135-216 protocol):

    <out>/rgb/<stamp>.png          8-bit RGB
    <out>/depth/<stamp>.png        16-bit, depth * 5000 (TUM convention)
    <out>/rgb.txt, depth.txt       '# comment' header + 'stamp path' rows
    <out>/groundtruth.txt          header + 'stamp tx ty tz qx qy qz qw'
                                   (c2w, TUM quaternion order)

Streams are deliberately NOT aligned: rgb at 30 Hz with +-3 ms jitter,
depth offset +11 ms with its own jitter, groundtruth at ~90 Hz — so the
nearest-timestamp association and 32 Hz thinning do real work, as on the
real sensor logs.

Usage:  python scripts/make_tum_fixture.py [out_dir]
Then:   python slam.py --config configs/rgbd/tum/room_fixture.yaml --eval
"""

import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

OUT = sys.argv[1] if len(sys.argv) > 1 else os.path.expanduser(
    "~/.cache/monogs_tum_fixture/room200")
DEPTH_SCALE = 5000.0


def rot_to_quat(R):
    """(3,3) -> (qx, qy, qz, qw), TUM groundtruth order."""
    w = np.sqrt(max(0.0, 1.0 + R[0, 0] + R[1, 1] + R[2, 2])) / 2.0
    if w > 1e-6:
        x = (R[2, 1] - R[1, 2]) / (4 * w)
        y = (R[0, 2] - R[2, 0]) / (4 * w)
        z = (R[1, 0] - R[0, 1]) / (4 * w)
    else:  # pragma: no cover - degenerate 180-deg case, not hit on the orbit
        i = int(np.argmax(np.diag(R)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(max(0.0, 1.0 + R[i, i] - R[j, j] - R[k, k])) * 2
        q = np.zeros(4)
        q[i] = s / 4
        q[j] = (R[j, i] + R[i, j]) / s
        q[k] = (R[k, i] + R[i, k]) / s
        x, y, z = q[:3]
        w = (R[k, j] - R[j, k]) / s
    return x, y, z, w


def main():
    import cv2

    from monogs_tpu.data import load_dataset
    from monogs_tpu.utils.config import load_config

    cfg = load_config("configs/synthetic/room_final.yaml")
    ds = load_dataset(cfg)
    n = len(ds)
    print(f"room scene: {n} frames -> {OUT}")

    os.makedirs(os.path.join(OUT, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(OUT, "depth"), exist_ok=True)
    rng = np.random.default_rng(7)
    t0 = 1341840000.0  # fr3-era epoch; arbitrary
    rgb_rows, depth_rows, gt_rows = [], [], []

    for i in range(n):
        d = ds[i]
        t_rgb = t0 + i / 30.0 + rng.uniform(-0.003, 0.003)
        t_dep = t0 + i / 30.0 + 0.011 + rng.uniform(-0.003, 0.003)
        rgb_name = f"rgb/{t_rgb:.6f}.png"
        dep_name = f"depth/{t_dep:.6f}.png"
        bgr = cv2.cvtColor(
            (np.clip(d["rgb"], 0, 1) * 255).astype(np.uint8),
            cv2.COLOR_RGB2BGR)
        cv2.imwrite(os.path.join(OUT, rgb_name), bgr)
        dep16 = np.clip(d["depth"] * DEPTH_SCALE, 0, 65535).astype(np.uint16)
        cv2.imwrite(os.path.join(OUT, dep_name), dep16)
        rgb_rows.append(f"{t_rgb:.6f} {rgb_name}")
        depth_rows.append(f"{t_dep:.6f} {dep_name}")

        # c2w groundtruth at ~3 samples per frame (sensor-rate pose log);
        # only the one nearest the rgb stamp carries the exact pose, the
        # others interpolate crudely — association must pick the nearest.
        T = d["pose"]  # w2c
        Rc2w = T[:3, :3].T
        tc2w = -Rc2w @ T[:3, 3]
        qx, qy, qz, qw = rot_to_quat(Rc2w)
        for k in (-1, 0, 1):
            tg = t_rgb + k * 0.0111 + rng.uniform(-0.001, 0.001)
            gt_rows.append(
                f"{tg:.6f} {tc2w[0]:.6f} {tc2w[1]:.6f} {tc2w[2]:.6f} "
                f"{qx:.6f} {qy:.6f} {qz:.6f} {qw:.6f}"
            )
        if (i + 1) % 25 == 0:
            print(f"  {i + 1}/{n}")

    with open(os.path.join(OUT, "rgb.txt"), "w") as f:
        f.write("# color images\n" + "\n".join(rgb_rows) + "\n")
    with open(os.path.join(OUT, "depth.txt"), "w") as f:
        f.write("# depth images\n" + "\n".join(depth_rows) + "\n")
    with open(os.path.join(OUT, "groundtruth.txt"), "w") as f:
        f.write("# ground truth trajectory\n"
                + "\n".join(sorted(gt_rows)) + "\n")
    print("fixture complete")


if __name__ == "__main__":
    main()
