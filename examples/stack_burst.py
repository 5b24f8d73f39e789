"""End-to-end burst stacking example — the reference workflow
(ref examples/main.rs:27-160), TPU-native:

1. scan a directory for jpg/jpeg/tif/png frames;
2. score all four sharpness metrics for every frame in ONE batched
   device program (vs the reference's Rayon loop, examples/main.rs:37-49);
3. sort ascending by Tenengrad, print the table, drop the worst frame,
   reverse so the sharpest frame becomes the reference (frame 0);
4. run all four pipeline variants (keypoint full/scaled, ECC
   full/scaled) with phase timings;
5. save the stacked images as PNGs (no GUI on TPU hosts).

Usage:  python examples/stack_burst.py <image_dir> [--out outdir]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def save_png(path, img_f32_rgb):
    from PIL import Image

    arr = np.clip(np.asarray(img_f32_rgb) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("image_dir")
    ap.add_argument("--out", default="stacked_out")
    ap.add_argument("--scale-width", type=float, default=400.0)
    args = ap.parse_args()

    import jax.numpy as jnp

    from libstacker_tpu import (
        EccMatchParameters,
        KeyPointMatchParameters,
        MotionType,
        constants,
        ecc_match_arrays,
        keypoint_match_arrays,
        sharpness_all,
    )
    from libstacker_tpu.ops import color
    from libstacker_tpu.utils import io
    from libstacker_tpu.utils.tracing import PhaseTimer

    timer = PhaseTimer()
    files = io.collect_image_files(args.image_dir)
    if len(files) < 2:
        print(f"need at least 2 frames in {args.image_dir}", file=sys.stderr)
        return 1

    with timer.phase("load+decode"):
        frames = io.load_frames(files)

    with timer.phase("sharpness (all metrics, batched)"):
        grey = color.rgb_to_gray_u8(jnp.asarray(frames))
        metrics = {k: np.asarray(v) for k, v in sharpness_all(grey).items()}

    order = np.argsort(metrics["teng"], kind="stable")
    print("Files ordered by TENG (low quality first)")
    for i in order:
        print(
            f"{str(files[i]):>40s} LAPM:{metrics['lapm'][i]:>9.5f} "
            f"LAPV:{metrics['lapv'][i]:>10.5f} TENG:{metrics['teng'][i]:>9.5f} "
            f"GLVN:{metrics['glvn'][i]:>10.5f}"
        )

    # drop worst, reverse so sharpest is the reference frame
    keep = order[1:][::-1]
    frames = frames[keep]
    print(f"stacking {len(keep)} frames; reference = {files[keep[0]]}")

    os.makedirs(args.out, exist_ok=True)
    kp_params = KeyPointMatchParameters(
        method=constants.RANSAC,
        ransac_reproj_threshold=5.0,
        match_ratio=0.9,
        match_keep_ratio=0.80,
    )
    ecc_params = EccMatchParameters(
        motion_type=MotionType.Homography,
        max_count=5000,
        epsilon=1e-5,
        gauss_filt_size=5,
    )

    with timer.phase("keypoint_match (full res)"):
        dropped, img = keypoint_match_arrays(frames, kp_params, None)
    print(f"keypoint_match dropped frames: {dropped}")
    save_png(os.path.join(args.out, "keypoint_full.png"), img)

    with timer.phase(f"keypoint_match (width {args.scale_width:.0f})"):
        dropped, img = keypoint_match_arrays(frames, kp_params, args.scale_width)
    print(f"keypoint_match(scaled) dropped frames: {dropped}")
    save_png(os.path.join(args.out, "keypoint_scaled.png"), img)

    with timer.phase("ecc_match (full res)"):
        img = ecc_match_arrays(frames, ecc_params, None)
    save_png(os.path.join(args.out, "ecc_full.png"), img)

    with timer.phase(f"ecc_match (width {args.scale_width:.0f})"):
        img = ecc_match_arrays(frames, ecc_params, args.scale_width)
    save_png(os.path.join(args.out, "ecc_scaled.png"), img)

    print(timer.report())
    print(f"stacked images written to {args.out}/")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
