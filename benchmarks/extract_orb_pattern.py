"""Recover OpenCV ORB's rBRIEF sampling pattern by black-box probing.

The 256 descriptor bits each compare two fixed offsets inside the 31x31
patch (the learned pattern from the ORB paper, public data shipped with
OpenCV).  Rather than copying the table, we *recover* it empirically:
feed random images + angle-0 keypoints to cv2's ORB.compute, observe the
bits, and identify for every bit the unique offset pair consistent with
all observations.  Writes libstacker_tpu/ops/_orb_pattern.py.

Also verifies the rotation convention (steered BRIEF) by probing
angle=90 keypoints against the recovered pattern.
"""

import sys

import cv2
import numpy as np

R = 15  # search half-size (recovered offsets all lie within +-13)
SIDE = 2 * R + 1  # 31
N_IMGS = 72
H = W = 96
CX = CY = 48


def blurred(img):
    # ORB blurs the (border-padded) level image with GaussianBlur(7,7,2,2)
    # BORDER_REFLECT_101 before sampling descriptor bits.
    return cv2.GaussianBlur(img, (7, 7), 2, 2, borderType=cv2.BORDER_REFLECT_101)


def descriptor_bits(images, angle):
    orb = cv2.ORB_create()
    bits = []
    for img in images:
        kp = cv2.KeyPoint(float(CX), float(CY), 31.0, angle, 0.0, 0)
        kps, des = orb.compute(img, [kp])
        assert des is not None and des.shape == (1, 32), des
        bits.append(np.unpackbits(des[0], bitorder="little"))
    return np.array(bits)  # [N, 256]


def main():
    rng = np.random.default_rng(20260816)
    images = [
        cv2.GaussianBlur(
            rng.integers(0, 256, (H, W), dtype=np.uint8), (3, 3), 0.8
        )
        for _ in range(N_IMGS)
    ]
    obs = descriptor_bits(images, angle=0.0)  # [N,256]

    # candidate sample values: V[n, pos] with pos = (dy+R)*31 + (dx+R)
    vals = np.zeros((N_IMGS, SIDE * SIDE), np.int32)
    for n, img in enumerate(images):
        b = blurred(img)
        patch = b[CY - R : CY + R + 1, CX - R : CX + R + 1]
        vals[n] = patch.reshape(-1).astype(np.int32)

    # P[i,j] bitmask over images of (V[:,i] < V[:,j])
    npos = SIDE * SIDE
    pmask = np.zeros((npos, npos), np.uint64)
    for n in range(N_IMGS):
        lt = (vals[n][:, None] < vals[n][None, :]).astype(np.uint64)
        pmask |= lt << np.uint64(n)

    obs_mask = np.zeros(256, np.uint64)
    for n in range(N_IMGS):
        obs_mask |= obs[n].astype(np.uint64) << np.uint64(n)

    # Nearest-pair recovery: a few observations can flip on blur-rounding
    # ties, so pick the pair with minimum Hamming mismatch and check the
    # margin to the runner-up.
    flat = pmask.reshape(-1)
    pattern = np.zeros((256, 4), np.int32)  # x1,y1,x2,y2
    weak = 0
    for k in range(256):
        mism = np.bitwise_count(flat ^ obs_mask[k])
        cand = int(np.argmin(mism))
        best = int(mism[cand])
        second = int(np.partition(mism, 1)[1])
        if best > 3 or second - best < 4:
            weak += 1
            print(
                f"bit {k}: weak identification best={best} second={second}",
                file=sys.stderr,
            )
        i, j = divmod(cand, npos)
        y1, x1 = divmod(i, SIDE)
        y2, x2 = divmod(j, SIDE)
        # bit = (V[p1] < V[p2]) with offsets relative to center
        pattern[k] = (x1 - R, y1 - R, x2 - R, y2 - R)
    print(f"weakly identified bits: {weak}")

    # verify on fresh images, angle 0
    test_imgs = [
        cv2.GaussianBlur(
            rng.integers(0, 256, (H, W), dtype=np.uint8), (3, 3), 0.8
        )
        for _ in range(8)
    ]
    obs_t = descriptor_bits(test_imgs, 0.0)
    err0 = 0
    for n, img in enumerate(test_imgs):
        b = blurred(img).astype(np.int32)
        for k in range(256):
            x1, y1, x2, y2 = pattern[k]
            bit = int(b[CY + y1, CX + x1] < b[CY + y2, CX + x2])
            err0 += bit != obs_t[n, k]
    print(f"angle=0 verification: {err0} bit errors / {8*256}")

    # determine rotation convention at angle=90 deg
    obs_r = descriptor_bits(test_imgs, 90.0)
    conventions = {
        # (x', y') = f(x, y, a=cos, b=sin)
        "cv": lambda x, y, a, b: (round(x * a - y * b), round(x * b + y * a)),
        "cv_t": lambda x, y, a, b: (round(x * a + y * b), round(-x * b + y * a)),
    }
    ang = np.deg2rad(90.0)
    a, b = np.cos(ang), np.sin(ang)
    for name, f in conventions.items():
        err = 0
        for n, img in enumerate(test_imgs):
            blr = blurred(img).astype(np.int32)
            for k in range(256):
                x1, y1, x2, y2 = pattern[k]
                xr1, yr1 = f(x1, y1, a, b)
                xr2, yr2 = f(x2, y2, a, b)
                bit = int(
                    blr[CY + yr1, CX + xr1] < blr[CY + yr2, CX + xr2]
                )
                err += bit != obs_r[n, k]
        print(f"rotation convention {name}: {err} bit errors / {8*256}")

    lines = [
        '"""OpenCV ORB rBRIEF sampling pattern, recovered empirically from',
        "cv2 by black-box probing (benchmarks/extract_orb_pattern.py).",
        "This is the public learned pattern from Rublee et al., ICCV 2011.",
        '"""',
        "",
        "import numpy as np",
        "",
        "# [256, 4] int32: x1, y1, x2, y2 offsets; bit = I(p1) < I(p2)",
        "ORB_PATTERN = np.array([",
    ]
    for k in range(256):
        x1, y1, x2, y2 = pattern[k]
        lines.append(f"    [{x1}, {y1}, {x2}, {y2}],")
    lines.append("], dtype=np.int32)")
    lines.append("")
    out = "/root/repo/libstacker_tpu/ops/_orb_pattern.py"
    with open(out, "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
