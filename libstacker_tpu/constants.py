"""OpenCV-compatible integer constants used across the public API.

The reference crate re-exports OpenCV constants directly (e.g.
``opencv::calib3d::RANSAC`` used in ``KeyPointMatchParameters`` at
reference ``src/lib.rs:49-73`` and border modes at ``src/lib.rs:66-72``).
We keep the same integer values so that parameter structs round-trip
against OpenCV-based tests and user code ports over unchanged.
"""

# --- calib3d homography estimation methods (cv2.LMEDS / cv2.RANSAC) ---
LMEDS = 4
RANSAC = 8
RHO = 16

# --- border modes (cv2.BORDER_*) ---
BORDER_CONSTANT = 0
BORDER_REPLICATE = 1
BORDER_REFLECT = 2
BORDER_WRAP = 3
BORDER_REFLECT_101 = 4
BORDER_TRANSPARENT = 5
BORDER_DEFAULT = BORDER_REFLECT_101
BORDER_ISOLATED = 16

# --- motion types (cv2.MOTION_*) used by the ECC path ---
MOTION_TRANSLATION = 0
MOTION_EUCLIDEAN = 1
MOTION_AFFINE = 2
MOTION_HOMOGRAPHY = 3

# --- interpolation flags (cv2.INTER_*) ---
INTER_NEAREST = 0
INTER_LINEAR = 1
INTER_CUBIC = 2
INTER_AREA = 3

# --- TermCriteria type bits (cv2.TERM_CRITERIA_*) ---
TERM_CRITERIA_COUNT = 1
TERM_CRITERIA_EPS = 2

# Internal border-mode name mapping used by ops.
_BORDER_MODE_NAMES = {
    BORDER_CONSTANT: "constant",
    BORDER_REPLICATE: "replicate",
    BORDER_REFLECT: "reflect",
    BORDER_WRAP: "wrap",
    BORDER_REFLECT_101: "reflect101",
    BORDER_TRANSPARENT: "transparent",
}


def border_mode_name(mode: int) -> str:
    """Map an OpenCV border-mode integer to the internal string name."""
    try:
        return _BORDER_MODE_NAMES[mode]
    except KeyError:
        raise ValueError(f"Unsupported border mode: {mode}")
