from .ecc import ecc_match, ecc_match_arrays  # noqa: F401
from .keypoint import keypoint_match, keypoint_match_arrays  # noqa: F401
