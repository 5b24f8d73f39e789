from . import color, filters, resize, sharpness, warp  # noqa: F401
