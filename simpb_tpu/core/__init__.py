from . import box3d  # noqa: F401
