from . import se3, camera, noise, alignment, frames  # noqa: F401
