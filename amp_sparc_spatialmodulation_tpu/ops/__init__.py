from . import channel, message, denoise  # noqa: F401
