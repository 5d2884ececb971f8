from doomtpu.utils import fixed  # noqa: F401
