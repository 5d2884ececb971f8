from doomtpu.assets.bundle import LevelAssets  # noqa: F401
