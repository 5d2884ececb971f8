from doomtpu.level.tables import MapTables  # noqa: F401
