from doomtpu.wad.reader import WadFile, MapLump  # noqa: F401
from doomtpu.wad.builder import WadBuilder  # noqa: F401
