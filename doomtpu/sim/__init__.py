from doomtpu.sim.state import GameState  # noqa: F401
from doomtpu.sim.thinkers import ThinkerTables  # noqa: F401
