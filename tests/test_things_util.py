"""stable_positions: the compare-reduce and double-argsort paths are the
same function (and both equal the brute-force stable rank)."""

import numpy as np
import jax.numpy as jnp

from doomtpu.render.things import stable_positions


def _brute(key):
    B, I = key.shape
    out = np.zeros((B, I), np.int32)
    for b in range(B):
        order = sorted(range(I), key=lambda j: (key[b, j], j))
        for pos, j in enumerate(order):
            out[b, j] = pos
    return out


def test_stable_positions_paths_agree():
    rng = np.random.default_rng(3)
    # heavy ties stress the stable tie-break
    key = rng.integers(-5, 5, size=(4, 37)).astype(np.int32)
    ref = _brute(key)
    k = jnp.asarray(key)
    small = np.asarray(stable_positions(k, size_cutoff=1024))
    large = np.asarray(stable_positions(k, size_cutoff=0))
    np.testing.assert_array_equal(small, ref)
    np.testing.assert_array_equal(large, ref)
