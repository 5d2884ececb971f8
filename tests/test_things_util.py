"""stable_positions: the compare-reduce and double-argsort paths are the
same function (and both equal the brute-force stable rank)."""

import numpy as np
import jax.numpy as jnp

from doomtpu.render.jmath import stable_positions


def _brute(key):
    B, I = key.shape
    out = np.zeros((B, I), np.int32)
    for b in range(B):
        order = sorted(range(I), key=lambda j: (key[b, j], j))
        for pos, j in enumerate(order):
            out[b, j] = pos
    return out


def test_position_inverse_paths_agree():
    """_select_items' two pos_d formulas: one-hot weighted sum over the
    order == stable argsort of the permutation (its inverse)."""
    rng = np.random.default_rng(5)
    B, G, D = 3, 41, 7
    order = np.stack([rng.permutation(G) for _ in range(B)]).astype(np.int32)
    dsegs = rng.choice(G, size=D, replace=False).astype(np.int32)
    g_iota = np.arange(G, dtype=np.int32)
    onehot = (
        (order[:, :, None] == dsegs[None, None, :]) * g_iota[None, :, None]
    ).sum(1)
    inv = np.asarray(
        jnp.argsort(jnp.asarray(order), axis=1, stable=True)
    )[np.arange(B)[:, None], np.broadcast_to(dsegs, (B, D))]
    np.testing.assert_array_equal(onehot, inv)


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
