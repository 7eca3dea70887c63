"""RNG key fan-out that never blocks on the device.

Python-iterating a jax array (``iter(jax.random.split(key, n))``) goes
through ``Array.__iter__``'s chunked fetch, which synchronously copies key
material device->host. On a tunneled TPU each fetch is a network round
trip, and a sporadic tunnel stall turns parameter init into a minutes-long
hang (observed: ``vae.init_params`` stuck >5 min inside ``_chunk_iter``).

``key_iter`` yields ``keys[i]`` device *slices* instead: lazy, dispatched
async, zero host transfers. Init-time randomness stays bit-identical to
the ``iter(split(...))`` spelling because the underlying split is the same.
"""

from __future__ import annotations

from typing import Iterator

import jax


def key_iter(key: jax.Array, n: int) -> Iterator[jax.Array]:
    """Iterate ``n`` subkeys of ``key`` without device->host fetches."""
    keys = jax.random.split(key, n)
    return (keys[i] for i in range(n))
