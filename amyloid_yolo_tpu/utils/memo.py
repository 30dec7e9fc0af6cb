"""Identity-guarded, LRU-bounded memoization for jitted programs.

``jax.jit`` caches compiled executables by FUNCTION IDENTITY: a call
site that builds a fresh closure per call recompiles its program every
time (multi-minute each through the remote-compile relay).  Callers key
their cache on ``id()`` of the guard objects (spec / mesh) plus config;
the guards are held in the cache value so their ids cannot be recycled
to a different object, and the LRU bound evicts old entries so a
config-sweeping process (test suites, resolution sweeps) doesn't pin
dead specs and their compiled XLA programs for process lifetime.

One policy, two users: ``evaluate.make_eval_fn`` and
``parallel.spatial`` — keep them on this helper so the semantics can't
drift apart.
"""

from __future__ import annotations

from typing import Callable, Tuple


def memoized_program(cache: dict, max_entries: int, key,
                     guards: Tuple, build: Callable):
    """Return ``cache[key]``'s program if every guard object is identical
    (``is``) to the cached one; otherwise ``build()`` a fresh program,
    evicting least-recently-used entries past ``max_entries``."""
    hit = cache.get(key)
    if (hit is not None and len(hit[0]) == len(guards)
            and all(a is b for a, b in zip(hit[0], guards))):
        cache[key] = cache.pop(key)  # LRU touch (dicts preserve order)
        return hit[1]
    fn = build()
    while len(cache) >= max_entries:
        cache.pop(next(iter(cache)))
    cache[key] = (tuple(guards), fn)
    return fn
