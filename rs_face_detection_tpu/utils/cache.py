"""Per-instance memoization for jit-executable factories.

functools.lru_cache on a method keys the cache on `self` at class level:
strong references pin every instance (model weights + compiled executables)
for process lifetime, and instances evict each other under one shared
maxsize.  `instance_cache` stores the memo dict on the instance instead, so
executables die with their owner and never cross instances.
"""

from __future__ import annotations

import functools


def instance_cache(fn):
    """Memoize a method per instance, keyed by its (hashable) positional args."""
    attr = f"_instance_cache_{fn.__name__}"

    @functools.wraps(fn)
    def wrapper(self, *args):
        cache = self.__dict__.setdefault(attr, {})
        if args not in cache:
            cache[args] = fn(self, *args)
        return cache[args]

    return wrapper
