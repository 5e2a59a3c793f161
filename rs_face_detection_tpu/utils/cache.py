"""Per-instance bounded memoization for jit-executable factories.

functools.lru_cache on a method keys the cache on `self` at class level:
strong references pin every instance (model weights + compiled executables)
for process lifetime, and instances evict each other under one shared
maxsize.  `instance_cache` stores a bounded LRU dict on the instance instead,
so executables die with their owner, never cross instances, and a long-lived
server handling arbitrary input shapes cannot leak compiled executables
without bound.
"""

from __future__ import annotations

import functools
from collections import OrderedDict


def instance_cache(fn=None, *, maxsize: int = 32):
    """Memoize a method per instance (LRU, bounded), keyed by positional args."""

    def decorate(fn):
        attr = f"_instance_cache_{fn.__name__}"

        @functools.wraps(fn)
        def wrapper(self, *args):
            cache: OrderedDict = self.__dict__.setdefault(attr, OrderedDict())
            if args in cache:
                cache.move_to_end(args)
                return cache[args]
            value = fn(self, *args)
            cache[args] = value
            if len(cache) > maxsize:
                cache.popitem(last=False)
            return value

        return wrapper

    if fn is not None:
        return decorate(fn)
    return decorate
