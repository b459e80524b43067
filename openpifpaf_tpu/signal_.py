"""Tiny publish/subscribe signal bus.

Reference parity: ``src/openpifpaf/signal_.py:~5`` — used by video /
animation code to broadcast events like ``'eval_reset'``.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Callable, Dict, List


class Signal:
    subscribers: Dict[str, List[Callable]] = defaultdict(list)

    @classmethod
    def subscribe(cls, name: str, subscriber: Callable) -> None:
        cls.subscribers[name].append(subscriber)

    @classmethod
    def emit(cls, name: str, *args, **kwargs) -> None:
        for subscriber in cls.subscribers[name]:
            subscriber(*args, **kwargs)
