"""Registry for subcommands added by later build stages.

Each stage appends a ``register_*`` function here; ``main.build_parser``
calls ``register(sub)`` once.
"""

from __future__ import annotations


def register(sub) -> None:
    _register_placeholder(sub)


def _register_placeholder(sub) -> None:
    # Replaced as debias/generate/eval subcommands land.
    return None
