"""Registry for subcommands added by later build stages.

Each stage appends a ``register_*`` function here; ``main.build_parser``
calls ``register(sub)`` once.
"""

from __future__ import annotations


def register(sub) -> None:
    from uce_tpu.cli import debias_cmd, edit_cmds
    from uce_tpu.eval import generate

    generate.register_cli(sub)
    debias_cmd.register_cli(sub)
    edit_cmds.register_cli(sub)
