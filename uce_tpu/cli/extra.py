"""Registry for subcommands added by later build stages.

Each stage appends a ``register_*`` function here; ``main.build_parser``
calls ``register(sub)`` once.
"""

from __future__ import annotations


def register(sub) -> None:
    from uce_tpu.cli import (
        debias_cmd,
        edit_cmds,
        flux_gen_cmd,
        hidream_gen_cmd,
        info_cmd,
        serve_cmd,
    )
    from uce_tpu.eval import (
        baselines,
        clip_classify,
        clip_score,
        compare_grids,
        dreamsim,
        generate,
        imageclassify,
        lpips,
        nudenet,
        styleloss,
    )

    generate.register_cli(sub)
    debias_cmd.register_cli(sub)
    edit_cmds.register_cli(sub)
    baselines.register_cli(sub)
    clip_classify.register_cli(sub)
    clip_score.register_cli(sub)
    lpips.register_cli(sub)
    styleloss.register_cli(sub)
    imageclassify.register_cli(sub)
    dreamsim.register_cli(sub)
    nudenet.register_cli(sub)
    compare_grids.register_cli(sub)
    flux_gen_cmd.register_cli(sub)
    hidream_gen_cmd.register_cli(sub)
    info_cmd.register_cli(sub)
    serve_cmd.register_cli(sub)
