from uce_tpu.ops.solver import (  # noqa: F401
    uce_edit_matrix,
    uce_solve_layer,
    uce_solve_stacked,
    apply_edit_matrix,
)
