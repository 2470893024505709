from .sharding import (
    make_mesh, trace_sharded, train_step, split_params, DIFF_FIELDS, RAY_AXIS,
    render_tiles_sharded,
)
