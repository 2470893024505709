"""Worker for the 2-process jax.distributed CPU-cluster test.

Launched twice by tests/test_multichip.py::test_two_process_distributed
(argv: coordinator_address process_id out_path).  Each process owns 4
virtual CPU devices; the pair forms an 8-device global mesh and renders
the `simple` scene via the REAL multi-host path (initialize ->
global_mesh -> make_global_rays -> trace_sharded psum ->
fetch_replicated).  Process 0 writes the linear image to out_path.
"""
import os
import sys


def main():
    coord, pid, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]

    # CPU backend with 4 virtual devices BEFORE jax initializes.
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import numpy as np
    import scenes
    from portrayer_tpu import RenderConfig, flatten_scene
    from portrayer_tpu.parallel.distributed import (
        initialize, global_mesh, render_frame_distributed,
    )

    active = initialize(coordinator_address=coord, num_processes=2,
                        process_id=pid)
    assert active, "initialize() did not form a multi-process runtime"
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, jax.devices()
    assert len(jax.local_devices()) == 4

    mesh = global_mesh()
    spec = scenes.load("simple")
    cfg = RenderConfig(samples=2, accel="flat", node_chunk=16)
    st = flatten_scene(spec.scene, dtype=cfg.dtype)
    img = render_frame_distributed(
        mesh, st, spec.camera, (32, 32), spec.background, cfg)
    assert np.isfinite(img).all()
    if pid == 0:
        np.save(out_path, img)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
