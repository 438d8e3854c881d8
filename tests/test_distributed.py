"""True multi-process jax.distributed run: 2 CPU processes x 2 devices.

The rest of the suite validates sharding on a single-process virtual mesh;
this test exercises the actual multi-host machinery (Gloo coordinator,
cross-process global arrays, sharded DSM update, rank-0 gather) by spawning
two subprocess workers — the closest a single host gets to a pod slice.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import os, sys
    pid = int(sys.argv[1]); port = sys.argv[2]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    from aerial_mapper_tpu.parallel.distributed import (
        initialize_distributed, gather_row_bands_to_host, is_rank0)

    multi = initialize_distributed(
        f"localhost:{{port}}", num_processes=2, process_id=pid)
    assert multi and jax.device_count() == 4
    assert jax.local_device_count() == 2

    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P
    from aerial_mapper_tpu.config import DsmConfig
    from aerial_mapper_tpu.mapgrid.grid import MapGeometry, create_map_state
    from aerial_mapper_tpu.parallel.mesh import make_mesh
    from aerial_mapper_tpu.parallel.sharded import (
        shard_layers, sharded_dsm_update)

    geom = MapGeometry(0.0, 0.0, 1.0, 32, 40)
    mesh = make_mesh(("tiles",), shape=(4,), devices=jax.devices())
    pts = np.random.RandomState(0).uniform(
        -20, 20, (5000, 3)).astype(np.float32)
    pts[:, 2] = 414.0
    pts_g = multihost_utils.host_local_array_to_global_array(pts, mesh, P())
    valid_g = multihost_utils.host_local_array_to_global_array(
        np.ones((5000,), bool), mesh, P())
    layers = shard_layers(dict(create_map_state(geom).layers), mesh, "tiles")
    elev = sharded_dsm_update(
        layers["elevation"], pts_g, valid_g, geom,
        DsmConfig(interpolation_radius_sq=2.0), mesh)
    full = gather_row_bands_to_host(elev, mesh)
    if is_rank0():
        cov = float(np.isfinite(full).mean())
        mean = float(np.nanmean(full))
        assert cov > 0.9, cov
        assert abs(mean - 414.0) < 1e-3, mean
        print(f"RANK0_OK {{cov:.3f}} {{mean:.2f}}", flush=True)
    """
)


def test_two_process_distributed_dsm(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=repo))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}

    # picking an ephemeral port then releasing it is racy (another process
    # can claim it before the coordinator binds) — retry with a fresh port
    outs = None
    for _attempt in range(3):
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        procs = [
            subprocess.Popen(
                [sys.executable, str(script), str(pid), str(port)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
                env=env,
            )
            for pid in (0, 1)
        ]
        outs = [p.communicate(timeout=220)[0] for p in procs]
        if all(p.returncode == 0 for p in procs):
            break
    assert all(p.returncode == 0 for p in procs), outs
    assert "RANK0_OK" in outs[0], outs[0][-2000:]
