"""Distributed helpers (single-process degradation paths)."""
import pytest

from s2m2_tpu.parallel.distributed import (global_mesh, initialize_distributed,
                                           scaling_report)


def test_initialize_noop_single_process():
    assert initialize_distributed() is False


def test_global_mesh_covers_all_devices():
    mesh = global_mesh(n_data=2, n_band=4)
    assert mesh.axis_names == ("data", "band")
    assert mesh.devices.shape == (2, 4)


def test_global_mesh_rejects_bad_shape():
    with pytest.raises(ValueError):
        global_mesh(n_data=3, n_band=4)


def test_scaling_report():
    rep = scaling_report(per_chip_fps=2.5, n_chips=8, base_fps=2.75)
    assert rep["fps_total"] == 20.0
    assert abs(rep["scaling_efficiency"] - 2.5 / 2.75) < 1e-9


def test_two_process_loopback(tmp_path):
    """Real 2-process jax.distributed bring-up over loopback CPU:
    initialize_distributed wires both processes, global_mesh spans all
    devices host-major, and a cross-process collective runs."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    addr = f"127.0.0.1:{port}"

    child = tmp_path / "child.py"
    child.write_text(
        "import os, sys\n"
        "os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import numpy as np\n"
        "from jax.experimental import multihost_utils\n"
        "from s2m2_tpu.parallel.distributed import (global_mesh,\n"
        "    initialize_distributed)\n"
        "pid = int(sys.argv[1]); addr = sys.argv[2]\n"
        "assert initialize_distributed(coordinator_address=addr,\n"
        "                              num_processes=2, process_id=pid)\n"
        "assert jax.process_count() == 2\n"
        "mesh = global_mesh()  # data=2 processes x band=2 local devices\n"
        "assert mesh.devices.shape == (2, 2)\n"
        "assert all(d.process_index == i for i in range(2)\n"
        "           for d in mesh.devices[i])\n"
        "g = multihost_utils.process_allgather(np.array([float(pid + 1)]))\n"
        "print('ALLGATHER', sorted(g.ravel().tolist()), flush=True)\n"
    )
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, str(child), str(i), addr],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=repo_root)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert "ALLGATHER [1.0, 2.0]" in out, out
