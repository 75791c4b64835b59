"""Multi-process (multi-host analogue) render test — VERDICT r3 task 7.

Spawns TWO separate Python processes that bring up ``jax.distributed``
over a localhost coordinator (4 virtual CPU devices each -> a global
8-device mesh), run the band-sharded SPMD renderer across BOTH processes
(film halo ppermutes now cross the process boundary — the DCN leg of
SURVEY §2.3), and assert the result equals the single-process 8-device
render: the counter-based sampler makes the image deterministic across
process topologies.
"""

import os
import socket
import subprocess
import sys
import tempfile

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_render_matches_single_process():
    # single-process reference on this process's 8 virtual devices
    import jax

    from gopbrt_tpu.models.gallery import config2
    from gopbrt_tpu.parallel import shard

    scene, camera, settings = config2(48, 48)
    settings = settings._replace(spp=4, samples_per_pass=2, max_depth=3)
    mesh = shard.make_mesh(data=8, sample=1)
    ref = np.asarray(shard.render_sharded(mesh, scene, camera, settings))

    port = _free_port()
    coordinator = f"localhost:{port}"
    out = os.path.join(tempfile.mkdtemp(), "dist_img.npy")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = ""  # workers set their own device count
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "tests._distributed_worker",
             coordinator, str(pid), "2", out],
            env=env,
            cwd=REPO,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    logs = []
    for p in procs:
        try:
            o, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            o, _ = p.communicate()
        logs.append(o)
    tails = "\n---\n".join(log[-3000:] for log in logs)
    if any(p.returncode != 0 for p in procs):
        if "gloo" in tails.lower() and (
            "unimplemented" in tails.lower() or "unavailable" in tails.lower()
        ):
            pytest.skip(f"CPU cross-process collectives unavailable:\n{tails}")
        pytest.fail(f"worker failed (rc={[p.returncode for p in procs]}):\n{tails}")
    got = np.load(out)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)
