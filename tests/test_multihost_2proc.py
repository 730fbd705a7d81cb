"""TRUE multi-process multi-host test (VERDICT r2 item 2): two subprocesses
join via ``jax.distributed.initialize`` on localhost (CPU backend, 4 virtual
devices each -> one 8-device mesh spanning both), run the real multi-host
path — per-process batch shards, ``make_batch_globalizer`` /
``make_replicator`` assembly, a global-joint shard_mapped cluster train
step, a checkpoint save/restore across the process boundary — and the
resulting losses must equal the single-process 8-device run exactly.

This executes ``parallel/mesh.py``'s multi-host branches with
``jax.process_count() == 2`` for real (everything else in
test_multihost.py runs them in the single-process degenerate form)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_run_matches_single_process(tmp_path):
    port = _free_port()
    out = str(tmp_path / "losses")
    ckpt = str(tmp_path / "ckpts")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(HERE), HERE, env.get("PYTHONPATH", "")])
    # share the suite's persistent compile cache
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(HERE, ".jax_cache")

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multihost_worker.py"),
             str(pid), str(port), ckpt, out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)
    ]
    outputs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(stdout.decode(errors="replace"))
    for p, text in zip(procs, outputs):
        assert p.returncode == 0, f"worker failed:\n{text[-4000:]}"

    results = []
    for pid in range(2):
        with open(f"{out}.p{pid}") as f:
            results.append(json.load(f))
    l0, l1 = results[0]["losses"], results[1]["losses"]
    # both processes compute the same replicated losses
    np.testing.assert_allclose(l0, l1, rtol=0, atol=0)

    # single-process 8-device reference (the conftest virtual mesh)
    import multihost_worker as mw
    from iic_tpu.parallel.mesh import (
        make_batch_globalizer, make_mesh, make_replicator)
    mesh = make_mesh(8)
    ref = mw.compute(mesh,
                     globalize=make_batch_globalizer(mesh),
                     replicate=make_replicator(mesh),
                     ckpt_dir=str(tmp_path / "ckpts_sp"),
                     local_slice=slice(None))
    loss1, loss2_live, loss2_restored = l0
    ref1, ref2_live, ref2_restored = ref
    # checkpoint round-trip is exact in both layouts
    assert loss2_live == loss2_restored
    assert ref2_live == ref2_restored
    # and the 2-process losses equal the single-process ones (same global
    # batch, same mesh size, same reduction structure). Step 1 is tight;
    # step 2 sits behind one Adam update (rsqrt of near-zero second
    # moments), which amplifies the cross-layout psum reduction-order ulps
    # to ~1e-4 relative — same-layout determinism is asserted exactly via
    # the checkpoint round-trip above.
    np.testing.assert_allclose(loss1, ref1, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(loss2_live, ref2_live, rtol=5e-4, atol=1e-6)

    # ---- round-3 multi-host paths: padded ragged weighted step, sharded
    # eval with replicated gather, multi-host sub-head selection
    r3_0, r3_1 = results[0]["r3"], results[1]["r3"]
    np.testing.assert_allclose(r3_0, r3_1, rtol=0, atol=0)  # replicated
    ref_r3 = mw.compute_r3(mesh,
                           globalize=make_batch_globalizer(mesh),
                           replicate=make_replicator(mesh))
    # first weighted step (all weights 1): identical program + inputs
    np.testing.assert_allclose(r3_0[0], ref_r3[0], rtol=1e-6, atol=1e-7)
    # ragged padded loss sits behind two Adam updates: cross-layout psum
    # reduction-order ulps amplify (same-layout replication is exact per
    # the r3_0 == r3_1 check above)
    np.testing.assert_allclose(r3_0[1], ref_r3[1], rtol=5e-3, atol=1e-5)
    # sharded eval forward gathers to the same replicated outputs
    np.testing.assert_allclose(r3_0[2], ref_r3[2], rtol=1e-5, atol=1e-5)
    # sub-head selection picks the same head as the single-process path
    assert r3_0[3] == ref_r3[3]
