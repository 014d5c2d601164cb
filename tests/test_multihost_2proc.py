"""REAL multi-process DCN execution of the distributed top-k merge.

Spawns two `jax.distributed` processes on localhost (CPU backend) that
each join the coordination service, take their shard of a global score
vector, and merge winners through `multihost.global_topk` — executing
the `process_allgather` branch (parallel/multihost.py:126-129) that
single-process tests cannot reach.  Both processes must agree on the
exact global top-k.

The reference has no distributed execution at all (SURVEY.md §2.3);
this is the ≥80% 1→N-host scaling target's correctness leg
(BASELINE.md) running as two genuine OS processes.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

_WORKER = Path(__file__).with_name("multihost_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_global_topk():
    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # Workers must not inherit the parent's forced 8-virtual-device flag
    # interplay; keep whatever XLA_FLAGS conftest set (harmless for this
    # host-level merge) but pin the platform explicitly.
    procs = [
        subprocess.Popen(
            [sys.executable, str(_WORKER), coordinator, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=240)
            outs.append((p.returncode, out, err))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process workers timed out: "
                    + repr([(p.pid, p.poll()) for p in procs]))

    results = {}
    for rc, out, err in outs:
        assert rc == 0, f"worker failed (rc={rc}):\n{out}\n{err[-2000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert line, f"no RESULT line in worker output:\n{out}\n{err[-2000:]}"
        rec = json.loads(line[-1][len("RESULT "):])
        results[rec["pid"]] = rec

    assert set(results) == {0, 1}
    for rec in results.values():
        assert rec["process_count"] == 2, "workers did not join one runtime"
        assert rec["ok"], f"global top-k mismatch: {rec}"
    # Both processes must see the SAME global answer.
    assert results[0]["vals"] == results[1]["vals"]
    assert results[0]["idx"] == results[1]["idx"]
