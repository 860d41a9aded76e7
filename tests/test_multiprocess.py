"""True multi-process distributed Lanczos (2 OS processes over gloo)."""

import os
import socket
import subprocess
import sys

import pytest


def test_two_process_distributed_lanczos():
    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "multiproc_worker.py")
    # find a free port
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = str(s.getsockname()[1])
    s.close()
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")}
    p1 = subprocess.Popen([sys.executable, worker, "1", port], env=env,
                          stdout=subprocess.PIPE,
                          stderr=subprocess.STDOUT)
    p0 = subprocess.run([sys.executable, worker, "0", port], env=env,
                        capture_output=True, text=True, timeout=300)
    p1.wait(timeout=60)
    assert "MULTIPROC PASS" in p0.stdout, p0.stdout + p0.stderr
