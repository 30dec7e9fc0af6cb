"""Full-spec 8-device multichip dryrun, run exactly as the driver runs it.

Round-2 shipped a regression the suite never saw: the driver's
``dryrun_multichip(8)`` aborted (rc=134) on XLA CPU's 40 s collective
rendezvous termination, while the CI-tier DP tests all passed because they
use ``mini_spec`` (``tests/test_parallel.py``).  This test closes that gap
by executing the REAL contract — full ``yolov3_spec``, 8 virtual devices,
one full train step — in a child process, so an abort shows up as a test
failure instead of a dead driver check.

Contract under test: ``__graft_entry__.dryrun_multichip`` (which itself
isolates the heavy work in a grandchild with raised rendezvous timeouts and
retry-on-abort — the round-3 fix).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_full_spec_subprocess():
    env = dict(os.environ)
    # The suite's conftest pins JAX_PLATFORMS etc. for the pytest process;
    # the child must see a clean slate like the driver's invocation does.
    env.pop("AMYOLO_DRYRUN_INLINE", None)
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=env, timeout=3000,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    tail = (proc.stdout or "")[-4000:]
    assert proc.returncode == 0, f"dryrun_multichip(8) rc={proc.returncode}\n{tail}"
    assert "dryrun_multichip(8): ok" in proc.stdout, tail
