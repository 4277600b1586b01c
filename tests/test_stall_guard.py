"""scripts/stall_guard.py: the supervisor must restart a child whose
progress artifacts stop moving, and exit cleanly when the child
finishes on its own."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GUARD = os.path.join(REPO, "scripts", "stall_guard.py")


def _run_guard(tmp_path, child_code, stall=6.0, poll=0.5, max_restarts=2,
               timeout=120):
    # stall must comfortably exceed interpreter startup (~1.5s on a
    # loaded 2-vCPU box) or a healthy child gets killed while booting
    child = tmp_path / "child.py"
    child.write_text(child_code)
    progress = tmp_path / "progress.txt"
    out = subprocess.run(
        [sys.executable, GUARD, "--stall-secs", str(stall),
         "--poll-secs", str(poll), "--max-restarts", str(max_restarts),
         "--watch", str(progress), "--",
         sys.executable, str(child), str(progress)],
        capture_output=True, text=True, timeout=timeout)
    return out, progress


def test_healthy_child_passes_through(tmp_path):
    code = (
        "import sys, time\n"
        "p = sys.argv[1]\n"
        "for i in range(6):\n"
        "    open(p, 'a').write('tick %d\\n' % i)\n"
        "    time.sleep(0.5)\n"
    )
    out, _ = _run_guard(tmp_path, code)
    assert out.returncode == 0, out.stderr
    assert "killing" not in out.stderr


def test_stalled_child_is_killed_and_restarted_to_success(tmp_path):
    # first run stalls forever after one tick; on restart the child sees
    # its marker file and finishes immediately — the guard must converge
    code = (
        "import os, sys, time\n"
        "p = sys.argv[1]\n"
        "marker = p + '.second_run'\n"
        "open(p, 'a').write('tick\\n')\n"
        "if os.path.exists(marker):\n"
        "    sys.exit(0)\n"
        "open(marker, 'w').write('x')\n"
        "time.sleep(3600)\n"
    )
    out, progress = _run_guard(tmp_path, code)
    assert out.returncode == 0, out.stderr
    assert "killing" in out.stderr
    assert "restart 1" in out.stderr


def test_gives_up_after_max_restarts(tmp_path):
    code = "import sys; sys.exit(3)\n"
    out, _ = _run_guard(tmp_path, code, max_restarts=1)
    assert out.returncode == 3
    assert "giving up" in out.stderr
