"""Wedge-watchdog harness tests (scripts/run_with_watchdog.sh).

The axon tunnel twice wedged a live chip trainer (rounds 2 and 4: near-zero
trainer CPU for 15+ min while holding the device); the watchdog detects a
child that stops accumulating CPU and recycles it so restart-on-death
drivers resume from the last checkpoint instead of sitting dead. These
tests drive the real script with short windows:

  * a SIGSTOPped child (the induced hang, VERDICT r4 item 2) is detected
    and killed with the wedge exit code 142;
  * a busy child is left alone;
  * a mostly-idle-but-progressing child (a remote compile: tiny CPU
    trickle) is left alone as long as it crosses the CPU threshold;
  * the deadline path SIGTERMs (checkpoint-and-exit contract) and exits
    143 even when the child ignores/outlives the signal.
"""

import os
import signal
import subprocess
import sys
import time

import pytest

SCRIPT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts", "run_with_watchdog.sh")


def run_watchdog(cmd, env_extra, deadline=0, timeout=120, progress_dir=None):
    env = dict(os.environ, **env_extra)
    args = ["bash", SCRIPT]
    if deadline:
        args += ["-d", str(deadline)]
    if progress_dir:
        args += ["-p", str(progress_dir)]
    args += ["--"] + cmd
    return subprocess.run(args, env=env, capture_output=True, text=True,
                          timeout=timeout)


FAST = {"WATCH_POLL_S": "1", "WEDGE_WINDOW_S": "4", "WEDGE_MIN_CPU_CS": "20",
        "CAP_KB": "0", "TERM_GRACE_S": "3"}


def test_busy_child_survives():
    # ~6 s of pure CPU: well past the 4 s window, never wedge-flagged
    r = run_watchdog([sys.executable, "-c",
                      "import time\n"
                      "t = time.time()\n"
                      "while time.time() - t < 6: pass\n"
                      "print('finished')"], FAST)
    assert r.returncode == 0, r.stderr
    assert "finished" in r.stdout
    assert "WEDGE" not in r.stderr


def test_idle_child_is_wedge_killed():
    # sleep() accumulates no CPU: the exact signature of the tunnel wedge
    t0 = time.time()
    r = run_watchdog([sys.executable, "-c", "import time; time.sleep(60)"],
                     FAST)
    assert r.returncode == 142, (r.returncode, r.stderr)
    assert "WEDGE" in r.stderr
    assert time.time() - t0 < 30  # detected in ~window time, not 60 s


def test_sigstopped_child_is_wedge_killed(tmp_path):
    """The induced hang: a busy child SIGSTOPped mid-run (the trainer wedge
    drill) stops accumulating CPU and must be detected + killed."""
    pidfile = tmp_path / "child.pid"
    code = ("import os, time\n"
            f"open({str(pidfile)!r}, 'w').write(str(os.getpid()))\n"
            "t = time.time()\n"
            "while time.time() - t < 60: pass\n")
    env = dict(os.environ, **FAST)
    proc = subprocess.Popen(["bash", SCRIPT, "--", sys.executable, "-c",
                             code], env=env, stderr=subprocess.PIPE,
                            text=True)
    for _ in range(100):  # wait for the child to report its pid
        if pidfile.exists() and pidfile.read_text():
            break
        time.sleep(0.1)
    else:
        proc.kill()
        pytest.fail("child never started")
    child = int(pidfile.read_text())
    os.kill(child, signal.SIGSTOP)  # induce the hang
    try:
        rc = proc.wait(timeout=60)
    finally:
        try:
            os.kill(child, signal.SIGKILL)  # belt-and-braces cleanup
        except ProcessLookupError:
            pass
    assert rc == 142
    assert "WEDGE" in proc.stderr.read()


def test_progress_stall_is_wedge_killed(tmp_path):
    """Round-5 wedge mode: a client blocked on a dead tunnel TRICKLES CPU
    (~4 s/900 s measured), evading the CPU check — but it stops producing
    checkpoints. With -p, a stalled progress dir is wedge-killed even
    though the child stays above the CPU threshold."""
    pdir = tmp_path / "ckpt"
    pdir.mkdir()
    (pdir / "0").write_text("x")
    # burn CPU the whole time (always above WEDGE_MIN_CPU_CS) but never
    # write to the progress dir
    code = ("import time\n"
            "t = time.time()\n"
            "while time.time() - t < 60: pass\n")
    t0 = time.time()
    r = run_watchdog([sys.executable, "-c", code],
                     dict(FAST, PROGRESS_TIMEOUT_S="4"), progress_dir=pdir)
    assert r.returncode == 142, (r.returncode, r.stderr)
    assert "no new file" in r.stderr
    assert time.time() - t0 < 30


def test_progressing_child_survives(tmp_path):
    """A child that keeps writing new checkpoint files is left alone for
    the full run even with a short progress timeout."""
    pdir = tmp_path / "ckpt"
    pdir.mkdir()
    code = ("import sys, time\n"
            "t = time.time(); i = 0\n"
            "while time.time() - t < 8:\n"  # busy (passes the CPU check)
            "    open(sys.argv[1] + '/' + str(i), 'w').write('x')\n"
            "    i += 1\n"
            "    s = time.time()\n"
            "    while time.time() - s < 1: pass\n"
            "print('finished')")
    r = run_watchdog([sys.executable, "-c", code, str(pdir)],
                     dict(FAST, PROGRESS_TIMEOUT_S="4"), progress_dir=pdir)
    assert r.returncode == 0, (r.returncode, r.stderr)
    assert "finished" in r.stdout
    assert "WEDGE" not in r.stderr


def test_deadline_term_then_exit():
    # child exits promptly on SIGTERM (the trainer checkpoints first; here
    # the contract under test is TERM-at-deadline -> rc 143)
    t0 = time.time()
    r = run_watchdog([sys.executable, "-c", "import time\n"
                      "t = time.time()\n"
                      "while time.time() - t < 60: pass\n"],
                     FAST, deadline=int(time.time()) + 2)
    assert r.returncode == 143, (r.returncode, r.stderr)
    assert "deadline" in r.stderr
    assert time.time() - t0 < 30


def test_deadline_kill_after_grace():
    # child IGNORES SIGTERM: the --kill-after gap that used to keep the
    # chip busy past TRAIN_DEADLINE (ADVICE r4) — grace expiry SIGKILLs
    code = ("import signal, time\n"
            "signal.signal(signal.SIGTERM, signal.SIG_IGN)\n"
            "t = time.time()\n"
            "while time.time() - t < 60: pass\n")
    t0 = time.time()
    # deadline at +5 s: interpreter startup on this 1-core host can take
    # ~2 s, and the handler must be installed before the TERM lands
    r = run_watchdog([sys.executable, "-c", code], FAST,
                     deadline=int(time.time()) + 5)
    assert r.returncode == 143, (r.returncode, r.stderr)
    assert "grace expired" in r.stderr
    assert time.time() - t0 < 30
