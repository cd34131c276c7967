"""Failure detection / temp cleanup (utils/cleanup.py).

Reference behavior: the index builder removes its temporary file on
SIGINT/SIGTERM (index-builder.c:996-1007, hooks installed :1256-1257);
writers detect short writes and unlink partial outputs with a
"disk is full" error (core-junction.c:4345-4352).
"""

import errno
import os
import signal
import subprocess
import sys
import textwrap

import pytest

from subread_tpu.utils import cleanup


def test_guard_unregisters_on_success(tmp_path):
    p = tmp_path / "out.bin"
    with cleanup.guard(str(p), what="test artifact"):
        p.write_bytes(b"x" * 10)
    assert p.exists()
    assert str(p) not in cleanup._registry


def test_guard_removes_partial_on_error(tmp_path):
    p = tmp_path / "out.bin"
    with pytest.raises(RuntimeError):
        with cleanup.guard(str(p), what="test artifact"):
            p.write_bytes(b"partial")
            raise RuntimeError("boom")
    assert not p.exists()


def test_guard_enospc_message(tmp_path):
    """ENOSPC becomes DiskFullError with the reference-style message and
    the partial artifact removed (core-junction.c:4350)."""
    p = tmp_path / "out.bin"
    with pytest.raises(cleanup.DiskFullError, match="disk is full"):
        with cleanup.guard(str(p), what="junction table"):
            p.write_bytes(b"partial")
            raise OSError(errno.ENOSPC, "No space left on device")
    assert not p.exists()


def test_writer_enospc_full_filesystem(tmp_path):
    """Writing an index to a full filesystem surfaces a clear error and
    leaves no partial artifacts.  Uses /dev/full when writable (always
    ENOSPC on write); otherwise simulates via a raising writer."""
    target = tmp_path / "idx.reads"
    with pytest.raises(cleanup.DiskFullError):
        with cleanup.guard(str(target), what="index"):
            if os.path.exists("/dev/full"):
                with open("/dev/full", "w") as f:
                    try:
                        f.write("x" * (1 << 20))
                        f.flush()
                        os.fsync(f.fileno())
                    except OSError as e:
                        assert e.errno == errno.ENOSPC
                        raise
                    else:  # pragma: no cover - /dev/full must ENOSPC
                        raise OSError(errno.ENOSPC, "No space left on device")
            else:  # pragma: no cover
                raise OSError(errno.ENOSPC, "No space left on device")
    assert not target.exists()


def test_sigterm_mid_build_removes_partials(tmp_path):
    """Kill an index build mid-write and assert no partial index files
    remain (reference SIGINT_hook: the temporary file is unlinked and
    the half-built index is never left behind)."""
    script = textwrap.dedent("""
        import os, sys, time
        sys.path.insert(0, %r)
        from subread_tpu.utils import cleanup
        out = sys.argv[1]
        with cleanup.guard(out + ".hash.npz", out + ".reads", what="index"):
            open(out + ".hash.npz", "wb").write(b"partial")
            open(out + ".reads", "w").write("partial")
            print("READY", flush=True)
            time.sleep(30)   # simulates the long savez write
    """) % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))),)
    out = str(tmp_path / "idx")
    proc = subprocess.Popen(
        [sys.executable, "-c", script, out],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    assert proc.stdout.readline().strip() == "READY"
    assert os.path.exists(out + ".hash.npz")
    proc.send_signal(signal.SIGTERM)
    proc.wait(timeout=10)
    assert not os.path.exists(out + ".hash.npz"), "partial index left behind"
    assert not os.path.exists(out + ".reads")
    assert "NOT generated successfully" in proc.stderr.read()


def test_aligner_writer_registers_until_close(tmp_path):
    from subread_tpu.io import sam as samio

    p = str(tmp_path / "o.sam")
    w = samio.make_writer(p, ["c1"], [100], sam_output=True)
    assert p in cleanup._registry
    w.close()
    assert p not in cleanup._registry
    assert os.path.exists(p)
