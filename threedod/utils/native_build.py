"""Best-effort one-shot auto-build of the native cores on a fresh checkout.

The C++ extensions (`threedod/evaluation/_evalc`, `threedod/data/_loaderc`,
sources in `native/`) are optional: every caller falls back to numpy/PIL.
But a fresh clone that never ran `python native/setup.py` would silently
run the slow fallbacks — so the import-fallback sites call
:func:`ensure_native_built` once, which builds in-place if the toolchain
and sources are present. Disable with THREEDOD_NO_NATIVE_BUILD=1.

A marker file makes the attempt once-per-checkout (success or failure) and
an flock serialises concurrent importers (e.g. loader worker processes).
"""
from __future__ import annotations

import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ensure_native_built(timeout: int = 300) -> bool:
    """Try to build the native extensions in-place; True if a build ran OK."""
    setup = os.path.join(_REPO, "native", "setup.py")
    if os.environ.get("THREEDOD_NO_NATIVE_BUILD") or not os.path.isfile(setup):
        return False
    marker = os.path.join(_REPO, "native", ".autobuild_attempted")
    if os.path.exists(marker):
        # same contract as the under-lock path: the marker records the
        # build's exit status, so "a build already succeeded" reads as True
        with open(marker) as f:
            return f.read().strip() == "0"
    try:
        import fcntl

        with open(marker + ".lock", "w") as lf:
            fcntl.flock(lf, fcntl.LOCK_EX)
            if os.path.exists(marker):  # another process built while we waited
                with open(marker) as f:
                    return f.read().strip() == "0"
            outcome = "error"
            try:
                res = subprocess.run(
                    [sys.executable, setup],
                    capture_output=True,
                    timeout=timeout,
                    cwd=_REPO,
                )
                outcome = str(res.returncode)
            finally:
                # record failed/timed-out attempts too: the once-per-checkout
                # guarantee must hold even on a broken toolchain, or every
                # fresh process re-pays the up-to-`timeout` build serially
                with open(marker, "w") as f:
                    f.write(outcome)
            return outcome == "0"
    except Exception:  # pragma: no cover - toolchain/env specific
        return False
