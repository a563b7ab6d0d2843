"""Atomic checkpoint writes.

The episode runner may be SIGKILLed by the wedge watchdog 3 s after
SIGTERM (scripts/run_with_watchdog.sh); a plain np.savez interrupted
mid-write leaves a truncated .npz that crashes every subsequent resume
attempt.  All episode-critical checkpoint files therefore go through
write-to-tmp + os.replace, which is atomic on POSIX: a reader sees either
the old complete file or the new complete file, never a torn one.
(Advisor r4 finding: scripts/run_config4.sh:14 / models/slam.py:1182.)
"""
from __future__ import annotations

import os
import pickle


def atomic_savez(path: str, compressed: bool = False, **arrays) -> None:
    """np.savez(path, **arrays) with tmp+rename atomicity."""
    import numpy as np
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        (np.savez_compressed if compressed else np.savez)(f, **arrays)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def atomic_save_npy(path: str, array) -> None:
    import numpy as np
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.save(f, array)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def atomic_pickle(path: str, obj) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(obj, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def atomic_write_text(path: str, text: str) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(text)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def valid_npz(path: str) -> bool:
    """True if `path` is a loadable npz (used by resume fallbacks)."""
    import numpy as np
    try:
        with np.load(path, allow_pickle=False) as z:
            _ = z.files
        return True
    except Exception:
        return False
