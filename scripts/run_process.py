#!/usr/bin/env python
"""Per-process launcher (reference scripts/run_process.py: pins
CUDA_VISIBLE_DEVICES per scene; here the analog is one TPU process at a
time — concurrent processes would contend for the single device grant)."""
import os
import subprocess
import sys


def main():
    if len(sys.argv) < 2:
        raise SystemExit("usage: run_process.py <scene_id> [main.py args...]")
    scene = sys.argv[1]
    extra = sys.argv[2:]
    env = dict(os.environ)
    cmd = [sys.executable, "main.py", "--scenes_list", scene] + extra
    print(">>", " ".join(cmd))
    raise SystemExit(subprocess.call(cmd, env=env))


if __name__ == "__main__":
    main()
