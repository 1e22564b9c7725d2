#!/usr/bin/env python
"""Entry point: python run.py {robot,sapien,real} [flags].

Replaces the reference's run_robot.py / run_sapien.py / run_real.py trio with
one CLI (same flags and defaults per domain — see reart_tpu/cli.py).
"""

from reart_tpu.cli import main

if __name__ == "__main__":
    main()
